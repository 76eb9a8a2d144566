"""Descriptor parity: property defaults and the port graph match the
reference's SCA descriptors (the reference test's setupComponent assertions,
tests/test_psk_soft.py:285-308)."""

from psk_soft_tpu import DemodConfig
from psk_soft_tpu.runtime import streams


def test_property_defaults_match_prf():
    """psk_soft.prf.xml:23-60 / cpp/psk_soft_base.cpp:96-149."""
    cfg = DemodConfig()
    assert cfg.sps == 10                 # samplesPerBaud
    assert cfg.num_avg == 100            # numAvg
    assert cfg.constellation_size == 4   # constelationSize
    assert cfg.phase_avg == 50           # phaseAvg
    assert cfg.differential is False     # differentialDecoding


def test_port_graph_matches_scd():
    """psk_soft.scd.xml:32-73: one provides + four uses ports."""
    assert streams.PORT_SOFT == "softDecision_dataFloat_out"
    assert streams.PORT_BITS == "bits_dataShort_out"
    assert streams.PORT_PHASE == "phase_dataFloat_out"
    assert streams.PORT_SAMPLE_INDEX == "sampleIndex_dataShort_out"
    out = streams.propagate_sri(DemodConfig(), streams.SRI(stream_id="x"))
    assert set(out) == {streams.PORT_SOFT, streams.PORT_BITS,
                        streams.PORT_PHASE, streams.PORT_SAMPLE_INDEX}


def test_bits_per_symbol_mapping():
    """cpp/psk_soft.cpp:384-390."""
    for m, b in ((2, 1), (4, 2), (8, 3)):
        assert DemodConfig(constellation_size=m).bits_per_symbol == b
