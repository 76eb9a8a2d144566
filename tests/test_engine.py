"""Streaming engine tests: the service-loop semantics of the reference
(C4/C7, cpp/psk_soft.cpp:346-426) as engine behavior."""

import numpy as np
import pytest

from psk_soft_tpu import DemodConfig
from psk_soft_tpu.runtime.engine import BatchEngine, StreamEngine
from psk_soft_tpu.runtime.streams import (SRI, Packet, PORT_BITS, PORT_PHASE,
                                          PORT_SAMPLE_INDEX, PORT_SOFT,
                                          propagate_sri)
from psk_soft_tpu.testing.signals import gen_psk

CFG = DemodConfig(sps=8, num_avg=100, constellation_size=4, phase_avg=50)
IN_SRI = SRI(stream_id="s1", xdelta=0.01, mode=1)


def feed(engine, x, chunk, eos_last=True, t0=0.0):
    """Push x in chunks; collect per-port concatenated output data."""
    collected = {}
    n = len(x)
    for i in range(0, n, chunk):
        seg = x[i:i + chunk]
        pkt = Packet(data=seg, sri=IN_SRI, t=t0 + i * IN_SRI.xdelta,
                     eos=eos_last and (i + chunk >= n))
        for port, out in engine.process(pkt).items():
            collected.setdefault(port, []).append(out)
    return collected


def cat(collected, port):
    return np.concatenate([p.data for p in collected[port]])


def test_engine_matches_oneshot():
    """Arbitrary packetization == one-shot processing (the reference's
    deques carry partial symbols across getPacket calls the same way)."""
    x, syms = gen_psk(1000, 8, 4)
    ref_eng = StreamEngine(CFG, block_symbols=128)
    ref = feed(ref_eng, x, chunk=len(x))
    for chunk in (777, 8000, 130):
        eng = StreamEngine(CFG, block_symbols=128)
        got = feed(eng, x, chunk=chunk)
        np.testing.assert_allclose(cat(got, PORT_SOFT), cat(ref, PORT_SOFT),
                                   atol=1e-5)
        np.testing.assert_array_equal(cat(got, PORT_BITS), cat(ref, PORT_BITS))
    # And the demod is actually correct.
    soft = cat(ref, PORT_SOFT)
    assert soft.size == 1000 - 99
    expected = syms[:soft.size] * np.exp(1j * np.pi / 4)
    thetas = [0, np.pi / 2, np.pi, 3 * np.pi / 2]
    err = min(np.abs(soft[1:] * np.exp(1j * t) - expected[1:]).max()
              for t in thetas)
    assert err < 1e-3


def test_bits_are_serialized_lsb_first():
    x, _ = gen_psk(300, 8, 4)
    eng = StreamEngine(CFG, block_symbols=64)
    got = feed(eng, x, chunk=len(x))
    bits = cat(got, PORT_BITS)
    soft = cat(got, PORT_SOFT)
    assert bits.dtype == np.int16
    assert bits.size == soft.size * CFG.bits_per_symbol
    # Bits of symbol 0 equal slicing its soft decision.
    sr, si = soft[0].real < 0, soft[0].imag < 0
    np.testing.assert_array_equal(bits[:2], [int(sr) ^ int(si), int(si)])


def test_real_mode_rejected():
    """cpp/psk_soft.cpp:359-363: real data is dropped with a warning."""
    eng = StreamEngine(CFG)
    pkt = Packet(data=np.ones(800, np.complex64),
                 sri=SRI(stream_id="r", mode=0))
    assert eng.process(pkt) == {}
    assert eng.metrics.real_mode_drops == 1


def test_flush_resets_state():
    """cpp/psk_soft.cpp:353-357: upstream overflow -> full state reset."""
    x, _ = gen_psk(500, 8, 4)
    eng = StreamEngine(CFG, block_symbols=64)
    feed(eng, x, chunk=len(x), eos_last=False)
    n_before = eng.metrics.symbols_out
    assert n_before > 0
    pkt = Packet(data=x[:800], sri=IN_SRI, input_queue_flushed=True)
    eng.process(pkt)
    assert eng.metrics.resets == 1
    # Warm-up restarted: 100 symbols yield no output yet.
    assert eng.metrics.symbols_out == n_before


def test_sri_propagation_rates():
    """Rate rescaling rules (cpp/psk_soft.cpp:393-404): soft/phase at
    xdelta*sps, bits at xdelta*sps/bitsPerBaud (divide AFTER multiply --
    SURVEY.md trap (d))."""
    out = propagate_sri(CFG, IN_SRI)
    assert out[PORT_SOFT].xdelta == pytest.approx(0.08)
    assert out[PORT_SOFT].mode == 1
    assert out[PORT_PHASE].xdelta == pytest.approx(0.08)
    assert out[PORT_PHASE].mode == 0
    assert out[PORT_BITS].xdelta == pytest.approx(0.04)
    assert out[PORT_SAMPLE_INDEX].mode == 0


def test_eos_propagates():
    x, _ = gen_psk(150, 8, 4)
    eng = StreamEngine(CFG, block_symbols=64)
    got = feed(eng, x, chunk=len(x), eos_last=True)
    for port in (PORT_SOFT, PORT_BITS, PORT_PHASE, PORT_SAMPLE_INDEX):
        assert got[port][-1].eos


def test_eos_final_partial_block():
    """EOS drains remaining whole symbols even below block size."""
    x, syms = gen_psk(130, 8, 4)
    eng = StreamEngine(DemodConfig(sps=8, num_avg=50, constellation_size=4,
                                   phase_avg=20), block_symbols=512)
    got = feed(eng, x, chunk=len(x), eos_last=True)
    soft = cat(got, PORT_SOFT)
    assert soft.size == 130 - 49


def test_reconfigure_phase_avg_keeps_tracking():
    """phaseAvg change resizes the fit window without losing lock
    (cpp/psk_soft.cpp:421-426)."""
    x, _ = gen_psk(600, 8, 4)
    eng = StreamEngine(CFG, block_symbols=64)
    feed(eng, x[:2400], chunk=2400, eos_last=False)
    eng.configure(DemodConfig(sps=8, num_avg=100, constellation_size=4,
                              phase_avg=20))
    got = feed(eng, x[2400:], chunk=2400, eos_last=False)
    soft = cat(got, PORT_SOFT)
    # still demodulating cleanly after the change
    assert np.abs(np.abs(soft) - 1).max() < 1e-2
    assert eng.metrics.reconfigures == 1


def test_reconfigure_constellation_clears_phase():
    eng = StreamEngine(CFG, block_symbols=64)
    x, _ = gen_psk(300, 8, 4)
    feed(eng, x, chunk=len(x), eos_last=False)
    eng.configure(DemodConfig(sps=8, num_avg=100, constellation_size=8,
                              phase_avg=50))
    st = eng._state
    assert int(np.asarray(st.phase_count)) == 0
    assert int(np.asarray(st.seen)) > 0  # timing window survived


def test_timestamps_track_symbols():
    x, _ = gen_psk(400, 8, 4)
    eng = StreamEngine(CFG, block_symbols=100)
    got = feed(eng, x, chunk=len(x) // 2, t0=5.0)
    pkts = got[PORT_SOFT]
    assert len(pkts) >= 2
    # First emitted symbol is stream symbol 0 at the stream origin.
    assert pkts[0].t == pytest.approx(5.0)
    # Next packet starts at origin + emitted_so_far * sps * xdelta.
    n0 = pkts[0].data.size
    assert pkts[1].t == pytest.approx(5.0 + n0 * 8 * IN_SRI.xdelta)


def test_steady_switch_is_transparent():
    """The engine flips to the assume_steady compiled program mid-stream;
    outputs must be identical to a small-block (never-steady-at-switch) run."""
    x, _ = gen_psk(1200, 8, 4)
    eng = StreamEngine(CFG, block_symbols=64)  # steady after ~150 symbols
    got = feed(eng, x, chunk=len(x))
    ref_soft = cat(got, PORT_SOFT)
    # Force an all-flex run by comparing against the one-shot EOS drain
    # (single block, never reaches the steady counter before processing).
    eng2 = StreamEngine(CFG, block_symbols=4096)
    got2 = feed(eng2, x, chunk=len(x))
    np.testing.assert_allclose(ref_soft, cat(got2, PORT_SOFT), atol=3e-4)
    np.testing.assert_array_equal(cat(got, PORT_BITS), cat(got2, PORT_BITS))


def test_batch_engine_matches_stream_engines():
    C = 4
    cfg = DemodConfig(sps=8, num_avg=50, constellation_size=4, phase_avg=20)
    xs = [gen_psk(400, 8, 4, seed=100 + i)[0] for i in range(C)]
    be = BatchEngine(cfg, channels=C, block_symbols=100)
    for c in range(C):
        be.push(c, xs[c])
    outs = []
    while be.ready():
        outs.append(be.step())
    soft_b = np.concatenate(
        [np.asarray(o.soft)[:, np.asarray(o.valid)[0]] for o in outs], axis=1)
    for c in range(C):
        se = StreamEngine(cfg, block_symbols=100)
        got = feed(se, xs[c], chunk=len(xs[c]), eos_last=False)
        np.testing.assert_allclose(soft_b[c], cat(got, PORT_SOFT), atol=1e-5)
