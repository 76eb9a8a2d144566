"""Regression tests for the round-4 advisor findings (ADVICE.md):

1. detect_uw_sparse returns integer-exact int32 indices (float32 packing
   lost exactness above 2^24) -- dtype pinned here, parity pinned in
   test_framesync_device.py.
2. EqFrontEnd's CMA->DD handover gates on the WORST channel's CMA cost,
   not the bank mean (a mean gate could flip unconverged minority
   channels into DD cold-start).
3. PortStats rates report 0.0 until a second packet establishes a real
   time span (a single push divided by a ~microsecond span read out
   absurd ~1e12 rates).
"""

import numpy as np

from psk_soft_tpu import DemodConfig
from psk_soft_tpu.ops.framesync import FrameFormat, detect_uw_sparse
from psk_soft_tpu.runtime.streams import SRI, Packet, PortStats


def test_sparse_candidates_int32_indices():
    rng = np.random.default_rng(0)
    fmt = FrameFormat(uw=tuple(rng.integers(0, 4, 16)), payload=8, m=4)
    soft = np.exp(2j * np.pi * rng.integers(0, 4, (2, 200)) / 4
                  + 1j * np.pi / 4).astype(np.complex64)
    cand = detect_uw_sparse(soft, fmt)
    assert cand.idx.dtype == np.int32
    assert cand.vals.dtype == np.float32
    assert cand.idx.shape[1] == 2 and cand.vals.shape[1] == 2


def test_dd_gate_uses_worst_channel():
    from psk_soft_tpu.ops.equalizer import EqConfig
    from psk_soft_tpu.runtime.engine import BatchEngine
    from psk_soft_tpu.runtime.equalizer import EqFrontEnd

    cfg = DemodConfig(sps=4, num_avg=20, constellation_size=4, phase_avg=10)
    fe = EqFrontEnd(BatchEngine(cfg, 3, block_symbols=64),
                    EqConfig(taps=7), dd_switch=0.05)
    # One straggler channel far above threshold while the mean is below:
    # the gate metric must report the straggler, not the mean.
    fe._last_cm_err = np.asarray([0.01, 0.01, 0.10], np.float32)
    assert float(fe._last_cm_err.mean()) < 0.05       # mean would switch
    assert fe._dd_gate_metric() >= 0.05               # worst channel holds


def test_port_stats_rates_need_two_packets():
    st = PortStats()
    sri = SRI(stream_id="s", xdelta=1e-6)
    pkt = Packet(data=np.zeros(64, np.complex64), sri=sri, t=0.0)
    st.update(pkt)
    # One packet: no meaningful span yet -> all rates must be 0.0.
    assert st.elements_per_second == 0.0
    assert st.calls_per_second == 0.0
    assert st.bits_per_second == 0.0
    st.update(pkt)
    assert st.packets == 2
    assert st.elements_per_second > 0.0
    assert st.bits_per_second > 0.0
