"""Coded-BER evaluation (eval/coded.py): coding gain + union bound.

The union bound is asserted against BPSK transmission (independent noise
per code bit, where it provably applies); QPSK carries the reference's
non-Gray quadrant labeling and is asserted for coding *gain* only (see
eval/coded.py docstring).
"""

import numpy as np
import pytest

from psk_soft_tpu.eval.ber import theoretical_ber
from psk_soft_tpu.eval.coded import (coded_ber_sweep, measure_coded_ber,
                                     union_bound)
from psk_soft_tpu.ops.fec import CODE_K3, CODE_K7, PUNCTURE_2_3, ConvCode


def test_coding_gain_over_uncoded_qpsk():
    """K=7 rate-1/2 QPSK at Es/N0 = 5 dB: far below uncoded QPSK at the
    same Es/N0 (~2 orders of magnitude)."""
    p = measure_coded_ber(CODE_K7, 4, esn0_db=5.0, num_bits=100_000,
                          seed=1)
    assert p.ebn0_db == pytest.approx(5.0, abs=1e-6)     # R*log2M = 1
    uncoded = float(theoretical_ber(4, np.asarray(5.0)))
    assert uncoded > 0.03
    assert p.ber < uncoded / 20, (p.ber, uncoded)


def test_union_bound_tracks_bpsk():
    pts = coded_ber_sweep(CODE_K7, 2, [-1.0, 0.0], num_bits=120_000,
                          seed=2)
    for p in pts:
        bound = float(union_bound(CODE_K7, p.ebn0_db))
        # Upper bound within sampling noise; and tight (not 10x loose).
        assert p.ber <= 2.0 * bound + 5.0 / p.n_bits, (p.ber, bound)
        assert p.ber >= bound / 10.0, (p.ber, bound)


def test_waterfall_monotone():
    pts = coded_ber_sweep(CODE_K7, 4, [0.0, 2.0, 4.0], num_bits=60_000,
                          seed=3)
    bers = [p.ber for p in pts]
    assert bers[0] > bers[1] > bers[2]


def test_k3_code_and_bpsk():
    p = measure_coded_ber(CODE_K3, 2, esn0_db=1.0, num_bits=40_000, seed=4)
    assert p.ebn0_db == pytest.approx(1.0 + 10 * np.log10(2.0), abs=1e-6)
    assert p.ber < float(theoretical_ber(2, np.asarray(1.0)))
    assert float(union_bound(CODE_K3, 6.0)) < \
        float(union_bound(CODE_K3, 3.0))


def test_union_bound_validation():
    with pytest.raises(ValueError):
        union_bound(ConvCode(7, (0o171, 0o133), PUNCTURE_2_3), 4.0)
    with pytest.raises(ValueError):
        union_bound(ConvCode(5, (0o35, 0o23)), 4.0)      # untabulated


def test_punctured_point_runs():
    code = ConvCode(7, (0o171, 0o133), PUNCTURE_2_3)
    p = measure_coded_ber(code, 4, esn0_db=6.0, num_bits=30_000, seed=5)
    assert p.ebn0_db == pytest.approx(6.0 - 10 * np.log10(4 / 3), abs=1e-3)
    assert 0 <= p.ber < 0.02


def test_chain_fer_waterfall():
    # Chain-level FER (acquisition + sync + decode in one program) gated
    # at three operating points of the published waterfall
    # (docs/chain_fer_r05.json): clean at the coded operating point WITH
    # a per-channel CFO spread the tracker absorbs, near-clean at 8 dB,
    # failing hard far below.
    from psk_soft_tpu import DemodConfig
    from psk_soft_tpu.eval.coded import measure_chain_fer
    from psk_soft_tpu.ops.crc import CRC16_CCITT
    from psk_soft_tpu.ops.framesync import FrameFormat

    rng = np.random.default_rng(31)
    cfg = DemodConfig(sps=8, num_avg=40, constellation_size=4,
                      phase_avg=30)
    fmt = FrameFormat(uw=tuple(rng.integers(0, 4, 32)), payload=48, m=4,
                      threshold=0.7)
    hi = measure_chain_fer(cfg, fmt, CODE_K7, CRC16_CCITT, 12.0,
                           channels=128, blocks=2, cfo=2e-5, seed=3)
    mid = measure_chain_fer(cfg, fmt, CODE_K7, CRC16_CCITT, 8.0,
                            channels=128, blocks=2, seed=3)
    lo = measure_chain_fer(cfg, fmt, CODE_K7, CRC16_CCITT, -2.0,
                           channels=128, blocks=2, seed=3)
    assert hi.fer <= 0.01, hi            # CFO != 0 inside the loop
    assert hi.found == hi.frames
    assert mid.fer <= 0.08, mid          # waterfall knee (measured 0.014)
    assert lo.fer >= 0.3, lo
    assert lo.fer > mid.fer >= hi.fer
    assert lo.overflow == 0 or lo.overflow < lo.frames  # observable cap


def test_chain_fer_acquisition_leg():
    # BEYOND-LOCK offsets (0.005-0.02 cyc/sample, past the 4th-power
    # tracker's ~0.0156 pull-in) through M-th-power acquisition + the
    # front chain's in-program NCO: clean at the coded operating point.
    from psk_soft_tpu import DemodConfig
    from psk_soft_tpu.eval.coded import measure_chain_fer
    from psk_soft_tpu.ops.crc import CRC16_CCITT
    from psk_soft_tpu.ops.framesync import FrameFormat

    rng = np.random.default_rng(31)
    cfg = DemodConfig(sps=8, num_avg=40, constellation_size=4,
                      phase_avg=30)
    fmt = FrameFormat(uw=tuple(rng.integers(0, 4, 32)), payload=48, m=4,
                      threshold=0.7)
    p = measure_chain_fer(cfg, fmt, CODE_K7, CRC16_CCITT, 12.0,
                          channels=128, blocks=2, front_cfo=0.02, seed=3)
    assert p.fer <= 0.01, p
    assert p.found == p.frames
