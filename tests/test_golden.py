"""Golden parity tests: the six reference integration scenarios.

Reproduces tests/test_psk_soft.py:160-238 numerically: same generator
(bit-exact Python 2 RNG semantics, seed 100), same tolerance (max soft-symbol
error < 1e-3), same rotation-ambiguity handling (non-differential checked
modulo the M legal constellation rotations), first symbol excluded for the
differential mode.  Additionally asserts what the reference leaves dark
(SURVEY.md section 4): output count/alignment, and bits on the differential
path where the absolute rotation is known.
"""

import numpy as np
import pytest

from psk_soft_tpu import DemodConfig, demod_init, make_demod_fn
from psk_soft_tpu.testing.signals import gen_psk

SPS = 8
NUM_AVG = 100
NSYM = 1000


def run_golden(m, differential, num_blocks=1):
    cfg = DemodConfig(sps=SPS, num_avg=NUM_AVG, constellation_size=m,
                      phase_avg=50, differential=differential)
    x, syms = gen_psk(NSYM, SPS, m, differential=differential)
    fn = make_demod_fn(cfg)
    st = demod_init(cfg)
    outs = []
    for blk in np.split(x, num_blocks):
        st, out = fn(st, blk)
        outs.append(out)
    valid = np.concatenate([np.asarray(o.valid) for o in outs])
    soft = np.concatenate([np.asarray(o.soft) for o in outs])[valid]
    bits = np.concatenate([np.asarray(o.bits) for o in outs])[valid]
    phase = np.concatenate([np.asarray(o.phase) for o in outs])[valid]
    return cfg, soft, bits, phase, syms


@pytest.mark.parametrize("m", [2, 4, 8])
def test_differential(m):
    cfg, soft, bits, phase, syms = run_golden(m, differential=True)
    # Warm-up: first output is stream symbol 0, emitted after numAvg symbols
    # (cpp/psk_soft.cpp:457-465) -> 1000 - 99 outputs.
    assert soft.shape[0] == NSYM - (NUM_AVG - 1)
    expected = syms[: soft.shape[0]].astype(np.complex64)
    if m == 4:
        expected = expected * np.exp(1j * np.pi / 4).astype(np.complex64)
    max_err = np.abs(soft[1:] - expected[1:]).max()
    assert max_err < 1e-3, max_err


@pytest.mark.parametrize("m", [2, 4, 8])
def test_non_differential(m):
    cfg, soft, bits, phase, syms = run_golden(m, differential=False)
    assert soft.shape[0] == NSYM - (NUM_AVG - 1)
    expected = syms[: soft.shape[0]]
    thetas = {
        2: [0, np.pi],
        4: [np.pi / 4, 3 * np.pi / 4, 5 * np.pi / 4, 7 * np.pi / 4],
        8: [k * np.pi / 4 for k in range(8)],
    }[m]
    max_err = min(
        np.abs(soft[1:] * np.exp(1j * th) - expected[1:]).max() for th in thetas
    )
    assert max_err < 1e-3, max_err


@pytest.mark.parametrize("m", [2, 4, 8])
def test_differential_bits(m):
    """Bits assertion the reference never makes (its bits port is untested;
    the documented mapping is psk_soft.scd.xml:42-63)."""
    cfg, soft, bits, phase, syms = run_golden(m, differential=True)
    n = soft.shape[0]
    expected_pts = syms[:n]
    # Transmitted symbol k = exp(2pi*i*j/m): recover j, then map per SCD.
    j = np.round(np.angle(expected_pts) / (2 * np.pi / m)).astype(int) % m
    if m == 2:
        exp_bits = j[:, None]
    elif m == 4:
        # soft sits at exp(i*(2pi*j/4 + pi/4)): quadrant of j.
        sr = (np.cos(2 * np.pi * j / 4 + np.pi / 4) < 0).astype(int)
        si = (np.sin(2 * np.pi * j / 4 + np.pi / 4) < 0).astype(int)
        exp_bits = np.stack([sr ^ si, si], axis=1)
    else:
        exp_bits = np.stack([(j >> k) & 1 for k in range(3)], axis=1)
    nb = cfg.bits_per_symbol
    np.testing.assert_array_equal(bits[1:, :nb], exp_bits[1:, :nb])


@pytest.mark.parametrize("num_blocks", [2, 5, 10])
def test_block_split_invariance(num_blocks):
    """Carry correctness: splitting the stream into blocks changes nothing.

    On the golden rectangular pulses every intra-symbol sample is an equally
    valid decision point (bin energies tie up to the 1e-4 noise), and the
    cumsum-diff windowing's rounding depends on block start, so the argmax
    may legitimately pick a different sample of the *same* symbol; soft
    decisions are compared at the noise scale and bits exactly.
    """
    _, soft1, bits1, phase1, _ = run_golden(4, differential=False, num_blocks=1)
    _, softn, bitsn, phasen, _ = run_golden(4, differential=False,
                                            num_blocks=num_blocks)
    np.testing.assert_allclose(softn, soft1, atol=3e-4)
    np.testing.assert_array_equal(bitsn, bits1)
    np.testing.assert_allclose(phasen, phase1, atol=1e-3)


@pytest.mark.parametrize("num_blocks", [2, 5, 10])
def test_block_split_invariance_decisive_timing(num_blocks):
    """With real timing structure (energy concentrated on one intra-symbol
    index) the argmax is decisive and block splits must be exactly
    invariant, including sample_index."""

    cfg = DemodConfig(sps=SPS, num_avg=NUM_AVG, constellation_size=4,
                      phase_avg=50)
    rng = np.random.default_rng(0)
    j = rng.integers(0, 4, NSYM)
    x = np.zeros(NSYM * SPS, np.complex64)
    x[3::SPS] = np.exp(2j * np.pi * j / 4)  # all energy on intra-index 3
    x += (0.01 * rng.standard_normal(x.size)).astype(np.complex64)
    fn = make_demod_fn(cfg)

    def run(nb):
        st = demod_init(cfg)
        outs = []
        for blk in np.split(x, nb):
            st, out = fn(st, blk)
            outs.append(out)
        valid = np.concatenate([np.asarray(o.valid) for o in outs])
        return (np.concatenate([np.asarray(o.soft) for o in outs])[valid],
                np.concatenate([np.asarray(o.sample_index) for o in outs])[valid])

    soft1, idx1 = run(1)
    softn, idxn = run(num_blocks)
    np.testing.assert_array_equal(idxn, idx1)
    np.testing.assert_allclose(softn, soft1, atol=1e-6)


def test_phase_output_reasonable():
    """Phase debug port: near-zero estimates on the offset-free golden vector
    (phase_dataFloat_out semantics, psk_soft.scd.xml:66-69)."""
    _, soft, bits, phase, _ = run_golden(4, differential=False)
    assert np.abs(phase).max() < 0.1
