"""LFSR scrambling (ops/scramble.py) vs a sequential register-walk oracle."""

import numpy as np
import pytest

from psk_soft_tpu.ops.scramble import (Lfsr, additive_scramble, keystream,
                                       lfsr_preset, prbs7, prbs15, prbs23,
                                       selfsync_descramble, selfsync_scramble)


def oracle_keystream(lfsr, length):
    """Bit-at-a-time register walk from the documented convention."""
    r, taps = lfsr.degree, lfsr.taps
    s = [(lfsr.seed_value >> i) & 1 for i in range(r)]
    out = []
    for _ in range(length):
        out.append(s[0])
        fb = 0
        for i in range(r):
            if (taps >> i) & 1:
                fb ^= s[i]
        s = s[1:] + [fb]
    return np.asarray(out, np.int8)


@pytest.mark.parametrize("lfsr", [prbs7(), prbs15(), prbs23(),
                                  Lfsr(5, 0b10010, seed=0b01101),
                                  prbs7(seed=0x2A)])
def test_keystream_matches_oracle(lfsr):
    assert np.array_equal(keystream(lfsr, 200), oracle_keystream(lfsr, 200))


def test_prbs7_period_and_balance():
    ks = keystream(prbs7(), 127 * 2)
    assert np.array_equal(ks[:127], ks[127:])            # period 127
    assert ks[:127].sum() == 64                          # 64 ones, 63 zeros
    # maximal length: no shorter period p (sequence != itself shifted by p)
    for p in (1, 7, 31, 63):
        assert not np.array_equal(ks[:127 - p], ks[p:127])


def test_prbs15_recurrence():
    # x^15 + x^14 + 1: a[n] = a[n-1] ^ a[n-15] for all n >= 15.
    ks = keystream(prbs15(), 400)
    assert np.array_equal(ks[15:], ks[14:-1] ^ ks[:-15])


def test_additive_scramble_self_inverse_and_keystream():
    rng = np.random.default_rng(31)
    bits = rng.integers(0, 2, (3, 160), np.int8)
    lf = prbs15()
    sc = np.asarray(additive_scramble(lf, bits))
    assert sc.shape == bits.shape
    assert np.array_equal(sc[0], bits[0] ^ keystream(lf, 160))
    assert np.array_equal(np.asarray(additive_scramble(lf, sc)), bits)


def test_additive_scramble_per_row_seeds():
    rng = np.random.default_rng(32)
    bits = rng.integers(0, 2, (4, 96), np.int8)
    seeds_int = [0x11, 0x7F, 0x2A, 0x01]
    seeds = np.stack([Lfsr(7, (1 << 6) | 1, s).seed_bits()
                      for s in seeds_int])
    got = np.asarray(additive_scramble(prbs7(), bits, seeds=seeds))
    for i, s in enumerate(seeds_int):
        assert np.array_equal(got[i], bits[i] ^ keystream(prbs7(seed=s), 96))


def test_selfsync_roundtrip_and_error_propagation():
    rng = np.random.default_rng(33)
    taps = (18, 23)
    bits = rng.integers(0, 2, (2, 300), np.int8)
    y = np.asarray(selfsync_scramble(bits, taps))
    back = np.asarray(selfsync_descramble(y, taps))
    assert np.array_equal(back, bits)
    # One channel bit error -> exactly len(taps)+1 descrambled errors.
    y_err = y.copy()
    y_err[0, 100] ^= 1
    bad = np.asarray(selfsync_descramble(y_err, taps))
    diff = np.flatnonzero(bad[0] ^ bits[0])
    assert diff.tolist() == [100, 118, 123]
    assert np.array_equal(bad[1], bits[1])


def test_selfsync_scrambled_is_dispersed():
    # The point of the scrambler: a constant stream comes out balanced.
    y = np.asarray(selfsync_scramble(np.ones(4096, np.int8), (18, 23)))
    frac = y.mean()
    assert 0.4 < frac < 0.6


def test_presets_and_validation():
    assert lfsr_preset("prbs7").degree == 7
    assert lfsr_preset("prbs15", seed=0x3FFF).seed_value == 0x3FFF
    with pytest.raises(ValueError):
        lfsr_preset("prbs9")
    with pytest.raises(ValueError):
        Lfsr(7, 0)                               # no taps
    with pytest.raises(ValueError):
        Lfsr(7, (1 << 6) | 1, seed=0)            # zero seed
    with pytest.raises(ValueError):
        Lfsr(40, 3)                              # degree too large
    with pytest.raises(ValueError):
        selfsync_descramble(np.zeros(8, np.int8), (0, 3))
    with pytest.raises(ValueError):
        additive_scramble(prbs7(), np.zeros((2, 8), np.int8),
                          seeds=np.zeros((3, 7), np.int8))
