"""FEC layer: convolutional encoder + Viterbi decoder (ops/fec.py).

Gated against an independent sequential numpy oracle (encoder and a
textbook register-walk Viterbi are implemented here from the definition,
not by calling the module under test), plus end-to-end soft-decision
decoding from the framework's own QPSK soft-symbol conventions.
"""

import numpy as np
import pytest

from psk_soft_tpu.ops import slicers
from psk_soft_tpu.ops.fec import (CODE_K3, CODE_K7, PUNCTURE_2_3,
                                  PUNCTURE_3_4, ConvCode, conv_encode,
                                  depuncture, hard_llrs, make_viterbi_fn,
                                  psk_llrs, viterbi_decode)
from psk_soft_tpu.ops.framesync import psk_points


# -- independent oracle --------------------------------------------------------

def oracle_encode(code, bits, terminate=True):
    """Sequential shift-register encoder from the definition."""
    u = list(bits) + ([0] * (code.k - 1) if terminate else [])
    reg = [0] * code.k           # reg[0] = current bit, reg[i] = u[t-i]
    out = []
    for b in u:
        reg = [int(b)] + reg[:-1]
        for g in code.polys:
            acc = 0
            for i in range(code.k):
                if (g >> (code.k - 1 - i)) & 1:
                    acc ^= reg[i]
            out.append(acc)
    out = np.asarray(out, np.int8)
    if code.puncture is not None:
        keep = np.asarray(code.puncture, bool).reshape(-1)
        out = out[np.flatnonzero(np.resize(keep, out.size))]
    return out


def oracle_viterbi(code, llrs, terminate=True):
    """Textbook per-step max over all state paths (no vectorization)."""
    n, k, s_count = code.n, code.k, code.states
    y = np.asarray(llrs, np.float64).reshape(-1, n)
    pm = np.full(s_count, -1e18)
    pm[0] = 0.0
    paths = {0: []}
    for r in y:
        new_pm = np.full(s_count, -1e18)
        new_paths = {}
        for s in range(s_count):
            if pm[s] <= -1e17:
                continue
            for u in (0, 1):
                reg = (u << (k - 1)) | s
                bm = 0.0
                for j, g in enumerate(code.polys):
                    bit = bin(g & reg).count("1") & 1
                    bm += (1.0 - 2.0 * bit) * r[j]
                s2 = (u << (k - 2)) | (s >> 1)
                cand = pm[s] + bm
                if cand > new_pm[s2]:
                    new_pm[s2] = cand
                    new_paths[s2] = paths[s] + [u]
        pm, paths = new_pm, new_paths
    s_fin = 0 if terminate else int(np.argmax(pm))
    bits = np.asarray(paths[s_fin], np.int8)
    return bits[:bits.size - (k - 1)] if terminate else bits


def qpsk_modulate(bits):
    """Bit pairs -> QPSK soft points via the slicers' own labeling."""
    pts = psk_points(np.arange(4), 4)
    labels = np.asarray(slicers.slice_bits(4, pts))[:, :2]   # (4, 2)
    lut = np.zeros(4, np.int64)
    for sym, (b0, b1) in enumerate(labels):
        lut[b0 + 2 * b1] = sym
    pairs = np.asarray(bits).reshape(-1, 2)
    return pts[lut[pairs[:, 0] + 2 * pairs[:, 1]]]


# -- encoder -------------------------------------------------------------------

@pytest.mark.parametrize("code", [CODE_K3, CODE_K7,
                                  ConvCode(5, (0o35, 0o23))])
def test_encoder_matches_oracle(code):
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 64)
    got = np.asarray(conv_encode(code, bits))
    assert np.array_equal(got, oracle_encode(code, bits))


def test_encoder_known_k3_vector():
    # (7,5) K=3, input 1011 + 2 flush bits: walked by hand on the trellis.
    got = np.asarray(conv_encode(CODE_K3, [1, 0, 1, 1]))
    assert np.array_equal(got, oracle_encode(CODE_K3, [1, 0, 1, 1]))
    assert got[:2].tolist() == [1, 1]            # first step from zero state


def test_encoder_batched_and_unterminated():
    rng = np.random.default_rng(4)
    bits = rng.integers(0, 2, (3, 5, 32))
    got = np.asarray(conv_encode(CODE_K7, bits))
    assert got.shape == (3, 5, (32 + 6) * 2)
    for i in range(3):
        for j in range(5):
            assert np.array_equal(got[i, j], oracle_encode(CODE_K7,
                                                           bits[i, j]))
    nt = np.asarray(conv_encode(CODE_K7, bits[0, 0], terminate=False))
    assert np.array_equal(nt, oracle_encode(CODE_K7, bits[0, 0],
                                            terminate=False))


def test_puncture_rates():
    c23 = ConvCode(7, (0o171, 0o133), PUNCTURE_2_3)
    c34 = ConvCode(7, (0o171, 0o133), PUNCTURE_3_4)
    assert c23.rate == pytest.approx(2 / 3)
    assert c34.rate == pytest.approx(3 / 4)
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, 58)                # 58+6 = 64 steps
    for code in (c23, c34):
        got = np.asarray(conv_encode(code, bits))
        assert np.array_equal(got, oracle_encode(code, bits))


# -- decoder vs oracle ---------------------------------------------------------

@pytest.mark.parametrize("code", [CODE_K3, CODE_K7])
@pytest.mark.parametrize("terminate", [True, False])
def test_viterbi_matches_oracle_on_noisy_soft(code, terminate):
    rng = np.random.default_rng(11)
    bits = rng.integers(0, 2, 40)
    llrs = np.asarray(hard_llrs(oracle_encode(code, bits,
                                              terminate=terminate)))
    llrs = llrs + 0.7 * rng.standard_normal(llrs.size)   # noisy, ties broken
    got = np.asarray(viterbi_decode(code, llrs, terminate=terminate))
    want = oracle_viterbi(code, llrs, terminate=terminate)
    assert np.array_equal(got, want)


def test_viterbi_roundtrip_clean_and_batched():
    rng = np.random.default_rng(12)
    bits = rng.integers(0, 2, (4, 100))
    llrs = hard_llrs(conv_encode(CODE_K7, bits))
    dec = np.asarray(viterbi_decode(CODE_K7, llrs))
    assert np.array_equal(dec, bits)
    # Batched == per-row.
    one = np.asarray(viterbi_decode(CODE_K7, np.asarray(llrs)[2]))
    assert np.array_equal(one, bits[2])


def test_viterbi_corrects_bit_flips():
    rng = np.random.default_rng(13)
    bits = rng.integers(0, 2, 200)
    code_bits = np.array(conv_encode(CODE_K7, bits))
    # Flip well-separated code bits (d_free = 10 for (171,133): up to 4
    # errors per constraint span are correctable; keep them sparse).
    flips = np.arange(5, code_bits.size, 29)
    code_bits[flips] ^= 1
    dec = np.asarray(viterbi_decode(CODE_K7, hard_llrs(code_bits)))
    assert np.array_equal(dec, bits)


def test_viterbi_punctured_roundtrip():
    rng = np.random.default_rng(14)
    for pat in (PUNCTURE_2_3, PUNCTURE_3_4):
        code = ConvCode(7, (0o171, 0o133), pat)
        bits = rng.integers(0, 2, 114)           # 114+6 = 120 steps
        enc = conv_encode(code, bits)
        dec = np.asarray(viterbi_decode(code, hard_llrs(enc)))
        assert np.array_equal(dec, bits)


def test_depuncture_erasures():
    code = ConvCode(7, (0o171, 0o133), PUNCTURE_2_3)
    llr = np.arange(1, 7, dtype=np.float32)      # 6 kept = 2 periods
    full = np.asarray(depuncture(code, llr))
    assert full.shape == (8,)
    assert full[3] == 0.0 and full[7] == 0.0     # punctured y1 slots
    assert np.array_equal(full[[0, 1, 2, 4, 5, 6]], llr)


# -- constellation LLRs --------------------------------------------------------

@pytest.mark.parametrize("m", [2, 4, 8, 16])
def test_psk_llrs_signs_match_slicers(m):
    pts = psk_points(np.arange(m), m)
    nb = int(np.log2(m))
    llr = np.asarray(psk_llrs(m, pts))
    hard = (llr < 0).astype(np.int8)
    labels = np.asarray(slicers.slice_bits(m, pts))[:, :nb]
    assert np.array_equal(hard, labels)


def test_soft_decoding_beats_hard():
    rng = np.random.default_rng(15)
    bits = rng.integers(0, 2, 4000)
    coded = np.asarray(conv_encode(CODE_K7, bits), np.float64)
    # BPSK over AWGN at a stressy Eb/N0.
    tx = 1.0 - 2.0 * coded
    sigma = 0.65                                 # Eb/N0 ~ 3.7 dB
    r = tx + sigma * rng.standard_normal(tx.size)
    soft = np.asarray(viterbi_decode(CODE_K7, r.astype(np.float32)))
    hard = np.asarray(viterbi_decode(
        CODE_K7, hard_llrs((r < 0).astype(np.int8))))
    err_soft = int(np.sum(soft != bits))
    err_hard = int(np.sum(hard != bits))
    assert err_soft < err_hard                   # ~2 dB soft gain
    assert err_soft < 0.01 * bits.size


def test_end_to_end_qpsk_chain():
    """coded bits -> QPSK symbols (slicer labeling) -> AWGN -> psk_llrs ->
    Viterbi recovers the info bits exactly."""
    rng = np.random.default_rng(16)
    bits = rng.integers(0, 2, 500)
    coded = np.asarray(conv_encode(CODE_K7, bits))
    syms = qpsk_modulate(coded)
    noisy = syms + 0.22 * (rng.standard_normal(syms.size)
                           + 1j * rng.standard_normal(syms.size))
    llr = np.asarray(psk_llrs(4, noisy.astype(np.complex64)))
    dec = np.asarray(viterbi_decode(CODE_K7, llr.reshape(-1)))
    assert np.array_equal(dec, bits)


def test_make_viterbi_fn_and_validation():
    fn = make_viterbi_fn(CODE_K3)
    rng = np.random.default_rng(17)
    bits = rng.integers(0, 2, 30)
    assert np.array_equal(np.asarray(fn(hard_llrs(conv_encode(CODE_K3,
                                                              bits)))),
                          bits)
    with pytest.raises(ValueError):
        viterbi_decode(CODE_K3, np.zeros(7, np.float32))     # not mult of n
    with pytest.raises(ValueError):
        viterbi_decode(CODE_K3, np.zeros(4, np.float32))     # too short
    with pytest.raises(ValueError):
        ConvCode(1, (0o3, 0o1))
    with pytest.raises(ValueError):
        ConvCode(3, (0o7,))
    with pytest.raises(ValueError):
        ConvCode(7, (0o171, 0o133), ((0, 1), (1, 1)))        # drops col 0


def test_k9_code_roundtrip():
    """The K=9 (561,753) preset decodes through the 256-state trellis."""
    from psk_soft_tpu.ops.fec import CODE_K9

    rng = np.random.default_rng(18)
    bits = rng.integers(0, 2, (2, 120), np.int8)
    llrs = np.asarray(hard_llrs(conv_encode(CODE_K9, bits)), np.float64)
    llrs = llrs + 0.5 * rng.standard_normal(llrs.shape)
    dec = np.asarray(viterbi_decode(CODE_K9, llrs.astype(np.float32)))
    assert np.array_equal(dec, bits)
    # oracle parity on a short noisy vector
    one = oracle_viterbi(CODE_K9, llrs[0, :80].astype(np.float32))
    got = np.asarray(viterbi_decode(CODE_K9,
                                    llrs[0, :80].astype(np.float32)))
    assert np.array_equal(got, one)
