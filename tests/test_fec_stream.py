"""Streaming (windowed-traceback) Viterbi: ops kernel + runtime wrapper.

Gate: streamed output over any block split == full-stream Viterbi
(terminate=False) once the traceback window covers survivor merges.
"""

import numpy as np
import pytest

from psk_soft_tpu.ops import tx
from psk_soft_tpu.ops.fec import (CODE_K3, CODE_K7, PUNCTURE_2_3, ConvCode,
                                  conv_encode, viterbi_decode,
                                  viterbi_stream_flush, viterbi_stream_init,
                                  viterbi_stream_step)
from psk_soft_tpu.runtime.fec import StreamFecDecoder


def _noisy_llrs(code, bits, sigma, rng):
    coded = np.asarray(conv_encode(code, bits, terminate=False), np.float64)
    r = (1.0 - 2.0 * coded) + sigma * rng.standard_normal(coded.shape)
    return r.astype(np.float32)


@pytest.mark.parametrize("code,depth", [(CODE_K3, 24), (CODE_K7, 70)])
def test_stream_matches_full_viterbi(code, depth):
    rng = np.random.default_rng(91)
    bits = rng.integers(0, 2, (2, 600), np.int8)
    llrs = _noisy_llrs(code, bits, 0.4, rng)
    full = np.asarray(viterbi_decode(code, llrs, terminate=False))

    steps = llrs.reshape(2, -1, code.n)
    st = viterbi_stream_init(code, 2, depth)
    out = []
    for lo in range(0, steps.shape[1], 100):
        st, b = viterbi_stream_step(code, st, steps[:, lo:lo + 100])
        out.append(np.asarray(b))
    out.append(np.asarray(viterbi_stream_flush(code, st)))
    got = np.concatenate(out, axis=1)[:, depth:]       # drop pre-stream
    assert got.shape == full.shape
    assert np.array_equal(got, full)
    # and the decode is actually correct at this noise level
    assert np.array_equal(full, bits)


def test_stream_split_invariance():
    rng = np.random.default_rng(92)
    code, depth = CODE_K7, 70
    bits = rng.integers(0, 2, (1, 500), np.int8)
    steps = _noisy_llrs(code, bits, 0.5, rng).reshape(1, -1, 2)

    def run(chunks):
        st = viterbi_stream_init(code, 1, depth)
        out = []
        lo = 0
        for c in chunks:
            st, b = viterbi_stream_step(code, st, steps[:, lo:lo + c])
            out.append(np.asarray(b))
            lo += c
        st, b = viterbi_stream_step(code, st, steps[:, lo:])
        out.append(np.asarray(b))
        out.append(np.asarray(viterbi_stream_flush(code, st)))
        return np.concatenate(out, axis=1)[:, depth:]

    a = run([500])
    for chunks in ([100, 250], [1, 1, 498], [333]):
        assert np.array_equal(run(chunks), a)


def test_stream_decoder_wrapper_qpsk():
    """Standalone StreamFecDecoder over QPSK soft symbols in odd chunks."""
    rng = np.random.default_rng(93)
    code = CODE_K7
    bits = rng.integers(0, 2, (2, 2000), np.int8)
    coded = np.asarray(conv_encode(code, bits, terminate=False))
    syms = np.stack([tx.symbols_to_iq(4, tx.bits_to_symbols(4, row))
                     for row in coded])
    noisy = (syms + 0.15 * (rng.standard_normal(syms.shape)
                            + 1j * rng.standard_normal(syms.shape))
             ).astype(np.complex64)

    dec = StreamFecDecoder(2, code, m=4, depth=70, block_steps=256)
    for lo in range(0, noisy.shape[1], 177):           # ragged chunks
        dec.observe(noisy[:, lo:lo + 177])
    dec.finalize()
    got = dec.pop_bits()
    assert got.shape == bits.shape
    assert np.array_equal(got, bits)
    assert dec.steps_decoded == bits.shape[1]


def test_stream_decoder_punctured():
    rng = np.random.default_rng(94)
    code = ConvCode(7, (0o171, 0o133), PUNCTURE_2_3)
    bits = rng.integers(0, 2, (1, 1500), np.int8)
    coded = np.asarray(conv_encode(code, bits, terminate=False))
    assert coded.shape[1] == 1500 * 3 // 2             # rate 2/3
    syms = tx.symbols_to_iq(4, tx.bits_to_symbols(4, coded[0]))[None]
    dec = StreamFecDecoder(1, code, m=4, depth=96, block_steps=250)
    dec.observe(syms.astype(np.complex64))
    dec.finalize()
    got = dec.pop_bits()
    assert np.array_equal(got, bits)


def test_stream_decoder_validation_and_reset():
    dec = StreamFecDecoder(2, CODE_K7, m=4)
    with pytest.raises(ValueError):
        dec.observe(np.zeros((3, 8), np.complex64))
    with pytest.raises(ValueError):
        StreamFecDecoder(2, CODE_K7)                   # m required
    with pytest.raises(ValueError):
        viterbi_stream_init(CODE_K7, 1, 3)             # depth < K
    rng = np.random.default_rng(95)
    bits = rng.integers(0, 2, (2, 400), np.int8)
    coded = np.asarray(conv_encode(CODE_K7, bits, terminate=False))
    syms = np.stack([tx.symbols_to_iq(4, tx.bits_to_symbols(4, row))
                     for row in coded]).astype(np.complex64)
    dec.observe(syms)
    dec.reset_fec()
    assert dec.pop_bits().shape == (2, 0)
    dec.observe(syms)
    dec.finalize()
    assert np.array_equal(dec.pop_bits(), bits)


def test_parallel_decode_matches_sequential():
    """Overlap-save time-parallel Viterbi == sequential decode, exactly."""
    from psk_soft_tpu.ops.fec import viterbi_decode_parallel

    rng = np.random.default_rng(96)
    for code, margin in ((CODE_K7, 70), (CODE_K3, 30)):
        bits = rng.integers(0, 2, (2, 3000), np.int8)
        llrs = _noisy_llrs(code, bits, 0.5, rng)
        seq = np.asarray(viterbi_decode(code, llrs, terminate=False))
        for chunk in (256, 512, 1000):
            par = np.asarray(viterbi_decode_parallel(
                code, llrs, chunk=chunk, margin=margin))
            assert np.array_equal(par, seq), (code.k, chunk)
    # punctured
    code = ConvCode(7, (0o171, 0o133), PUNCTURE_2_3)
    bits = rng.integers(0, 2, (1, 2400), np.int8)
    llrs = _noisy_llrs(code, bits, 0.4, rng)
    seq = np.asarray(viterbi_decode(code, llrs, terminate=False))
    par = np.asarray(viterbi_decode_parallel(code, llrs, chunk=400,
                                             margin=80))
    assert np.array_equal(par, seq)
    # short stream falls back to the sequential path
    short = _noisy_llrs(CODE_K7, bits[:, :150], 0.4, rng)
    assert np.array_equal(
        np.asarray(viterbi_decode_parallel(CODE_K7, short, chunk=512)),
        np.asarray(viterbi_decode(CODE_K7, short, terminate=False)))
    with pytest.raises(ValueError):
        viterbi_decode_parallel(CODE_K7, llrs[:, :3])   # not mult of n
    with pytest.raises(ValueError):
        viterbi_decode_parallel(CODE_K7, _noisy_llrs(CODE_K7, bits, 0.4,
                                                     rng),
                                chunk=100, margin=3)    # margin < K
