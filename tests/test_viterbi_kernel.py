"""Mosaic Viterbi kernel == XLA scan decoder, bit for bit.

The kernel (ops/pallas/viterbi_kernel.py) runs in interpret mode on the CPU
mesh; the XLA scan decoder is itself oracle-gated in test_fec.py, so equality
here chains the kernel to the numpy register-walk reference.  Shapes are
deliberately awkward (batch below one lane tile, T off the tile grid) to
exercise the padding paths.  Hardware throughput/parity for the compiled
kernel lives in scripts/hwcheck_r04.py -> docs/HWCHECK_r04.md.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from psk_soft_tpu.ops.fec import (CODE_K3, CODE_K7, CODE_K9, PUNCTURE_2_3,
                                  ConvCode, conv_encode, hard_llrs,
                                  make_stream_soft_fn, viterbi_decode,
                                  viterbi_decode_parallel,
                                  viterbi_stream_init, viterbi_stream_step)
from psk_soft_tpu.ops.pallas.viterbi_kernel import (butterfly_signs,
                                                    viterbi_decode_pallas)


def _noisy_llrs(code, bits, sigma, rng, terminate=True):
    enc = np.asarray(conv_encode(code, jnp.asarray(bits),
                                 terminate=terminate))
    return (np.asarray(hard_llrs(enc))
            + sigma * rng.standard_normal(enc.shape).astype(np.float32))


@pytest.mark.parametrize("code,n_info", [(CODE_K3, 61), (CODE_K7, 97)])
@pytest.mark.parametrize("terminate", [True, False])
def test_decode_parity(code, n_info, terminate):
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (3, n_info)).astype(np.int8)
    llr = _noisy_llrs(code, bits, 0.4, rng)
    ref = np.asarray(viterbi_decode(code, llr, terminate=terminate,
                                    backend="xla"))
    out = np.asarray(viterbi_decode_pallas(code, llr, terminate=terminate,
                                           interpret=True, t_tile=16))
    np.testing.assert_array_equal(out, ref)
    if terminate:
        np.testing.assert_array_equal(ref, bits)   # sigma small enough


def test_decode_parity_k9_and_puncture():
    rng = np.random.default_rng(1)
    code = CODE_K9
    bits = rng.integers(0, 2, (2, 40)).astype(np.int8)
    llr = _noisy_llrs(code, bits, 0.3, rng)
    np.testing.assert_array_equal(
        np.asarray(viterbi_decode(code, llr, backend="pallas")),
        np.asarray(viterbi_decode(code, llr, backend="xla")))

    punct = ConvCode(7, (0o171, 0o133), PUNCTURE_2_3)
    bits = rng.integers(0, 2, (2, 64)).astype(np.int8)
    llr = _noisy_llrs(punct, bits, 0.2, rng)
    np.testing.assert_array_equal(
        np.asarray(viterbi_decode(punct, llr, backend="pallas")),
        np.asarray(viterbi_decode(punct, llr, backend="xla")))


def test_stream_step_parity_and_carry_interchange():
    """Carry layout is backend-invariant: alternate backends mid-stream."""
    code = CODE_K7
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, (3, 256)).astype(np.int8)
    llr = _noisy_llrs(code, bits, 0.3, rng, terminate=False)
    steps = llr.reshape(3, -1, code.n)
    st_x = viterbi_stream_init(code, 3, 70)
    st_p = viterbi_stream_init(code, 3, 70)
    for i, backend_p in enumerate(["pallas", "xla", "pallas", "xla"]):
        blk = steps[:, 64 * i:64 * (i + 1)]
        st_x, b_x = viterbi_stream_step(code, st_x, blk, backend="xla")
        st_p, b_p = viterbi_stream_step(code, st_p, blk, backend=backend_p)
        np.testing.assert_array_equal(np.asarray(b_p), np.asarray(b_x))
        np.testing.assert_array_equal(np.asarray(st_p.dec),
                                      np.asarray(st_x.dec))
        np.testing.assert_allclose(np.asarray(st_p.pm),
                                   np.asarray(st_x.pm), atol=1e-4)


def test_stream_soft_fn_backend_parity():
    code = CODE_K7
    rng = np.random.default_rng(3)
    soft = (rng.standard_normal((2, 64))
            + 1j * rng.standard_normal((2, 64))).astype(np.complex64)
    st = viterbi_stream_init(code, 2, 70)
    fx = make_stream_soft_fn(code, 4, backend="xla")
    fp = make_stream_soft_fn(code, 4, backend="pallas")
    st_x, b_x = fx(st, jnp.asarray(soft))
    st_p, b_p = fp(st, jnp.asarray(soft))
    np.testing.assert_array_equal(np.asarray(b_p), np.asarray(b_x))
    np.testing.assert_array_equal(np.asarray(st_p.dec), np.asarray(st_x.dec))


def test_parallel_decode_backend_parity():
    code = CODE_K3
    rng = np.random.default_rng(4)
    bits = rng.integers(0, 2, (2, 160)).astype(np.int8)
    llr = _noisy_llrs(code, bits, 0.2, rng, terminate=False)
    ref = np.asarray(viterbi_decode_parallel(code, llr, chunk=32, margin=14,
                                             backend="xla"))
    out = np.asarray(viterbi_decode_parallel(code, llr, chunk=32, margin=14,
                                             backend="pallas"))
    np.testing.assert_array_equal(out, ref)


def test_butterfly_signs_layout():
    """Row a*S + 2j + p carries exp[s'=(S/2)a+j, p] -- the concat layout."""
    from psk_soft_tpu.ops.fec import _trellis

    code = CODE_K7
    _, exp = _trellis(code)
    flat = butterfly_signs(code)
    s = code.states
    for sp in [0, 1, 17, s - 1]:
        a, j = sp // (s // 2), sp % (s // 2)
        for p in range(2):
            np.testing.assert_array_equal(flat[a * s + 2 * j + p],
                                          exp[sp, p])


def test_backend_validation():
    with pytest.raises(ValueError):
        viterbi_decode(CODE_K3, np.zeros(16, np.float32), backend="cuda")


@pytest.mark.parametrize("terminate", [True, False])
def test_fused_matches_two_phase(terminate):
    # The fused single-launch kernel (default for frame-length trellises)
    # and the two-phase time-tiled path (forced by an explicit t_tile)
    # must produce identical bits.
    code = CODE_K7
    rng = np.random.default_rng(11)
    bits = rng.integers(0, 2, (4, 300)).astype(np.int8)
    llr = _noisy_llrs(code, bits, 0.3, rng, terminate=terminate)
    fused = np.asarray(viterbi_decode_pallas(code, llr, terminate=terminate,
                                             interpret=True))
    two = np.asarray(viterbi_decode_pallas(code, llr, terminate=terminate,
                                           interpret=True, t_tile=64))
    np.testing.assert_array_equal(fused, two)


def test_decode_parity_odd_t_tile():
    # An explicit t_tile that is not a multiple of the unroll factor is
    # rounded up internally: a full tile's rounded-up step loop must not
    # write decision rows past its block (regression for the 4-step
    # unroll; t_tile=18 -> 20).
    code = CODE_K7
    rng = np.random.default_rng(13)
    bits = rng.integers(0, 2, (3, 90)).astype(np.int8)
    llr = _noisy_llrs(code, bits, 0.3, rng)
    ref = np.asarray(viterbi_decode(code, llr, backend="xla"))
    out = np.asarray(viterbi_decode_pallas(code, llr, interpret=True,
                                           t_tile=18))
    np.testing.assert_array_equal(out, ref)


def test_decode_parity_fuzz():
    # Seeded property fuzz: random constraint lengths, polynomials,
    # frame lengths, batch sizes, modes -- kernel (fused or two-phase,
    # depending on shape) must equal the XLA scan decoder bit for bit.
    rng = np.random.default_rng(99)
    for trial in range(6):
        k = int(rng.choice([3, 4, 5, 7]))
        polys = tuple(int(p) | (1 << (k - 1)) | 1
                      for p in rng.integers(1, 1 << k, 2))
        if polys[0] == polys[1]:
            continue
        code = ConvCode(k, polys)
        t = int(rng.integers(20, 300))
        b = int(rng.integers(1, 8))
        terminate = bool(rng.integers(0, 2))
        bits = rng.integers(0, 2, (b, t)).astype(np.int8)
        enc = np.asarray(hard_llrs(conv_encode(code, bits,
                                               terminate=terminate)))
        llr = (enc + 0.35 * rng.standard_normal(enc.shape)
               ).astype(np.float32)
        ref = np.asarray(viterbi_decode(code, llr, terminate=terminate,
                                        backend="xla"))
        out = np.asarray(viterbi_decode_pallas(code, llr,
                                               terminate=terminate,
                                               interpret=True))
        np.testing.assert_array_equal(out, ref, err_msg=str(
            (trial, k, polys, t, b, terminate)))
