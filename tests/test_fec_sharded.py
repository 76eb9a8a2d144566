"""FEC under the device mesh: channel-sharded decode == single device.

The bit layer is embarrassingly parallel over channels (SURVEY.md §2.5's
DP axis), so the whole LLR -> depuncture -> Viterbi pipeline shards over
the `chan` mesh axis with zero collectives -- this gates that the kernels
are actually shard_map-clean (no hidden batch coupling; note the ACS
normalization is per-row, so sharding cannot change results).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from psk_soft_tpu.ops import tx
from psk_soft_tpu.ops.fec import (CODE_K7, conv_encode, make_stream_soft_fn,
                                  psk_llrs, viterbi_decode,
                                  viterbi_stream_init)
from psk_soft_tpu.parallel.mesh import make_mesh


@pytest.mark.parametrize("chan_shards", [2, 4, 8])
def test_channel_sharded_viterbi_matches_single(chan_shards):
    if len(jax.devices()) < chan_shards:
        pytest.skip("needs the virtual 8-device mesh")
    rng = np.random.default_rng(141)
    C, n_bits = 8, 400
    bits = rng.integers(0, 2, (C, n_bits), np.int8)
    coded = np.asarray(conv_encode(CODE_K7, bits))
    llrs = ((1.0 - 2.0 * coded)
            + 0.4 * rng.standard_normal(coded.shape)).astype(np.float32)

    single = np.asarray(viterbi_decode(CODE_K7, llrs))
    mesh = make_mesh(chan=chan_shards)

    @jax.jit
    def sharded(y):
        return jax.shard_map(
            lambda rows: viterbi_decode(CODE_K7, rows),
            mesh=mesh, in_specs=P("chan", None),
            out_specs=P("chan", None), check_vma=False)(y)

    got = np.asarray(sharded(jnp.asarray(llrs)))
    assert np.array_equal(got, single)
    assert np.array_equal(got, bits)


def test_channel_sharded_stream_block_matches_single():
    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual 8-device mesh")
    rng = np.random.default_rng(142)
    C, n_sym = 8, 768
    bits = rng.integers(0, 2, (C, n_sym), np.int8)
    coded = np.asarray(conv_encode(CODE_K7, bits, terminate=False))
    syms = tx.symbols_to_iq(
        4, tx.bits_to_symbols(4, coded.reshape(-1)).reshape(C, -1))
    noisy = (syms + 0.1 * (rng.standard_normal(syms.shape)
                           + 1j * rng.standard_normal(syms.shape))
             ).astype(np.complex64)

    fn = make_stream_soft_fn(CODE_K7, 4)
    st = viterbi_stream_init(CODE_K7, C, 70)
    _, ref_bits = fn(st, jnp.asarray(noisy))

    mesh = make_mesh(chan=4)

    @jax.jit
    def sharded(pm, dec, soft):
        def per_shard(pm_s, dec_s, soft_s):
            st_s = type(st)(pm=pm_s, dec=dec_s)
            st2, b = fn(st_s, soft_s)
            return st2.pm, st2.dec, b

        return jax.shard_map(per_shard, mesh=mesh,
                             in_specs=(P("chan", None),
                                       P(None, "chan", None),
                                       P("chan", None)),
                             out_specs=(P("chan", None),
                                        P(None, "chan", None),
                                        P("chan", None)),
                             check_vma=False)(pm, dec, soft)

    pm2, dec2, got = sharded(st.pm, st.dec, jnp.asarray(noisy))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref_bits))


def test_sharded_llr_kernel_matches_single():
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    rng = np.random.default_rng(143)
    soft = (rng.standard_normal((8, 256))
            + 1j * rng.standard_normal((8, 256))).astype(np.complex64)
    single = np.asarray(psk_llrs(8, soft))
    mesh = make_mesh(chan=8)

    @jax.jit
    def sharded(x):
        return jax.shard_map(lambda rows: psk_llrs(8, rows), mesh=mesh,
                             in_specs=P("chan", None),
                             out_specs=P("chan", None, None),
                             check_vma=False)(x)

    got = np.asarray(sharded(jnp.asarray(soft)))
    np.testing.assert_allclose(got, single, rtol=0, atol=1e-5)
