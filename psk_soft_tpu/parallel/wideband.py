"""Mesh-sharded wideband channelization.

The polyphase DFT bank (ops/channelizer.py) is embarrassingly parallel
along time: output row t reads only input rows t-(K-1) .. t, so sharding
the (B, C) branch-row axis over the mesh needs exactly one K-1-row halo
from the left neighbor (overlap-save, the same ppermute seam the demod's
timing window uses in parallel/sharded.py).  The FFT axis (channels) stays
device-local -- no collective touches it.

Capture-to-bits on a slice then composes as: rows sharded over "time" ->
channelize (this module) -> (rows, C) planes -> the time+channel-sharded
demod kernel (parallel/sharded_full.py) without re-sharding: both stages
shard the same row axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def make_sharded_channelize(taps, channels: int, mesh: Mesh,
                            axis: str = "time"):
    """Jitted one-shot channelizer over row-sharded wideband input.

    Returns ``run(z) -> y`` with z (B, C) wideband branch rows (the
    ``x.reshape(B, C)`` of a B*C-sample capture) sharded P(axis, None),
    y (B, C) channel samples with the same sharding.  Matches
    ``channelize_block`` with a zero carry exactly (seam test:
    tests/test_channelizer.py).
    """
    K = taps.size // channels
    hpoly = jnp.asarray(taps).reshape(K, channels)

    def body(z):
        n_sh = jax.lax.psum(1, axis)
        # left neighbor's last K-1 rows (first shard: zeros == fresh carry)
        perm = [(i, i + 1) for i in range(n_sh - 1)]
        halo = jax.lax.ppermute(z[z.shape[0] - (K - 1):], axis, perm)
        zz = jnp.concatenate([halo, z], axis=0)
        b_loc = z.shape[0]
        v = hpoly[0] * zz[0:b_loc]
        for k in range(1, K):
            v = v + hpoly[k] * zz[k:k + b_loc]
        return jnp.fft.fft(v, axis=-1).astype(jnp.complex64)

    inner = jax.shard_map(body, mesh=mesh, in_specs=P(axis, None),
                          out_specs=P(axis, None), check_vma=False)
    return jax.jit(inner)
