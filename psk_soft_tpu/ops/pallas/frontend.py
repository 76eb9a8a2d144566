"""Fused Pallas timing-frontend kernel: energy + windowed bins + argmax +
decision gather in one VMEM pass.

This is the sample-rate hot path (C2, cpp/psk_soft.cpp:442-467) -- everything
downstream runs at symbol rate (1/sps of the data).  The XLA version reads
and writes the sample stream several times (x -> energy -> cumsum -> window
diff -> gather); this kernel reads the samples from HBM exactly once and
writes only symbol-rate outputs, targeting the 8-bytes-per-sample HBM floor.

Layout (TPU-native): time-major planes (L, C) with channels on the 128-lane
axis, so every vector op runs at full lane utilization even though sps is
small (8-10) -- the layout answer to SURVEY.md "hard part #2".

Grid: (S/S_TILE, C/128), manually DMA'd overlapping input windows (each tile
needs a numAvg-1 symbol lookahead halo, which BlockSpecs cannot express).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _cumsum_axis0(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along axis 0 via log-step doubling (Mosaic has
    no cumsum lowering; each step is a static shift + add in VMEM)."""
    n = x.shape[0]
    d = 1
    while d < n:
        pad = jnp.zeros((d,) + x.shape[1:], x.dtype)
        x = x + jnp.concatenate([pad, x[:-d]], axis=0)
        d *= 2
    return x


def _kernel(s_tile: int, sps: int, num_avg: int,
            re_hbm, im_hbm, sel_re, sel_im, idx_out,
            sre, sim, sem):
    si = pl.program_id(0)
    ci = pl.program_id(1)
    tile_len = (s_tile + num_avg - 1) * sps
    start = si * s_tile * sps

    cp_re = pltpu.make_async_copy(
        re_hbm.at[pl.ds(start, tile_len), pl.ds(ci * LANES, LANES)],
        sre, sem.at[0])
    cp_im = pltpu.make_async_copy(
        im_hbm.at[pl.ds(start, tile_len), pl.ds(ci * LANES, LANES)],
        sim, sem.at[1])
    cp_re.start()
    cp_im.start()
    cp_re.wait()
    cp_im.wait()

    re = sre[:]
    im = sim[:]
    e = re * re + im * im                                   # (tile_len, 128)
    e3 = e.reshape(s_tile + num_avg - 1, sps, LANES)
    # Forward window sums over numAvg symbols: cumsum-diff, O(1)/output.
    cs = _cumsum_axis0(e3)
    upper = cs[num_avg - 1:]
    lower = jnp.concatenate(
        [jnp.zeros((1, sps, LANES), jnp.float32), cs[:s_tile - 1]], axis=0)
    w = upper - lower                                       # (s_tile, sps, 128)
    b = jnp.argmax(w, axis=1).astype(jnp.int32)             # (s_tile, 128)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (s_tile, sps, LANES), 1)
              == b[:, None, :])
    x3r = re[: s_tile * sps].reshape(s_tile, sps, LANES)
    x3i = im[: s_tile * sps].reshape(s_tile, sps, LANES)
    sel_re[:] = jnp.sum(jnp.where(onehot, x3r, 0.0), axis=1)
    sel_im[:] = jnp.sum(jnp.where(onehot, x3i, 0.0), axis=1)
    idx_out[:] = b


@functools.partial(jax.jit, static_argnames=("sps", "num_avg", "s_tile",
                                             "interpret"))
def timing_frontend_tm(cat_re: jnp.ndarray, cat_im: jnp.ndarray, *,
                       sps: int, num_avg: int, s_tile: int = 256,
                       interpret: bool = False):
    """Fused timing frontend over time-major planes.

    Args:
      cat_re/cat_im: (L, C) float32, L = (S + num_avg - 1) * sps -- the
        carry window rows prepended to the block (same cat as
        models/common.timing_frontend), C a multiple of 128.
      s_tile: symbols per kernel tile (S must divide by it).
    Returns:
      (sel_re, sel_im, sample_index): each (S, C); row o is output symbol o.
    """
    L, C = cat_re.shape
    if C % LANES:
        raise ValueError(f"channels ({C}) must be a multiple of {LANES}")
    if L % sps:
        raise ValueError(f"L ({L}) must be a multiple of sps ({sps})")
    s_out = L // sps - (num_avg - 1)
    if s_out <= 0:
        raise ValueError("block shorter than the timing window")
    s_tile = min(s_tile, s_out)
    if s_out % s_tile:
        raise ValueError(f"S ({s_out}) must divide by s_tile ({s_tile})")
    tile_len = (s_tile + num_avg - 1) * sps

    grid = (s_out // s_tile, C // LANES)
    kernel = functools.partial(_kernel, s_tile, sps, num_avg)
    out_shape = [
        jax.ShapeDtypeStruct((s_out, C), jnp.float32),
        jax.ShapeDtypeStruct((s_out, C), jnp.float32),
        jax.ShapeDtypeStruct((s_out, C), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec((s_tile, LANES), lambda si, ci: (si, ci),
                     memory_space=pltpu.VMEM)
        for _ in range(3)
    ]
    return tuple(pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((tile_len, LANES), jnp.float32),
            pltpu.VMEM((tile_len, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(cat_re, cat_im))
