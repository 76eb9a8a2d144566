"""Fully-fused single-kernel pipeline vs the feed-forward reference
(interpret mode on CPU; the same kernel compiles with Mosaic on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psk_soft_tpu import DemodConfig
from psk_soft_tpu.models.blockpsk import ff_init, make_ff_demod_fn
from psk_soft_tpu.models.full import (demod_block_full, full_from_ff,
                                      make_full_demod_fn, to_demod_outputs)
from psk_soft_tpu.ops.pallas.demod_kernel import atan2_poly

C, NS = 128, 768


def _channels(m=4, diff=False, sps=8):
    out = []
    for i in range(C):
        rng = np.random.default_rng(i)
        j = rng.integers(0, m, NS)
        pts = np.exp(2j * np.pi * j / m)
        if diff:
            pts = np.cumprod(pts)
        x = np.zeros(NS * sps, np.complex64)
        x[2::sps] = pts * np.exp(2j * np.pi * 2e-4 * sps * np.arange(NS))
        x += (0.01 * rng.standard_normal(x.size)).astype(np.complex64)
        out.append(x)
    return np.stack(out)


def test_atan2_poly_accuracy():
    rng = np.random.default_rng(0)
    y = rng.standard_normal(4096).astype(np.float32)
    x = rng.standard_normal(4096).astype(np.float32)
    got = np.asarray(atan2_poly(jnp.asarray(y), jnp.asarray(x)))
    np.testing.assert_allclose(got, np.arctan2(y, x), atol=5e-6)


@pytest.mark.parametrize("m,diff", [(4, False), (2, False), (8, False),
                                    (4, True)])
def test_full_kernel_matches_blockpsk_steady(m, diff):
    cfg = DemodConfig(sps=8, num_avg=50, constellation_size=m, phase_avg=20,
                      differential=diff)
    xs = _channels(m=m, diff=diff)
    warm, run = np.split(xs, [256 * 8], axis=1)

    # Converge the FF pipeline, then hand the carry to the full kernel.
    fn_ff = make_ff_demod_fn(cfg, channels=C)
    st_ff, _ = fn_ff(ff_init(cfg, (C,)), jnp.asarray(warm))
    st_full = full_from_ff(cfg, st_ff)
    fn_full = make_full_demod_fn(cfg, s_tile=128, interpret=True)
    st_full, out_full = fn_full(st_full, jnp.asarray(run.real.T),
                                jnp.asarray(run.imag.T))
    out_full = to_demod_outputs(cfg, out_full)

    st_ff, out_ff = fn_ff(st_ff, jnp.asarray(run))
    assert np.asarray(out_ff.valid).all()
    np.testing.assert_array_equal(np.asarray(out_full.sample_index),
                                  np.asarray(out_ff.sample_index))
    np.testing.assert_allclose(np.asarray(out_full.phase),
                               np.asarray(out_ff.phase), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_full.soft),
                               np.asarray(out_ff.soft), atol=3e-3)
    nb = cfg.bits_per_symbol
    np.testing.assert_array_equal(np.asarray(out_full.bits)[..., :nb],
                                  np.asarray(out_ff.bits)[..., :nb])


def test_full_kernel_multiblock_carry():
    cfg = DemodConfig(sps=8, num_avg=50, constellation_size=4, phase_avg=20)
    xs = _channels()
    warm, run = np.split(xs, [256 * 8], axis=1)
    fn_ff = make_ff_demod_fn(cfg, channels=C)
    st_ff, _ = fn_ff(ff_init(cfg, (C,)), jnp.asarray(warm))
    fn_full = make_full_demod_fn(cfg, s_tile=128, interpret=True)

    st = full_from_ff(cfg, st_ff)
    st1, one = fn_full(st, jnp.asarray(run.real.T), jnp.asarray(run.imag.T))

    st = full_from_ff(cfg, st_ff)
    parts = []
    for blk in np.split(run, 2, axis=1):
        st, o = fn_full(st, jnp.asarray(blk.real.T), jnp.asarray(blk.imag.T))
        parts.append(o)
    soft_parts = np.concatenate([np.asarray(p.soft_re) for p in parts], axis=0)
    np.testing.assert_allclose(soft_parts, np.asarray(one.soft_re), atol=1e-4)
    planes_a = np.asarray(st.planes)
    planes_b = np.asarray(st1.planes)
    np.testing.assert_allclose(planes_a, planes_b, atol=1e-3)


@pytest.mark.parametrize("sps,s_tile", [(8, 128), (10, 64)])
def test_full_kernel_double_buffer_bitexact(sps, s_tile):
    """Double-buffered input DMA must be bit-exact vs single-buffered at the
    same tile size (verified on hardware too; this locks the interpret path).
    sps=10 exercises the concat/tile_pad path with a tile below num_avg-1
    (allowed there: the concat tile start needs no window subtraction)."""
    cfg = DemodConfig(sps=sps, num_avg=50, constellation_size=4, phase_avg=20)
    xs = _channels(sps=sps)
    warm, run = np.split(xs, [256 * sps], axis=1)
    fn_ff = make_ff_demod_fn(cfg, channels=C)
    st_ff, _ = fn_ff(ff_init(cfg, (C,)), jnp.asarray(warm))
    st0 = full_from_ff(cfg, st_ff)
    xr, xi = jnp.asarray(run.real.T), jnp.asarray(run.imag.T)
    outs = []
    for db in (False, True):
        st, out = demod_block_full(cfg, st0, xr, xi, s_tile=s_tile,
                                   double_buffer=db, interpret=True)
        outs.append([np.asarray(l) for l in jax.tree.leaves((st, out))])
    for u, v in zip(*outs):
        np.testing.assert_array_equal(u, v)


def test_full_kernel_guards():
    cfg = DemodConfig(sps=8, num_avg=50, constellation_size=4, phase_avg=5)
    with pytest.raises(ValueError, match="phase_avg"):
        from psk_soft_tpu.models.blockpsk import ff_init as fi
        full_from_ff(cfg, fi(cfg, (C,)))


def test_full_kernel_packed_int8_outputs():
    """pack_out=True emits int8 bits/sampleIndex planes bit-identical to the
    int32 ones (and auto mode packs whenever s_tile is 32-aligned)."""
    cfg = DemodConfig(sps=8, num_avg=50, constellation_size=8, phase_avg=20)
    xs = _channels(m=8)
    warm, run = np.split(xs, [256 * 8], axis=1)
    fn_ff = make_ff_demod_fn(cfg, channels=C)
    st_ff, _ = fn_ff(ff_init(cfg, (C,)), jnp.asarray(warm))
    st = full_from_ff(cfg, st_ff)
    xr = jnp.asarray(run.real.T)
    xi = jnp.asarray(run.imag.T)
    _, o32 = demod_block_full(cfg, st, xr, xi, s_tile=128, pack_out=False,
                              interpret=True)
    _, o8 = demod_block_full(cfg, st, xr, xi, s_tile=128, pack_out=True,
                             interpret=True)
    assert o8.bits_packed.dtype == jnp.int8
    assert o8.sample_index.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(o32.bits_packed),
                                  np.asarray(o8.bits_packed))
    np.testing.assert_array_equal(np.asarray(o32.sample_index),
                                  np.asarray(o8.sample_index))
    np.testing.assert_array_equal(np.asarray(o32.soft_re),
                                  np.asarray(o8.soft_re))
    # Auto mode packs at a 32-aligned tile.
    _, oa = demod_block_full(cfg, st, xr, xi, s_tile=128, interpret=True)
    assert oa.bits_packed.dtype == jnp.int8
    # Explicit pack at a misaligned tile is rejected, not miscompiled.
    cfg10 = DemodConfig(sps=10, num_avg=5, constellation_size=4, phase_avg=20)
    stp = full_from_ff(cfg10, ff_init(cfg10, (C,)))
    with pytest.raises(ValueError, match="pack_out"):
        demod_block_full(cfg10, stp,
                         jnp.zeros((40 * 10, C), jnp.float32),
                         jnp.zeros((40 * 10, C), jnp.float32),
                         s_tile=40, pack_out=True, interpret=True)


def test_full_kernel_rolling_window_parity():
    """Rolling-window mode (window read in place from the previous block's
    planes) is bit-identical to the window-carry path across a multi-block
    chain, and the planes carry stays bit-identical too."""
    cfg = DemodConfig(sps=8, num_avg=50, constellation_size=4, phase_avg=20)
    from psk_soft_tpu.models.full import demod_block_full_rolling

    xs = _channels()
    warm, run = np.split(xs, [256 * 8], axis=1)
    fn_ff = make_ff_demod_fn(cfg, channels=C)
    st_ff, _ = fn_ff(ff_init(cfg, (C,)), jnp.asarray(warm))
    blocks = np.split(run, 4, axis=1)
    planes_blocks = [(jnp.asarray(b.real.T), jnp.asarray(b.imag.T))
                     for b in blocks]

    # Legacy chain.
    st = full_from_ff(cfg, st_ff)
    legacy = []
    for xr, xi in planes_blocks:
        st, o = demod_block_full(cfg, st, xr, xi, s_tile=64, interpret=True)
        legacy.append(o)

    # Rolling chain: block 0 legacy (no previous planes), then rolling.
    st2 = full_from_ff(cfg, st_ff)
    st2, o0 = demod_block_full(cfg, st2, *planes_blocks[0], s_tile=64,
                               interpret=True)
    rolling = [o0]
    planes = st2.planes
    for i in range(1, 4):
        planes, o = demod_block_full_rolling(
            cfg, planes, *planes_blocks[i - 1], *planes_blocks[i],
            s_tile=64, interpret=True)
        rolling.append(o)

    for a, b in zip(legacy, rolling):
        np.testing.assert_array_equal(np.asarray(a.soft_re),
                                      np.asarray(b.soft_re))
        np.testing.assert_array_equal(np.asarray(a.soft_im),
                                      np.asarray(b.soft_im))
        np.testing.assert_array_equal(np.asarray(a.phase),
                                      np.asarray(b.phase))
        np.testing.assert_array_equal(np.asarray(a.bits_packed),
                                      np.asarray(b.bits_packed))
        np.testing.assert_array_equal(np.asarray(a.sample_index),
                                      np.asarray(b.sample_index))
    np.testing.assert_array_equal(np.asarray(st.planes), np.asarray(planes))


def test_full_kernel_rolling_rejects_mf():
    """Rolling mode requires the split-DMA path: matched-filter configs are
    rejected with a clear error instead of a silent concat."""
    from psk_soft_tpu.models.full import demod_block_full_rolling

    cfg = DemodConfig(sps=8, num_avg=50, constellation_size=4, phase_avg=20,
                      matched_filter="rrc")
    z = jnp.zeros((512 * 8, C), jnp.float32)
    with pytest.raises(ValueError, match="rolling"):
        demod_block_full_rolling(cfg, jnp.zeros((56, C), jnp.float32),
                                 z, z, z, z, s_tile=64, interpret=True)


def test_full_kernel_debug_ports_off():
    """debug_ports=False drops the phase/sampleIndex planes (None) while
    soft/bits stay bit-identical -- including through the rolling mode."""
    from psk_soft_tpu.models.full import (demod_block_full_rolling,
                                          to_demod_outputs)

    cfg = DemodConfig(sps=8, num_avg=50, constellation_size=4, phase_avg=20)
    xs = _channels()
    warm, run = np.split(xs, [256 * 8], axis=1)
    fn_ff = make_ff_demod_fn(cfg, channels=C)
    st_ff, _ = fn_ff(ff_init(cfg, (C,)), jnp.asarray(warm))
    st = full_from_ff(cfg, st_ff)
    xr = jnp.asarray(run.real.T)
    xi = jnp.asarray(run.imag.T)
    st_on, on = demod_block_full(cfg, st, xr, xi, s_tile=128, interpret=True)
    st_off, off = demod_block_full(cfg, st, xr, xi, s_tile=128,
                                   debug_ports=False, interpret=True)
    assert off.phase is None and off.sample_index is None
    np.testing.assert_array_equal(np.asarray(on.soft_re),
                                  np.asarray(off.soft_re))
    np.testing.assert_array_equal(np.asarray(on.bits_packed),
                                  np.asarray(off.bits_packed))
    np.testing.assert_array_equal(np.asarray(st_on.planes),
                                  np.asarray(st_off.planes))
    do = to_demod_outputs(cfg, off)
    assert do.phase is None and do.sample_index is None
    # Rolling x debug-off compose.
    half = run.shape[1] // 2
    p2, o2 = demod_block_full_rolling(
        cfg, st_off.planes,
        jnp.asarray(run[:, :half].real.T), jnp.asarray(run[:, :half].imag.T),
        jnp.asarray(run[:, half:].real.T), jnp.asarray(run[:, half:].imag.T),
        s_tile=128, debug_ports=False, interpret=True)
    assert o2.phase is None
