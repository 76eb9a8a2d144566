"""Time+channel-sharded single-kernel pipeline vs the jnp sharded reference
and the single-device full kernel (CPU mesh, interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psk_soft_tpu import DemodConfig
from psk_soft_tpu.models.blockpsk import ff_init, make_ff_demod_fn
from psk_soft_tpu.parallel.mesh import make_mesh
from psk_soft_tpu.parallel.sharded_full import make_time_sharded_full_demod
from jax.sharding import NamedSharding, PartitionSpec as P

C, NS = 256, 2048  # 128 lanes per channel shard (kernel constraint)


def _signals(m=4, diff=False):
    out = []
    for i in range(C):
        rng = np.random.default_rng(i)
        j = rng.integers(0, m, NS)
        pts = np.exp(2j * np.pi * j / m)
        if diff:
            pts = np.cumprod(pts)
        x = np.zeros(NS * 8, np.complex64)
        x[3::8] = pts * np.exp(2j * np.pi * 1e-4 * 8 * np.arange(NS))
        x += (0.01 * rng.standard_normal(x.size)).astype(np.complex64)
        out.append(x)
    return np.stack(out)


@pytest.mark.parametrize("m,diff,meshdims", [(4, False, (2, 4)),
                                             (4, False, (1, 8)),
                                             (8, False, (2, 2)),
                                             (4, True, (2, 4))])
def test_time_sharded_full_matches_ff(m, diff, meshdims):
    cfg = DemodConfig(sps=8, num_avg=50, constellation_size=m, phase_avg=20,
                      differential=diff)
    xs = _signals(m=m, diff=diff)
    chan_ax, time_ax = meshdims
    mesh = make_mesh(chan=chan_ax, time=time_ax)
    run = make_time_sharded_full_demod(cfg, mesh, NS, s_tile=128,
                                       interpret=True)
    sh = NamedSharding(mesh, P("time", "chan"))
    x_re = jax.device_put(jnp.asarray(np.ascontiguousarray(xs.real.T)), sh)
    x_im = jax.device_put(jnp.asarray(np.ascontiguousarray(xs.imag.T)), sh)
    soft_re, soft_im, phase, packed, idx, valid = run(x_re, x_im)
    soft_sh = (np.asarray(soft_re) + 1j * np.asarray(soft_im)).T  # (C, S)
    valid = np.asarray(valid).T
    idx_sh = np.asarray(idx).T

    # Reference: single-device feed-forward over the whole stream.
    fn = make_ff_demod_fn(cfg, channels=C)
    _, out = fn(ff_init(cfg, (C,)), jnp.asarray(xs))
    v_ff = np.asarray(out.valid)
    soft_ff_full = np.zeros((C, NS), np.complex64)
    idx_ff_full = np.zeros((C, NS), np.int32)
    # ff output o (valid) is stream symbol o-(num_avg-1).
    a1 = cfg.num_avg - 1
    soft_ff_full[:, : NS - a1] = np.asarray(out.soft)[:, a1:]
    idx_ff_full[:, : NS - a1] = np.asarray(out.sample_index)[:, a1:]

    assert valid.any() and (~valid).any()
    np.testing.assert_array_equal(idx_sh[valid], idx_ff_full[valid])
    d = soft_sh[valid] - soft_ff_full[valid]
    # Global M-fold rotation ambiguity is legal (like the reference);
    # remove the best rotation before comparing.
    errs = [np.abs(d_r).max() for d_r in
            (soft_sh[valid] * np.exp(2j * np.pi * r / m)
             - soft_ff_full[valid] for r in range(m))]
    assert min(errs) < 5e-3, min(errs)
    # Bits equal modulo the same rotation only when r == 0 wins; check
    # constellation consistency instead: packed bits re-derive from soft.
    from psk_soft_tpu.ops import slicers
    re_sliced = np.asarray(slicers.slice_bits(m, jnp.asarray(soft_sh[valid])))
    got = np.asarray(packed).T[valid]
    vals = (re_sliced[:, 0] + 2 * re_sliced[:, 1] + 4 * re_sliced[:, 2])
    np.testing.assert_array_equal(got, vals)
