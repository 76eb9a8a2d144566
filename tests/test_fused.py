"""Fused Pallas pipeline vs the reference feed-forward pipeline (interpret
mode on CPU; the same kernel compiles with Mosaic on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from psk_soft_tpu import DemodConfig
from psk_soft_tpu.models.blockpsk import ff_init, make_ff_demod_fn
from psk_soft_tpu.models.fused import fused_init, make_fused_demod_fn
from psk_soft_tpu.ops.pallas.frontend import timing_frontend_tm
from psk_soft_tpu.ops import timing

C, NS = 128, 512


def _channels(cfg, m=4, diff=False):
    out = []
    for i in range(C):
        rng = np.random.default_rng(i)
        j = rng.integers(0, m, NS)
        pts = np.exp(2j * np.pi * j / m)
        if diff:
            pts = np.cumprod(pts)
        x = np.zeros(NS * cfg.sps, np.complex64)
        x[2::cfg.sps] = pts * np.exp(2j * np.pi * 1e-4 * cfg.sps
                                     * np.arange(NS))
        x += (0.01 * rng.standard_normal(x.size)).astype(np.complex64)
        out.append(x)
    return np.stack(out)  # (C, T)


def test_frontend_kernel_matches_jnp():
    sps, num_avg, s = 8, 20, 256
    rng = np.random.default_rng(0)
    cat = (rng.standard_normal(((s + num_avg - 1) * sps, C))
           + 1j * rng.standard_normal(((s + num_avg - 1) * sps, C))
           ).astype(np.complex64)
    sel_re, sel_im, idx = timing_frontend_tm(
        jnp.asarray(cat.real), jnp.asarray(cat.imag), sps=sps,
        num_avg=num_avg, s_tile=64, interpret=True)
    # jnp reference (channel-major)
    cm = cat.T.reshape(C, s + num_avg - 1, sps)
    e = timing.symbol_energy_rows(jnp.asarray(cm))
    w = timing.windowed_bin_sums_direct(e, num_avg)
    idx_ref, sel_ref = timing.select_decision_samples(jnp.asarray(cm)[:, :s],
                                                      w)
    np.testing.assert_array_equal(np.asarray(idx).T, np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(sel_re).T, np.asarray(sel_ref.real),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sel_im).T, np.asarray(sel_ref.imag),
                               atol=1e-5)


@pytest.mark.parametrize("m,diff", [(4, False), (2, False), (8, False),
                                    (4, True)])
def test_fused_matches_blockpsk(m, diff):
    cfg = DemodConfig(sps=8, num_avg=50, constellation_size=m, phase_avg=20,
                      differential=diff)
    xs = _channels(cfg, m=m, diff=diff)
    fn_ff = make_ff_demod_fn(cfg, channels=C)
    st_ff, out_ff = fn_ff(ff_init(cfg, (C,)), jnp.asarray(xs))
    fn_fu = make_fused_demod_fn(cfg, s_tile=128, interpret=True)
    st_fu, out_fu = fn_fu(fused_init(cfg, C),
                          jnp.asarray(xs.real.T), jnp.asarray(xs.imag.T))
    v1, v2 = np.asarray(out_ff.valid), np.asarray(out_fu.valid)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(np.asarray(out_fu.sample_index)[v2],
                                  np.asarray(out_ff.sample_index)[v1])
    np.testing.assert_allclose(np.asarray(out_fu.soft)[v2],
                               np.asarray(out_ff.soft)[v1], atol=2e-4)
    np.testing.assert_array_equal(np.asarray(out_fu.bits)[v2],
                                  np.asarray(out_ff.bits)[v1])
    np.testing.assert_allclose(np.asarray(out_fu.phase)[v2],
                               np.asarray(out_ff.phase)[v1], atol=1e-3)


def test_fused_multiblock_carry():
    cfg = DemodConfig(sps=8, num_avg=50, constellation_size=4, phase_avg=20)
    xs = _channels(cfg)
    fn_fu = make_fused_demod_fn(cfg, s_tile=128, interpret=True)
    st = fused_init(cfg, C)
    parts = []
    for blk in np.split(xs, 2, axis=1):
        st, out = fn_fu(st, jnp.asarray(blk.real.T), jnp.asarray(blk.imag.T))
        parts.append(out)
    soft = np.concatenate(
        [np.asarray(o.soft)[np.asarray(o.valid)].reshape(C, -1)
         for o in parts], axis=1)
    # one-shot
    st1, out1 = fn_fu(fused_init(cfg, C), jnp.asarray(xs.real.T),
                      jnp.asarray(xs.imag.T))
    soft1 = np.asarray(out1.soft)[np.asarray(out1.valid)].reshape(C, -1)
    np.testing.assert_allclose(soft, soft1, atol=2e-4)


def test_fused_steady_matches_flex():
    """assume_steady compiles out warm-up machinery; on a converged carry it
    must produce identical outputs."""
    cfg = DemodConfig(sps=8, num_avg=50, constellation_size=4, phase_avg=20)
    xs = _channels(cfg)
    fn = make_fused_demod_fn(cfg, s_tile=128, interpret=True)
    fn_steady = make_fused_demod_fn(cfg, s_tile=128, interpret=True,
                                    assume_steady=True)
    st = fused_init(cfg, C)
    a, b = np.split(xs, 2, axis=1)
    st, _ = fn(st, jnp.asarray(a.real.T), jnp.asarray(a.imag.T))  # converge
    st1, o1 = fn(st, jnp.asarray(b.real.T), jnp.asarray(b.imag.T))
    st2, o2 = fn_steady(st, jnp.asarray(b.real.T), jnp.asarray(b.imag.T))
    assert np.asarray(o1.valid).all()
    np.testing.assert_allclose(np.asarray(o2.soft), np.asarray(o1.soft),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(o2.bits), np.asarray(o1.bits))
    np.testing.assert_allclose(np.asarray(o2.phase), np.asarray(o1.phase),
                               atol=1e-5)
    for x1, x2 in zip(st1, st2):
        np.testing.assert_allclose(np.asarray(jnp.real(x1)),
                                   np.asarray(jnp.real(x2)), atol=1e-5)


def test_fused_guards():
    cfg = DemodConfig(sps=1, num_avg=10, constellation_size=4, phase_avg=5)
    with pytest.raises(ValueError, match="sps > 1"):
        make_fused_demod_fn(cfg)(fused_init(cfg, C),
                                 jnp.zeros((64, C)), jnp.zeros((64, C)))
    cfg2 = DemodConfig(sps=8, num_avg=10, constellation_size=4, phase_avg=5,
                       matched_filter="boxcar")
    with pytest.raises(ValueError, match="matched filter"):
        make_fused_demod_fn(cfg2)(fused_init(cfg2, C),
                                  jnp.zeros((80, C)), jnp.zeros((80, C)))