"""Multi-device seam-invariance tests (SURVEY.md section 4 implication (c)):
sharded output must equal single-device output, on the virtual 8-device CPU
mesh.  Signals carry real frequency offset + noise so the timing argmax has
structure (on the reference's noise-free rectangular pulses the argmax is a
measure-zero FP tie and any comparison of sample_index would be meaningless).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psk_soft_tpu import DemodConfig
from psk_soft_tpu.models.blockpsk import ff_init, make_ff_demod_fn
from psk_soft_tpu.parallel.mesh import make_mesh, chan_time_sharding
from psk_soft_tpu.parallel.sharded import make_sharded_demod

C, NS = 8, 1600


def _signals(cfg, m=4):
    """Timing-decisive channels: energy concentrated on intra-symbol index 3
    (rectangular pulses carry no timing information, so the windowed argmax
    ties and any FP reordering -- shard-local vs block-local cumsums --
    legitimately picks a different, equally valid sample)."""
    out = []
    for i in range(C):
        rng = np.random.default_rng(i)
        j = rng.integers(0, m, NS)
        pts = np.exp(2j * np.pi * j / m)
        if cfg.differential:
            pts = np.cumprod(pts)
        x = np.zeros(NS * cfg.sps, np.complex64)
        t = np.arange(NS)
        x[3::cfg.sps] = pts * np.exp(2j * np.pi * 2e-4 * cfg.sps * t)
        x += (0.01 * rng.standard_normal(x.size)).astype(np.complex64)
        out.append(x)
    return np.stack(out)


def _reference_run(cfg, xs):
    fn = make_ff_demod_fn(cfg, channels=C)
    _, out = fn(ff_init(cfg, (C,)), jnp.asarray(xs))
    return out


@pytest.mark.parametrize("chan,time", [(8, 1), (1, 8), (2, 4), (4, 2)])
def test_sharded_matches_single_device(chan, time):
    cfg = DemodConfig(sps=8, num_avg=100, constellation_size=4, phase_avg=50)
    xs = _signals(cfg)
    out1 = _reference_run(cfg, xs)
    mesh = make_mesh(chan=chan, time=time)
    run = make_sharded_demod(cfg, mesh, NS)
    out2 = run(jax.device_put(jnp.asarray(xs), chan_time_sharding(mesh)))
    v1, v2 = np.asarray(out1.valid), np.asarray(out2.valid)
    assert v1.sum() == v2.sum() == C * (NS - cfg.num_avg + 1)
    np.testing.assert_allclose(np.asarray(out2.soft)[v2],
                               np.asarray(out1.soft)[v1], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out2.phase)[v2],
                               np.asarray(out1.phase)[v1], atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out2.bits)[v2],
                                  np.asarray(out1.bits)[v1])
    np.testing.assert_array_equal(np.asarray(out2.sample_index)[v2],
                                  np.asarray(out1.sample_index)[v1])


@pytest.mark.parametrize("m,diff", [(2, False), (8, False), (4, True)])
def test_sharded_modes(m, diff):
    cfg = DemodConfig(sps=8, num_avg=50, constellation_size=m, phase_avg=20,
                      differential=diff)
    xs = _signals(cfg, m=m)
    out1 = _reference_run(cfg, xs)
    mesh = make_mesh(chan=2, time=4)
    run = make_sharded_demod(cfg, mesh, NS)
    out2 = run(jax.device_put(jnp.asarray(xs), chan_time_sharding(mesh)))
    v1, v2 = np.asarray(out1.valid), np.asarray(out2.valid)
    np.testing.assert_allclose(np.asarray(out2.soft)[v2],
                               np.asarray(out1.soft)[v1], atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out2.bits)[v2],
                                  np.asarray(out1.bits)[v1])


def test_shard_size_guard():
    cfg = DemodConfig(sps=8, num_avg=100, constellation_size=4, phase_avg=50)
    mesh = make_mesh(chan=1, time=8)
    with pytest.raises(ValueError, match="symbols per time shard"):
        make_sharded_demod(cfg, mesh, 400)  # 50/shard < num_avg-1
