"""Mixed-mode multi-channel demod (BASELINE.json config 4): per-channel
constellation + differential flag in one compiled batch."""

import numpy as np
import jax.numpy as jnp

from psk_soft_tpu import DemodConfig
from psk_soft_tpu.models.blockpsk import ff_init, make_ff_demod_fn
from psk_soft_tpu.models.mixed import MixedParams, make_mixed_demod_fn, mixed_init
from psk_soft_tpu.testing.signals import gen_psk_channel

C = 64
NS = 600
CFG = DemodConfig(sps=8, num_avg=50, constellation_size=4, phase_avg=20)


def _mixed_bank(seed=0):
    rng = np.random.default_rng(seed)
    ms = rng.choice([2, 4, 8], C)
    diffs = rng.integers(0, 2, C).astype(bool)
    xs = []
    for c in range(C):
        x, _ = gen_psk_channel(NS, sps=8, m=int(ms[c]),
                               differential=bool(diffs[c]), seed=100 + c,
                               freq_offset=1e-4, snr_db=25.0,
                               timing_offset=0)
        xs.append(x)
    return ms, diffs, np.stack(xs)


def test_mixed_matches_per_mode_pipelines():
    """Each channel of the mixed batch must equal a homogeneous FF run with
    that channel's mode."""
    ms, diffs, xs = _mixed_bank()
    params = MixedParams.make(ms, diffs)
    fn = make_mixed_demod_fn(CFG)
    st, out = fn(params, mixed_init(CFG, C), jnp.asarray(xs))

    for c in [0, 1, 5, 17, 33, C - 1]:
        cfg_c = DemodConfig(sps=8, num_avg=50,
                            constellation_size=int(ms[c]), phase_avg=20,
                            differential=bool(diffs[c]))
        fn_c = make_ff_demod_fn(cfg_c)
        _, out_c = fn_c(ff_init(cfg_c), jnp.asarray(xs[c]))
        v = np.asarray(out_c.valid)
        np.testing.assert_array_equal(np.asarray(out.valid)[c], v)
        np.testing.assert_allclose(np.asarray(out.soft)[c][v],
                                   np.asarray(out_c.soft)[v], atol=1e-4)
        np.testing.assert_array_equal(np.asarray(out.bits)[c][v],
                                      np.asarray(out_c.bits)[v])
        np.testing.assert_allclose(np.asarray(out.phase)[c][v],
                                   np.asarray(out_c.phase)[v], atol=1e-3)


def test_mixed_bits_per_symbol():
    params = MixedParams.make([2, 4, 8], [False, False, False])
    np.testing.assert_array_equal(np.asarray(params.bits_per_symbol),
                                  [1, 2, 3])


def test_mixed_demodulates_correctly():
    """End-to-end symbol accuracy per channel of the mixed bank."""
    ms, diffs, xs = _mixed_bank(seed=3)
    params = MixedParams.make(ms, diffs)
    fn = make_mixed_demod_fn(CFG)
    st, out = fn(params, mixed_init(CFG, C), jnp.asarray(xs))
    soft = np.asarray(out.soft)
    valid = np.asarray(out.valid)
    for c in range(0, C, 7):
        s = soft[c][valid[c]][50:]
        m = int(ms[c])
        ang = np.angle(s)
        if m == 4:
            ang = ang - np.pi / 4
        err = np.abs(ang * m / (2 * np.pi)
                     - np.round(ang * m / (2 * np.pi)))
        # Error in slot units; 8-PSK carries 8x phase-noise amplification
        # through the M-th power so its p95 sits higher (decisions stay
        # correct below 0.5).
        assert np.percentile(err, 95) < (0.2 if m == 8 else 0.1), (c, m)
