"""Race/NaN defense in test mode (SURVEY.md section 5): pure-functional
kernels make device data races structurally impossible; here we assert the
pipelines are clean under jax debug_nans (any hidden NaN would raise) and
that the profiler hooks work."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from psk_soft_tpu import DemodConfig
from psk_soft_tpu.models.blockpsk import ff_init, make_ff_demod_fn
from psk_soft_tpu.testing.signals import gen_psk_channel
from psk_soft_tpu.utils.profiling import StepTimer, annotate


def test_pipeline_clean_under_debug_nans():
    cfg = DemodConfig(sps=8, num_avg=30, constellation_size=4, phase_avg=10)
    x, _ = gen_psk_channel(200, sps=8, m=4, seed=0, snr_db=20)
    jax.config.update("jax_debug_nans", True)
    try:
        fn = make_ff_demod_fn(cfg)
        st, out = fn(ff_init(cfg), jnp.asarray(x))
        assert np.isfinite(np.asarray(out.phase)).all()
    finally:
        jax.config.update("jax_debug_nans", False)


def test_step_timer_and_annotation():
    t = StepTimer()
    with annotate("demod-block"):
        with t.measure():
            sum(range(1000))
    s = t.summary()
    assert s["count"] == 1 and s["ewma_s"] > 0


def test_profiler_trace_writes(tmp_path):
    from psk_soft_tpu.utils.profiling import trace

    logdir = os.path.join(tmp_path, "trace")
    with trace(logdir):
        jnp.arange(16).sum().block_until_ready()
    assert os.path.isdir(logdir)
    assert any(os.scandir(logdir))
