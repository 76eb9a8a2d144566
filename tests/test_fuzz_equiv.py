"""Property-based corner coverage: random configurations and block splits,
exact-scan vs feed-forward equivalence on noisy streams.

The directed tests cover the defaults; this sweep hunts shape/edge bugs
(odd sps, tiny windows, phase_avg ~ trend length, blocks barely above the
warm-up, ragged splits)."""

import numpy as np
import jax.numpy as jnp
import pytest

from psk_soft_tpu import DemodConfig, demod_init, make_demod_fn
from psk_soft_tpu.models.blockpsk import ff_init, make_ff_demod_fn
from psk_soft_tpu.testing.signals import gen_psk_channel

CASES = []
_rng = np.random.default_rng(20260817)
for _ in range(12):
    sps = int(_rng.integers(2, 13))
    CASES.append(dict(
        sps=sps,
        num_avg=int(_rng.integers(2, 40)),
        constellation_size=int(_rng.choice([2, 4, 8])),
        phase_avg=int(_rng.integers(1, 35)),
        differential=bool(_rng.integers(0, 2)),
        nsym=int(_rng.integers(80, 300)),
        splits=int(_rng.integers(1, 5)),
        snr=float(_rng.uniform(18, 30)),
        foff=float(_rng.uniform(-2e-4, 2e-4)),
    ))


@pytest.mark.parametrize("case", CASES,
                         ids=[f"sps{c['sps']}M{c['constellation_size']}"
                              f"A{c['num_avg']}P{c['phase_avg']}"
                              f"{'d' if c['differential'] else ''}-{i}"
                              for i, c in enumerate(CASES)])
def test_random_config_equivalence(case):
    cfg = DemodConfig(sps=case["sps"], num_avg=case["num_avg"],
                      constellation_size=case["constellation_size"],
                      phase_avg=case["phase_avg"],
                      differential=case["differential"])
    x, _ = gen_psk_channel(case["nsym"], sps=cfg.sps,
                           m=cfg.constellation_size,
                           differential=cfg.differential,
                           seed=case["nsym"], snr_db=case["snr"],
                           freq_offset=case["foff"], timing_offset=1)
    # Split into uneven symbol-aligned blocks.
    nblocks = case["splits"]
    cut_syms = np.linspace(0, case["nsym"], nblocks + 1).astype(int)
    blocks = [x[a * cfg.sps: b * cfg.sps]
              for a, b in zip(cut_syms[:-1], cut_syms[1:]) if b > a]

    fn_e = make_demod_fn(cfg)
    fn_f = make_ff_demod_fn(cfg)
    st_e, st_f = demod_init(cfg), ff_init(cfg)
    soft_e, soft_f, bits_e, bits_f = [], [], [], []
    for blk in blocks:
        st_e, oe = fn_e(st_e, jnp.asarray(blk))
        st_f, of = fn_f(st_f, jnp.asarray(blk))
        ve, vf = np.asarray(oe.valid), np.asarray(of.valid)
        np.testing.assert_array_equal(ve, vf)
        soft_e.append(np.asarray(oe.soft)[ve])
        soft_f.append(np.asarray(of.soft)[vf])
        bits_e.append(np.asarray(oe.bits)[ve])
        bits_f.append(np.asarray(of.bits)[vf])
    soft_e = np.concatenate(soft_e) if soft_e else np.zeros(0)
    soft_f = np.concatenate(soft_f) if soft_f else np.zeros(0)
    np.testing.assert_allclose(soft_f, soft_e, atol=5e-3,
                               err_msg=str(case))
    np.testing.assert_array_equal(np.concatenate(bits_f),
                                  np.concatenate(bits_e), err_msg=str(case))
