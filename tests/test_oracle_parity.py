"""Direct parity against an independent numpy oracle of the reference's
sequential algorithm (testing/oracle.py): the strongest equivalence evidence
short of running the C++ binary."""

import numpy as np
import jax.numpy as jnp
import pytest

from psk_soft_tpu import DemodConfig, demod_init, make_demod_fn
from psk_soft_tpu.models.blockpsk import ff_init, make_ff_demod_fn
from psk_soft_tpu.testing.oracle import demod_reference
from psk_soft_tpu.testing.signals import gen_psk


def _decisive_signal(nsym, sps, m, peak, seed, diff=False, foff=0.0):
    rng = np.random.default_rng(seed)
    j = rng.integers(0, m, nsym)
    pts = np.exp(2j * np.pi * j / m)
    if diff:
        pts = np.cumprod(pts)
    x = np.zeros(nsym * sps, np.complex64)
    x[peak::sps] = pts * np.exp(2j * np.pi * foff * sps * np.arange(nsym))
    x += (0.02 * rng.standard_normal(x.size)).astype(np.complex64)
    return x


@pytest.mark.parametrize("m,diff,foff", [(2, False, 0.0), (4, False, 1e-4),
                                         (8, False, 0.0), (4, True, 0.0)])
def test_exact_pipeline_matches_oracle(m, diff, foff):
    sps, num_avg, phase_avg, nsym = 8, 30, 15, 300
    x = _decisive_signal(nsym, sps, m, peak=5, seed=m, diff=diff, foff=foff)
    ref = demod_reference(x, sps, num_avg, m, phase_avg, differential=diff)

    cfg = DemodConfig(sps=sps, num_avg=num_avg, constellation_size=m,
                      phase_avg=phase_avg, differential=diff)
    st, out = make_demod_fn(cfg)(demod_init(cfg), jnp.asarray(x))
    v = np.asarray(out.valid)
    soft = np.asarray(out.soft)[v]
    phase = np.asarray(out.phase)[v]
    idx = np.asarray(out.sample_index)[v]

    n = min(soft.size, ref["soft"].size)
    assert n == nsym - (num_avg - 1)
    np.testing.assert_array_equal(idx[:n], ref["sample_index"][:n])
    np.testing.assert_allclose(phase[:n], ref["phase"][:n], atol=2e-3)
    np.testing.assert_allclose(soft[:n], ref["soft"][:n], atol=2e-3)


def test_ff_pipeline_matches_oracle_blocked():
    """Feed-forward pipeline, fed block-by-block, against the oracle."""
    sps, num_avg, phase_avg, nsym, m = 8, 25, 10, 250, 4
    x = _decisive_signal(nsym, sps, m, peak=3, seed=7, foff=5e-5)
    ref = demod_reference(x, sps, num_avg, m, phase_avg)
    cfg = DemodConfig(sps=sps, num_avg=num_avg, constellation_size=m,
                      phase_avg=phase_avg)
    fn = make_ff_demod_fn(cfg)
    st = ff_init(cfg)
    soft, idx = [], []
    for blk in np.split(x, 5):
        st, o = fn(st, jnp.asarray(blk))
        v = np.asarray(o.valid)
        soft.append(np.asarray(o.soft)[v])
        idx.append(np.asarray(o.sample_index)[v])
    soft = np.concatenate(soft)
    idx = np.concatenate(idx)
    n = min(soft.size, ref["soft"].size)
    np.testing.assert_array_equal(idx[:n], ref["sample_index"][:n])
    np.testing.assert_allclose(soft[:n], ref["soft"][:n], atol=5e-3)


_FUZZ = []
_rng = np.random.default_rng(42)
for _ in range(6):
    _FUZZ.append(dict(
        sps=int(_rng.integers(3, 12)),
        num_avg=int(_rng.integers(5, 40)),
        m=int(_rng.choice([2, 4, 8])),
        phase_avg=int(_rng.integers(2, 30)),
        diff=bool(_rng.integers(0, 2)),
        nsym=int(_rng.integers(120, 280)),
    ))


@pytest.mark.parametrize("case", _FUZZ,
                         ids=[f"sps{c['sps']}A{c['num_avg']}M{c['m']}"
                              f"P{c['phase_avg']}{'d' if c['diff'] else ''}"
                              for c in _FUZZ])
def test_oracle_fuzz(case):
    """Randomized configs against the sequential oracle."""
    sps = case["sps"]
    x = _decisive_signal(case["nsym"], sps, case["m"],
                         peak=sps // 2, seed=case["nsym"], diff=case["diff"])
    ref = demod_reference(x, sps, case["num_avg"], case["m"],
                          case["phase_avg"], differential=case["diff"])
    cfg = DemodConfig(sps=sps, num_avg=case["num_avg"],
                      constellation_size=case["m"],
                      phase_avg=case["phase_avg"],
                      differential=case["diff"])
    st, out = make_demod_fn(cfg)(demod_init(cfg), jnp.asarray(x))
    v = np.asarray(out.valid)
    soft = np.asarray(out.soft)[v]
    idx = np.asarray(out.sample_index)[v]
    n = min(soft.size, ref["soft"].size)
    np.testing.assert_array_equal(idx[:n], ref["sample_index"][:n],
                                  err_msg=str(case))
    np.testing.assert_allclose(soft[:n], ref["soft"][:n], atol=5e-3,
                               err_msg=str(case))


def test_oracle_on_golden_vectors():
    """The oracle itself reproduces the reference test assertion on the
    golden fixture (sanity that the oracle is a faithful spec)."""
    x, syms = gen_psk(500, 8, 4)
    ref = demod_reference(x, 8, 100, 4, 50)
    exp = syms[: ref["soft"].size] * np.exp(1j * np.pi / 4)
    thetas = [0, np.pi / 2, np.pi, 3 * np.pi / 2]
    err = min(np.abs(ref["soft"][1:] * np.exp(1j * t) - exp[1:]).max()
              for t in thetas)
    assert err < 1e-3
