"""Hardware check: rolling-window kernel mode vs the window-carry path.

Correctness: a multi-block chain through demod_block_full_rolling must be
bit-identical to demod_block_full on the real chip.  Timing: K chained
steady steps with zero window-carry traffic (rolling) vs the standard
carry (fetch-forced).  Usage:
PYTHONPATH=/root/repo:$PYTHONPATH python scripts/hwcheck_rolling.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from psk_soft_tpu import DemodConfig
from psk_soft_tpu.models.blockpsk import ff_init, make_ff_demod_fn
from psk_soft_tpu.models.full import (demod_block_full,
                                      demod_block_full_rolling, full_from_ff,
                                      make_scanned_full_demod_fn)
from psk_soft_tpu.utils.transfer import to_device


def main():
    print("platform:", jax.devices()[0].platform, jax.devices()[0].device_kind)
    C, S, K = 1024, 512, 50
    cfg = DemodConfig(sps=8, num_avg=100, constellation_size=4, phase_avg=50)
    rng = np.random.default_rng(0)
    sym = rng.integers(0, 4, size=(C, 4 * S))
    pts = np.exp(1j * (2 * np.pi * sym / 4
                       + 2 * np.pi * 1e-4 * np.arange(4 * S)))
    sig = np.repeat(pts, cfg.sps, axis=1).astype(np.complex64)
    sig += (0.01 * rng.standard_normal(sig.shape)).astype(np.complex64)

    warm = sig[:, : 2 * S * cfg.sps]
    fn_ff = make_ff_demod_fn(cfg, channels=C)
    st_ff, _ = fn_ff(ff_init(cfg, (C,)), to_device(warm))
    st0 = full_from_ff(cfg, st_ff)

    T = S * cfg.sps
    blocks = [(jnp.asarray(np.ascontiguousarray(
                   sig[:, t: t + T].real.T)),
               jnp.asarray(np.ascontiguousarray(
                   sig[:, t: t + T].imag.T)))
              for t in range(2 * S * cfg.sps, 4 * S * cfg.sps, T)]

    # --- correctness: 2-block chains, legacy vs rolling ---
    st = st0
    legacy = []
    for xr, xi in blocks:
        st, o = demod_block_full(cfg, st, xr, xi, s_tile=256)
        legacy.append(jax.tree_util.tree_map(np.asarray, o))
    st2, o0 = demod_block_full(cfg, st0, *blocks[0], s_tile=256)
    planes, o1 = demod_block_full_rolling(cfg, st2.planes, *blocks[0],
                                          *blocks[1], s_tile=256)
    roll = [jax.tree_util.tree_map(np.asarray, o) for o in (o0, o1)]
    for a, b in zip(legacy, roll):
        for fa, fb in zip(a, b):
            np.testing.assert_array_equal(fa, fb)
    np.testing.assert_array_equal(np.asarray(st.planes), np.asarray(planes))
    print("PASS: rolling chain bit-exact vs window-carry on hardware")

    # --- timing: K chained steps, fetch-forced ---
    xr, xi = blocks[0]

    import functools

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_roll(planes, k):
        def body(p, _):
            p2, o = demod_block_full_rolling(cfg, p, xr, xi, xr, xi,
                                             s_tile=256)
            return p2, (jnp.sum(o.soft_re) + jnp.sum(o.phase))
        p, chks = jax.lax.scan(body, planes, None, length=k)
        return p, jnp.sum(chks)

    fn_leg = make_scanned_full_demod_fn(cfg, s_tile=256)
    xs_r = jnp.broadcast_to(xr, (K,) + xr.shape)
    xs_i = jnp.broadcast_to(xi, (K,) + xi.shape)

    def time_leg():
        t0 = time.perf_counter()
        _, o = fn_leg(st0, xs_r, xs_i)
        float(jnp.sum(o.soft_re[-1]) + jnp.sum(o.phase[-1]))
        return time.perf_counter() - t0

    def time_roll():
        t0 = time.perf_counter()
        _, chk = run_roll(st0.planes, K)
        float(chk)
        return time.perf_counter() - t0

    time_leg()
    time_roll()          # compile both
    best = {"legacy": float("inf"), "rolling": float("inf")}
    for rep in range(4):
        order = (("legacy", time_leg), ("rolling", time_roll))
        if rep % 2:
            order = order[::-1]
        for name, f in order:
            best[name] = min(best[name], f())
    for name, b in best.items():
        print(f"{name}: best {b * 1e3:.1f} ms for {K} blocks -> "
              f"{C * S * cfg.sps * K / b / 1e9:.2f} Gsps")


if __name__ == "__main__":
    main()
