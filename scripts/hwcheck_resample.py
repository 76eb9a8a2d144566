"""Hardware check: ops/resample.py on the real TPU.

1) Parity: resample_block on the TPU vs the CPU backend (same inputs,
   per-channel fractional ratios) — gathers and tap-table lerps must agree
   to float32 tolerance.
2) Throughput: samples/s through the resampler at bank scale (1024
   channels), so the frontend's cost relative to the demod kernel is known.

Run: python scripts/hwcheck_resample.py
"""

import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def _cpu_oracle(payload_file, out_file):
    """Run the same resample_block on the CPU backend in a subprocess."""
    code = f"""
import numpy as np, sys
sys.path.insert(0, {str(Path(__file__).resolve().parents[1])!r})
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from psk_soft_tpu.ops.resample import kaiser_sinc_table, resample_block
d = np.load({payload_file!r})
tab = jnp.asarray(kaiser_sinc_table(128, 8, cutoff=float(d["cutoff"])))
y_re, y_im, _ = resample_block(jnp.asarray(d["x_re"]), jnp.asarray(d["x_im"]),
                               jnp.asarray(d["pos0"]), jnp.asarray(d["ratio"]),
                               tab, int(d["n_out"]))
np.savez({out_file!r}, y_re=np.asarray(y_re), y_im=np.asarray(y_im))
"""
    import os
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", code], env=env, timeout=600,
                       capture_output=True, text=True)
    if r.returncode:
        raise RuntimeError(r.stderr[-2000:])


def main():
    import jax
    import jax.numpy as jnp
    from psk_soft_tpu.ops.resample import kaiser_sinc_table, resample_block

    dev = jax.devices()[0]
    print("device:", dev.device_kind)

    # --- parity -----------------------------------------------------------
    rng = np.random.default_rng(0)
    W, C, n_out = 1280, 256, 1024
    x_re = rng.standard_normal((W, C)).astype(np.float32)
    x_im = rng.standard_normal((W, C)).astype(np.float32)
    ratio = rng.uniform(0.8, 1.2, C).astype(np.float32)
    pos0 = np.full(C, 3.0, np.float32)
    cutoff = 1.0 / float(ratio.max())
    tmp = Path("/tmp/hwcheck_resample")
    tmp.mkdir(exist_ok=True)
    np.savez(tmp / "payload.npz", x_re=x_re, x_im=x_im, pos0=pos0,
             ratio=ratio, n_out=n_out, cutoff=cutoff)
    _cpu_oracle(str(tmp / "payload.npz"), str(tmp / "cpu.npz"))
    want = np.load(tmp / "cpu.npz")

    tab = jnp.asarray(kaiser_sinc_table(128, 8, cutoff=cutoff))
    y_re, y_im, _ = resample_block(jnp.asarray(x_re), jnp.asarray(x_im),
                                   jnp.asarray(pos0), jnp.asarray(ratio),
                                   tab, n_out)
    err = max(float(np.abs(np.asarray(y_re) - want["y_re"]).max()),
              float(np.abs(np.asarray(y_im) - want["y_im"]).max()))
    ok = err < 2e-5
    print(json.dumps({"check": "tpu_vs_cpu_parity", "max_err": err,
                      "pass": bool(ok)}))

    # --- throughput at bank scale ----------------------------------------
    import functools
    C2, B = 1024, 4096
    W2 = int(np.ceil(B * 1.25)) + 24
    xr = jnp.asarray(rng.standard_normal((W2, C2)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((W2, C2)).astype(np.float32))
    r2 = jnp.asarray(rng.uniform(0.8, 1.2, C2).astype(np.float32))
    p2 = jnp.full((C2,), 3.0, jnp.float32)

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_k(xr, xi, p, k):
        def body(carry, _):
            yr, yi, pe = resample_block(xr, xi, carry, r2, tab, B)
            # thread a CHANGING carry (wrapped back in bounds) and checksum
            # the FULL output so no iteration can be hoisted or DCE'd
            nxt = pe - jnp.floor(pe) + 3.0
            return nxt, jnp.sum(yr) + jnp.sum(yi)
        _, s = jax.lax.scan(body, p, None, length=k)
        return jnp.sum(s)

    k = 50
    s = run_k(xr, xi, p2, k)
    float(s)                       # warm + force
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_k(xr, xi, p2, k))
        best = min(best, time.perf_counter() - t0)
    rate = C2 * B * k / best
    print(json.dumps({"check": "throughput", "channels": C2,
                      "out_samples_per_s": rate,
                      "gsps": rate / 1e9}))

    # --- gather form vs the zero-gather MXU (uniform-ratio) form ---------
    from psk_soft_tpu.ops.resample import (resample_block_uniform,
                                           uniform_poly_matrix)
    num, den = 73, 80                       # ratio 7.3/8
    Qc = B // den                           # ~same output rows as above
    T_u = Qc * num + 8
    xr_u = jnp.asarray(rng.standard_normal((T_u, C2)).astype(np.float32))
    xi_u = jnp.asarray(rng.standard_normal((T_u, C2)).astype(np.float32))
    S = jnp.asarray(uniform_poly_matrix(num, den, 8))

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_u(xr, xi, k):
        def body(carry, _):
            yr, yi = resample_block_uniform(xr + carry, xi, S, num, den)
            return carry + 1e-12, jnp.sum(yr) + jnp.sum(yi)
        _, s = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return jnp.sum(s)

    float(run_u(xr_u, xi_u, k))             # warm
    best_u = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_u(xr_u, xi_u, k))
        best_u = min(best_u, time.perf_counter() - t0)
    rate_u = C2 * Qc * den * k / best_u
    print(json.dumps({"check": "throughput_uniform_mxu", "channels": C2,
                      "gsps": rate_u / 1e9,
                      "vs_gather": rate_u / rate}))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
