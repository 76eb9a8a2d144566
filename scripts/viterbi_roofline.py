"""Viterbi kernel cycles-per-step measurement + roofline comparison.

Measures the fused Mosaic Viterbi (ACS + traceback one launch) at frame
shapes on the real chip, scan-amortized and checksum-forced (axon relay
rules), and reports cycles per trellis step per 128-lane group -- the
quantity the roofline model in docs/VITERBI_ROOFLINE.md predicts from
vreg-op counting.  Run: PYTHONPATH=/root/repo:/root/.axon_site python
scripts/viterbi_roofline.py
"""

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import numpy as np
import jax
import jax.numpy as jnp

from psk_soft_tpu.ops.fec import CODE_K7, conv_encode
from psk_soft_tpu.ops.pallas.viterbi_kernel import viterbi_decode_pallas

CLOCK_HZ = 940e6            # v5e TensorCore


def bench(rows, t_steps, iters=200, reps=3):
    """rows decode rows of t_steps trellis steps each; exact-decode gated."""
    code = CODE_K7
    n_info = t_steps - (code.k - 1)
    rng = np.random.default_rng(0)
    info = rng.integers(0, 2, (rows, n_info)).astype(np.int8)
    coded = np.asarray(conv_encode(code, jnp.asarray(info)), np.int8)
    llr = (1.0 - 2.0 * coded).astype(np.float32)     # noiseless LLRs

    llr_d = jnp.asarray(llr)

    import functools

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_k(x, k):
        def body(c, _):
            # hoist-proof: thread the carry into the input (memory rule).
            bits = viterbi_decode_pallas(code, x + c * 1e-12,
                                         interpret=False)
            return c * 0 + jnp.float32(0), bits.astype(jnp.int32).sum()
        _, s = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return jnp.sum(s)

    k = iters
    want = int(info.sum()) * k
    chk = int(run_k(llr_d, k))                 # warm + exactness gate
    assert chk == want, (chk, want)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        chk = float(run_k(llr_d, k))
        best = min(best, time.perf_counter() - t0)
    per_launch = best / k
    steps_total = rows * t_steps
    info_rate = rows * n_info * k / best
    # cycles per (step x 128-lane group), sequential grid cells
    groups = rows / 128
    cyc = per_launch * CLOCK_HZ / (t_steps * groups)
    return dict(rows=rows, t=t_steps, ms=per_launch * 1e3,
                minfobits=info_rate / 1e6, cyc_per_step_128=cyc)


def main():
    for rows in (2048, 8192):
        for t_steps in (128, 136, 256):
            r = bench(rows, t_steps)
            print({k: (round(v, 2) if isinstance(v, float) else v)
                   for k, v in r.items()}, flush=True)


if __name__ == "__main__":
    main()
