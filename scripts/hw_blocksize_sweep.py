"""Hardware experiment: full-kernel throughput vs block size.

Degraded tunnel windows show a per-block-step floor (~17 ms/iter observed,
see README "measured ranges") that is NOT proportional to block size.  If
that floor is per-dispatch-iteration, doubling the symbols per block should
nearly double degraded-window throughput at the cost of latency.  This
sweep measures steady full-kernel rate at several block sizes so bench.py
can (if the data supports it) adaptively retry a larger block in slow
windows.

Run on the TPU: python scripts/hw_blocksize_sweep.py
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=1024)
    ap.add_argument("--sps", type=int, default=8)
    ap.add_argument("--symbols", type=int, nargs="+",
                    default=[256, 512, 1024, 2048])
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--no-debug-ports", action="store_true")
    args = ap.parse_args()

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_mod", Path(__file__).resolve().parents[1] / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from psk_soft_tpu import DemodConfig
    cfg = DemodConfig(sps=args.sps, num_avg=100, constellation_size=4,
                      phase_avg=50)
    C = args.channels
    results = []
    for S in args.symbols:
        T = S * args.sps
        rng = np.random.default_rng(0)
        sym = rng.integers(0, 4, size=(C, S))
        pts = np.exp(1j * (2 * np.pi * sym / 4
                           + 2 * np.pi * 1e-4 * np.arange(S)))
        x_np = np.repeat(pts, args.sps, axis=1).astype(np.complex64)
        x_np += (0.01 * rng.standard_normal(x_np.shape)).astype(np.complex64)
        # keep total samples per timed dispatch roughly constant across S
        it = max(10, args.iters * 512 // S)
        ns = argparse.Namespace(**{**vars(args), "iters": it})
        t0 = time.time()
        try:
            rate = bench.run_full(ns, cfg, C, T, x_np)
        except Exception as e:
            print(json.dumps({"symbols": S, "error": f"{type(e).__name__}: "
                              f"{str(e)[:100]}"}), flush=True)
            continue
        rec = {"symbols": S, "iters": it, "rate_gsps": rate / 1e9,
               "block_ms": C * T / rate * 1e3, "wall_s": time.time() - t0}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    if results:
        best = max(results, key=lambda r: r["rate_gsps"])
        print(json.dumps({"best_symbols": best["symbols"],
                          "best_rate_gsps": best["rate_gsps"]}), flush=True)


if __name__ == "__main__":
    main()
