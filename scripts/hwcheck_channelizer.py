"""Hardware check + bench: polyphase DFT channelizer on the real TPU.

1. Parity: channelize a random wideband block on the device and compare
   against the same computation on numpy float64 (the op's own reshape +
   FMA + FFT, independent of JAX) -- catches TPU FFT / layout surprises.
2. Throughput: steady-state channelize rate at the production shape
   (C=1024 channels, the demod bench's bank width), fetch-forced timing
   (a host fetch of a checksum data-dependent on every output closes each
   timed region -- axon defers execution until a value fetch).

Axon-safe: complex is created on device (utils.transfer.to_device), only
float planes are fetched.  Usage: python scripts/hwcheck_channelizer.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from psk_soft_tpu.ops.channelizer import (channelize_block, channelizer_init,
                                          prototype_taps)
from psk_soft_tpu.utils.transfer import to_device


def _host_reference(taps, carry_rows, x, C, K):
    """Same WOLA computation in numpy float64."""
    z = np.concatenate([carry_rows, x.reshape(-1, C)], axis=0)
    B = z.shape[0] - (K - 1)
    hp = taps.astype(np.float64).reshape(K, C)
    v = np.zeros((B, C), np.complex128)
    for k in range(K):
        v += hp[k] * z[k:k + B]
    return np.fft.fft(v, axis=-1)


def main():
    dev = jax.devices()[0]
    print("platform:", dev.platform, dev.device_kind)

    # --- parity ----------------------------------------------------------
    C, K, B = 256, 8, 512
    taps = prototype_taps(C, K)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(B * C)
         + 1j * rng.standard_normal(B * C)).astype(np.complex64)
    carry, y = channelize_block(jnp.asarray(taps), channelizer_init(C, K),
                                to_device(x))
    got = np.asarray(y.real) + 1j * np.asarray(y.imag)
    ref = _host_reference(taps, np.zeros((K - 1, C), np.complex128), x, C, K)
    err = np.abs(got - ref).max()
    scale = np.abs(ref).max()
    print(f"parity: max abs err {err:.3e} (signal scale {scale:.2f})")
    ok = err < 1e-3 * scale
    print("PARITY", "PASS" if ok else "FAIL")

    # --- throughput ------------------------------------------------------
    C, K, B = 1024, 8, 4096
    taps_d = jnp.asarray(prototype_taps(C, K))
    x = (rng.standard_normal(B * C)
         + 1j * rng.standard_normal(B * C)).astype(np.complex64)
    x_d = to_device(x)

    import functools

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(carry, x, iters):
        def body(c, _):
            c2, y = channelize_block(taps_d, c, x)
            return c2, jnp.sum(y.real) + jnp.sum(y.imag)
        c, chks = jax.lax.scan(body, carry, None, length=iters)
        return c, jnp.sum(chks)

    iters = 50
    carry = channelizer_init(C, K)
    carry, _ = run(carry, x_d, 2)             # compile + warm
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        carry, chk = run(carry, x_d, iters)
        float(chk)                             # fetch-forced completion
        best = min(best, time.perf_counter() - t0)
    rate = B * C * iters / best
    print(f"channelize throughput C={C} K={K}: {rate / 1e9:.2f} Gsamples/s "
          f"({best / iters * 1e6:.0f} us / {B * C}-sample block)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
