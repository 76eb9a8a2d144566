"""Hardware check: int16-ingest fused kernel vs f32 on the real TPU.

Runs the same dequantized signal through both kernel dtypes and compares
(axon-safe: planes only, no complex uploads).  Usage: python scripts/hwcheck_i16.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from psk_soft_tpu import DemodConfig
from psk_soft_tpu.models.blockpsk import ff_init, make_ff_demod_fn
from psk_soft_tpu.models.full import (full_from_ff, make_full_demod_fn,
                                      quantize_full_state)
from psk_soft_tpu.utils.transfer import to_device


def main():
    print("platform:", jax.devices()[0].platform, jax.devices()[0].device_kind)
    C, S = 128, 256
    cfg = DemodConfig(sps=8, num_avg=50, constellation_size=4, phase_avg=20)
    xs = []
    for i in range(C):
        r = np.random.default_rng(i)
        j = r.integers(0, 4, S + 256)
        x = np.zeros((S + 256) * 8, np.complex64)
        x[3::8] = np.exp(2j * np.pi * j / 4) * np.exp(
            2j * np.pi * 1e-4 * 8 * np.arange(S + 256))
        x += (0.01 * r.standard_normal(x.size)).astype(np.complex64)
        xs.append(x)
    xs = np.stack(xs)
    scale = float(max(np.abs(xs.real).max(), np.abs(xs.imag).max())) / 32000.0
    xi_re = np.round(xs.real / scale).astype(np.int16)
    xi_im = np.round(xs.imag / scale).astype(np.int16)
    xq = (xi_re.astype(np.float32) * scale
          + 1j * xi_im.astype(np.float32) * scale).astype(np.complex64)

    warm_t = 256 * cfg.sps
    fn_ff = make_ff_demod_fn(cfg, channels=C)
    st_ff, _ = fn_ff(ff_init(cfg, (C,)), to_device(xq[:, :warm_t]))
    st = full_from_ff(cfg, st_ff)

    fn32 = make_full_demod_fn(cfg, s_tile=128)
    _, out32 = fn32(st, jnp.asarray(np.ascontiguousarray(
        xq[:, warm_t:].real.T)), jnp.asarray(np.ascontiguousarray(
            xq[:, warm_t:].imag.T)))
    sr32 = np.asarray(out32.soft_re)
    print("f32 kernel ran:", sr32.shape)

    st16 = quantize_full_state(st, scale)
    fn16 = make_full_demod_fn(cfg, s_tile=128, in_scale=scale)
    _, out16 = fn16(st16, jnp.asarray(np.ascontiguousarray(
        xi_re[:, warm_t:].T)), jnp.asarray(np.ascontiguousarray(
            xi_im[:, warm_t:].T)))
    sr16 = np.asarray(out16.soft_re)
    print("i16 kernel ran:", sr16.shape)

    d_soft = max(np.abs(sr16 - sr32).max(),
                 np.abs(np.asarray(out16.soft_im)
                        - np.asarray(out32.soft_im)).max())
    d_idx = np.abs(np.asarray(out16.sample_index)
                   - np.asarray(out32.sample_index)).max()
    bits_eq = bool((np.asarray(out16.bits_packed)
                    == np.asarray(out32.bits_packed)).all())
    print(f"max|soft16-soft32|={d_soft:.3e} idx_diff={d_idx} "
          f"bits_equal={bits_eq}")
    ok = d_soft < 1e-4 and d_idx == 0 and bits_eq
    print("HWCHECK_I16", "PASS" if ok else "FAIL")


if __name__ == "__main__":
    main()
