"""Carrier-phase recovery primitives: M-th-power phase and unwrapping.

TPU-native recast of C3 in the reference (``cpp/psk_soft.cpp:471-500,
592-603``): per selected symbol, ``thisPhase = arg(sample^M)`` removes the
PSK modulation; the phase is unwrapped against the running estimate
(``numWraps = round((phaseEstimate - thisPhase)/2pi)``), fed to the sliding
linear fit, and the correction applied is ``-phaseEstimate/M`` (+pi/4
constellation rotation for QPSK only).  At packet end the whole estimator
history is re-wrapped about ``M*2pi`` (NOT 2pi -- the estimate is of the
M-th-power phase) to keep it bounded (``cpp/psk_soft.cpp:592-603``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def mth_power_phase(sample: jnp.ndarray, m: int) -> jnp.ndarray:
    """arg(sample**m) for power-of-two m (2..32) via repeated squaring.

    Matches ``arg(pow(sample, numSyms))`` at cpp/psk_soft.cpp:474 but avoids
    the transcendental complex pow: log2(m) squarings, then one atan2.
    """
    if m < 2 or (m & (m - 1)) != 0:
        raise ValueError(f"unsupported constellation size {m}")
    s = sample
    k = m
    while k > 1:
        s = s * s
        k >>= 1
    return jnp.arctan2(s.imag, s.real).astype(jnp.float32)


def mth_power_phase_dynamic(sample: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """M-th-power phase with traced per-element m in {2, 4, 8, 16, 32}."""
    s2 = sample * sample
    s4 = s2 * s2
    s8 = s4 * s4
    s16 = s8 * s8
    s32 = s16 * s16
    s = jnp.where(m == 2, s2,
                  jnp.where(m == 4, s4,
                            jnp.where(m == 8, s8,
                                      jnp.where(m == 16, s16, s32))))
    return jnp.arctan2(s.imag, s.real).astype(jnp.float32)


def unwrap_step(prev_estimate: jnp.ndarray, raw: jnp.ndarray) -> jnp.ndarray:
    """One reference unwrap: shift raw by whole turns toward the estimate.

    cpp/psk_soft.cpp:477-478.
    """
    wraps = jnp.round((prev_estimate - raw) / TWO_PI)
    return raw + wraps * TWO_PI


def block_unwrap(raw: jnp.ndarray, prev: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Feed-forward unwrap of a block of raw phases against a carried value.

    Classic prefix unwrap: each element is shifted by a whole number of turns
    so that successive differences lie in (-pi, pi]; the first element is
    unwrapped against ``prev`` (the last unwrapped phase before the block).
    Cumulative wrap counts are a prefix sum, i.e. fully parallel -- this is
    the feed-forward equivalent of the reference's sequential
    unwrap-against-the-estimate.  The two differ only when the linear-fit
    estimate and the previous sample disagree by more than ~pi, i.e. under
    phase dynamics faster than pi/symbol where any M-th-power tracker has
    already lost lock; the equivalence is gated by tests on the golden
    vectors (SURVEY.md section 7 stage 4).

    Args:
      raw: raw principal-value phases.
      prev: carried last unwrapped phase; broadcastable to raw with the
        scanned axis removed.
    """
    raw = jnp.moveaxis(raw, axis, -1)
    first = jnp.expand_dims(prev, -1)
    d = jnp.diff(jnp.concatenate([first, raw], axis=-1), axis=-1)
    adj = jnp.cumsum(jnp.round(d / TWO_PI), axis=-1)
    out = raw - adj * TWO_PI
    return jnp.moveaxis(out, -1, axis)


def wrap_to_pi(x: jnp.ndarray) -> jnp.ndarray:
    """Map angles to (-pi, pi]."""
    return x - TWO_PI * jnp.round(x / TWO_PI)


# Trend window for the robust unwrap.  sigma of the squared/4th/8th-power
# phase noise shrinks ~1/sqrt(K); K=9 keeps the false-wrap probability
# negligible down to the tracker's own lock threshold while adding only a
# half-window of trend lag (irrelevant: the unwrap tolerates +-pi of lag).
UNWRAP_TREND_LEN = 9


# Trend decimation: one trend reference per D symbols.  The unwrap stays
# correct as long as the phase moves < pi across a group of D symbols --
# still far beyond any M-th-power tracker's lock range -- while the prefix
# sum, the trend conv, and two of the three atan2 passes shrink by D.
UNWRAP_TREND_STRIDE = 4


def causal_complex_ma(phases: jnp.ndarray, k: int, stride: int = 1,
                      pad_left: int | None = None) -> jnp.ndarray:
    """Causal moving average of exp(i*phase) over the last k entries,
    optionally strided (one output per ``stride`` inputs, anchored at each
    group's last element).

    phases: (..., T) with T divisible by stride.  Head entries average over
    what is available.  Returns the trend *angle* (..., T // stride).
    """
    c_re = jnp.cos(phases)
    c_im = jnp.sin(phases)
    ones = jnp.ones((1, 1, k), c_re.dtype)
    lead = phases.shape[:-1]
    t = phases.shape[-1]
    lpad = k - stride if pad_left is None else pad_left

    def conv(v):
        v2 = v.reshape(-1, 1, t)
        out = jax.lax.conv_general_dilated(
            v2, ones, window_strides=(stride,), padding=[(lpad, 0)],
            dimension_numbers=("NCH", "OIH", "NCH"))
        return out.reshape(lead + (-1,))

    return jnp.arctan2(conv(c_im), conv(c_re))


def robust_block_unwrap(raw: jnp.ndarray, axis: int = -1,
                        k: int = UNWRAP_TREND_LEN,
                        stride: int = UNWRAP_TREND_STRIDE) -> jnp.ndarray:
    """Feed-forward unwrap robust to per-symbol phase noise.

    A strict previous-sample prefix unwrap takes a false +-2pi wrap whenever
    two *consecutive* raw phases differ by more than pi -- common for M-th
    power phases at low Es/N0 (sigma ~ M * noise).  The reference avoids this
    by unwrapping each raw phase against its *smoothed estimate*
    (cpp/psk_soft.cpp:477-481).  The feed-forward equivalent: average
    exp(i*raw) over a short causal window, unwrap the low-noise trend angles
    (prefix sum), and re-attach each raw phase as a (-pi, pi] residual about
    its trend:

        u[t] = unwrap(trend)[g(t)] + wrap_to_pi(raw[t] - trend[g(t)])

    where g(t) is t's trend group (one trend value per ``stride`` symbols).
    u[t] === raw[t] (mod 2pi) exactly, like any unwrap.
    """
    raw = jnp.moveaxis(raw, axis, -1)
    t = raw.shape[-1]
    pad = (-t) % stride
    rawp = jnp.concatenate(
        [jnp.broadcast_to(raw[..., :1], raw.shape[:-1] + (pad,)), raw],
        axis=-1) if pad else raw
    ang_dec = causal_complex_ma(rawp, k, stride=stride)   # (..., G)
    unwrapped_dec = block_unwrap(ang_dec, ang_dec[..., 0], axis=-1)
    g = unwrapped_dec.shape[-1]
    full = lambda v: jnp.broadcast_to(
        v[..., :, None], v.shape + (stride,)).reshape(v.shape[:-1]
                                                      + (g * stride,))
    u = full(unwrapped_dec) + wrap_to_pi(rawp - full(ang_dec))
    u = u[..., pad:]
    return jnp.moveaxis(u, -1, axis)


def rewrap_offset(estimate: jnp.ndarray, m: int) -> jnp.ndarray:
    """End-of-block re-wrap offset about M*2pi (cpp/psk_soft.cpp:592-603).

    Returns the constant to subtract from the estimator history (0 if the
    estimate is already within +-M*2pi).  Subtracting a constant from the
    window shifts the fit by that constant (the reference implements this as
    ``LinearFit::subtractConst``, cpp/psk_soft.cpp:126-133), and the applied
    correction ``-estimate/M`` changes by a multiple of 2pi, so soft symbols
    are unaffected.
    """
    wrap_value = TWO_PI * m
    wraps = jnp.round(estimate / wrap_value)
    return jnp.where(jnp.abs(estimate) > wrap_value, wraps * wrap_value, 0.0)
