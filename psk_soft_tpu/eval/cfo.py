"""Carrier-frequency-offset (CFO) estimation from the phase debug port.

The reference exposes the unwrapped M-th-power phase estimate as a debug
output (``phase_dataFloat_out``, psk_soft_base.cpp:44-45) but never
interprets it; operators eyeball the ramp.  The ramp's slope IS the carrier
offset: the LinearFit tracker (C1) follows ``M * theta_cfo`` per symbol, so

    cfo_hz = slope_per_symbol / (M * 2*pi * sps * xdelta)

This utility turns the phase port into a first-class per-channel CFO
metric.  The end-of-packet M*2pi re-wrap (cpp/psk_soft.cpp:592-603, and the
kernel's per-tile equivalent) makes the raw sequence jump by multiples of
M*2pi, so the slope is estimated from first differences wrapped into
(-M*pi, +M*pi] -- robust to any number of re-wraps inside the block.
"""

from __future__ import annotations

import numpy as np

from ..config import DemodConfig

TWO_PI = 2.0 * np.pi


def cfo_from_phase(phase, m, sps: int, xdelta: float = 1.0,
                   symbol_axis: int = -1) -> np.ndarray:
    """Per-channel CFO in Hz from a block of phase-port samples.

    Args:
      phase: unwrapped M-th-power phase estimates, any array with the
        symbol axis at ``symbol_axis`` (engine packets are (C, S); kernel
        planes are (S, C) -- pass symbol_axis=0 for those).
      m: constellation size -- scalar, or per-channel array broadcastable
        against the non-symbol axes (mixed banks).
      sps: samples per symbol (the input rate divider).
      xdelta: input sample spacing in seconds (SRI.xdelta); with the
        default 1.0 the result is cycles/sample instead of Hz.
    Returns:
      CFO estimate(s), shape = phase.shape without the symbol axis.
    """
    ph = np.asarray(phase, np.float64)
    if ph.shape[symbol_axis] < 2:
        raise ValueError("need at least 2 symbols of phase to estimate CFO")
    m_arr = np.asarray(m, np.float64)
    d = np.diff(ph, axis=symbol_axis)
    # Undo M*2pi re-wraps (a 2pi ambiguity is impossible here: the
    # tracker's step per symbol is << pi for any lockable offset).
    modulus = m_arr * TWO_PI
    mod_b = (np.expand_dims(modulus, symbol_axis) if modulus.ndim
             else modulus)                     # per-channel m broadcast
    d = d - mod_b * np.round(d / mod_b)
    slope = d.mean(axis=symbol_axis)           # rad of M*theta per symbol
    return slope / (m_arr * TWO_PI * sps * xdelta)


def cfo_from_packet(pkt, cfg: DemodConfig, in_xdelta: float | None = None,
                    m=None) -> np.ndarray:
    """CFO in Hz straight from a PORT_PHASE packet (engine output).

    The packet's own SRI carries the SYMBOL spacing (already rescaled by
    sps on propagation), so sps*xdelta_in == pkt.sri.xdelta and the caller
    needs nothing else; ``in_xdelta`` overrides when the packet SRI is a
    placeholder.  ``m`` (per-channel array) overrides cfg.constellation_size
    for mixed banks.
    """
    sym_dt = in_xdelta * cfg.sps if in_xdelta is not None else pkt.sri.xdelta
    mm = cfg.constellation_size if m is None else np.asarray(m)
    return cfo_from_phase(pkt.data, mm, sps=1, xdelta=sym_dt)


def acquire_cfo(x, m, nfft: int | None = None, xdelta: float = 1.0
                ) -> np.ndarray:
    """Coarse per-channel CFO acquisition from the M-th-power spectrum.

    Raising PSK to the M removes the modulation, leaving a tone at
    ``M * cfo``; the FFT peak locates it.  Resolution is 1/(M*nfft)
    cycles/sample -- plenty to pull the offset into the phase tracker's
    lock range, after which ``cfo_from_phase`` refines from the phase
    port.  Unambiguous range: |cfo| < 1/(2*M) cycles/sample (the M-th
    power aliases beyond that).

    Args:
      x: complex baseband, (C, T) or (T,) host array.
      m: constellation size (scalar or per-channel array).
    Returns:
      CFO per channel in Hz (cycles/sample when xdelta=1), shape (C,) or
      scalar for 1-D input.
    """
    arr = np.asarray(x)
    one = arr.ndim == 1
    x2 = arr[None, :] if one else arr
    m_arr = np.broadcast_to(np.asarray(m, np.float64), (x2.shape[0],))
    if nfft is None:
        nfft = 1 << int(np.ceil(np.log2(max(x2.shape[1], 2))))
    out = np.empty(x2.shape[0], np.float64)
    for mv in np.unique(m_arr):
        rows = m_arr == mv
        X = np.fft.fft(x2[rows] ** int(mv), n=nfft, axis=1)
        k = np.argmax(np.abs(X), axis=1)
        f = ((k / nfft + 0.5) % 1.0) - 0.5        # wrap to [-0.5, 0.5)
        out[rows] = f / mv / xdelta
    return out[0] if one else out
