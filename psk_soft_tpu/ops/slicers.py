"""Symbol -> bit slicers for BPSK / QPSK / 8-PSK.

Implements the *documented* sign-based Gray-ish mapping from the reference's
port description (``psk_soft.scd.xml:42-63``), emitting bits LSB-first like
the reference (``cpp/psk_soft.cpp:502-566``).

Deliberate deviation from the reference implementation: the reference QPSK
slicer (``cpp/psk_soft.cpp:523-524``) converts the float real/imag parts to
``bool`` (nonzero -> true) instead of testing their *sign*, so for any nonzero
input it emits all-zero bits.  The reference's own tests never assert on the
bits port, so the bug survives there; we implement the documented quadrant
mapping instead (sign tests), which is what ``psk_soft.scd.xml:47-51``
specifies.

All slicers are branch-free and vectorized over arbitrary leading axes; each
returns an ``(..., 3)`` int8 array padded with zeros past ``bits_per_symbol``
so that mixed-constellation channel batches have a uniform shape.
"""

from __future__ import annotations

import jax.numpy as jnp


def slice_bpsk(soft: jnp.ndarray) -> jnp.ndarray:
    """BPSK: phase 0 -> 0, pi -> 1 (cpp/psk_soft.cpp:503-513)."""
    b0 = (soft.real < 0).astype(jnp.int8)
    z = jnp.zeros_like(b0)
    return jnp.stack([b0, z, z], axis=-1)


def slice_qpsk(soft: jnp.ndarray) -> jnp.ndarray:
    """QPSK quadrants per psk_soft.scd.xml:47-51, LSB-first.

    Quadrant (+,+) -> 00, (-,+) -> 01, (-,-) -> 10, (+,-) -> 11 where the
    value is ``b0 + 2*b1`` and bits are emitted [b0, b1].
    """
    sr = (soft.real < 0).astype(jnp.int8)
    si = (soft.imag < 0).astype(jnp.int8)
    b0 = sr ^ si
    b1 = si
    return jnp.stack([b0, b1, jnp.zeros_like(b0)], axis=-1)


def slice_8psk(soft: jnp.ndarray) -> jnp.ndarray:
    """8-PSK: phase k*pi/4 -> binary k, LSB-first (cpp/psk_soft.cpp:528-564).

    theta in (-pi, pi] -> softsym = theta/pi*4 in (-4, 4]; wrap values below
    -0.5 up by +8; round to nearest (ties toward +inf, matching C ``round``
    for the positive range) and keep the 3 LSBs so that 8 aliases to 0.
    """
    theta = jnp.arctan2(soft.imag, soft.real)
    softsym = theta / jnp.pi * 4.0
    softsym = jnp.where(softsym < -0.5, softsym + 8.0, softsym)
    sym = jnp.floor(softsym + 0.5).astype(jnp.int32) & 7
    b0 = (sym & 1).astype(jnp.int8)
    b1 = ((sym >> 1) & 1).astype(jnp.int8)
    b2 = ((sym >> 2) & 1).astype(jnp.int8)
    return jnp.stack([b0, b1, b2], axis=-1)


def slice_bits(constellation_size: int, soft: jnp.ndarray) -> jnp.ndarray:
    """Dispatch on the (static) constellation size."""
    if constellation_size == 2:
        return slice_bpsk(soft)
    if constellation_size == 4:
        return slice_qpsk(soft)
    if constellation_size == 8:
        return slice_8psk(soft)
    raise ValueError(f"unsupported constellation size {constellation_size}")


def slice_bits_dynamic(m_size: jnp.ndarray, soft: jnp.ndarray) -> jnp.ndarray:
    """Slicer with a *traced* per-element constellation size in {2, 4, 8}.

    Used by the mixed-mode multi-channel path (BASELINE.json config 4), where
    each channel carries its own M.  ``m_size`` broadcasts against ``soft``.
    """
    m_size = jnp.broadcast_to(m_size, soft.shape)
    b2 = slice_bpsk(soft)
    b4 = slice_qpsk(soft)
    b8 = slice_8psk(soft)
    m = m_size[..., None]
    return jnp.where(m == 2, b2, jnp.where(m == 4, b4, b8))
