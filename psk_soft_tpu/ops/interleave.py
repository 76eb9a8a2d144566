"""Block bit interleaving between the FEC and the symbol mapper.

Extension beyond the reference, motivated by a *measured* effect: the
documented quadrant labeling (psk_soft.scd.xml:42-63) maps consecutive
code bits onto the same symbol, so one noisy symbol produces adjacent
trellis errors and the coded QPSK curve sits ~1-2 dB right of the
union bound (eval/coded.py).  A block interleaver separates consecutive
code bits by ``rows`` symbols, de-correlating the channel per trellis
step and recovering most of that gap.

Write by rows / read by columns: bit i of the (rows x cols) block moves
to position (i % cols) * rows + i // cols.  Both directions are static
permutations -- one gather on device, layout-only, so they compose with
any batch and cost nothing at the HBM level XLA can't fuse.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _perm(length: int, rows: int) -> np.ndarray:
    """interleaved[j] = flat[_perm[j]] (write-rows / read-columns)."""
    if rows < 1 or length % rows:
        raise ValueError(f"length {length} not a multiple of rows {rows}")
    return np.arange(length).reshape(rows, -1).T.reshape(-1)


def interleave(bits, rows: int) -> jnp.ndarray:
    """(..., L) -> (..., L) block-interleaved (rows x L/rows)."""
    b = jnp.asarray(bits)
    return b[..., _perm(b.shape[-1], rows)]


def deinterleave(bits, rows: int) -> jnp.ndarray:
    """Exact inverse of :func:`interleave` (same rows)."""
    b = jnp.asarray(bits)
    inv = np.argsort(_perm(b.shape[-1], rows))
    return b[..., inv]
