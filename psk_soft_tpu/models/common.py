"""Shared pipeline stages used by both the exact-scan and the feed-forward
block-parallel demodulators."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import DemodConfig
from ..ops import matched_filter, timing


def maybe_matched_filter(cfg: DemodConfig, state, x: jnp.ndarray):
    """Apply the configured matched filter (streaming overlap-save).

    Returns (filtered_x, new_mf_tail).  Identity when disabled (reference
    parity: the reference has no front-end filter).
    """
    if cfg.matched_filter == "none":
        return x, state.mf_tail
    taps = jnp.asarray(matched_filter.filter_taps(cfg))
    return matched_filter.streaming_filter(x, state.mf_tail, taps)


def timing_frontend(cfg: DemodConfig, win_samples, win_energy, seen, xs):
    """C2 timing recovery over one block of symbol rows.

    Args:
      win_samples/win_energy: (num_avg-1, sps) carry rows.
      seen: () int32 saturating symbol count.
      xs: (S, sps) block rows.

    Returns dict with:
      sel (S,) decision samples, sample_index (S,) int32, valid (S,) bool,
      prev_exists (S,) bool (stream symbol o-1 exists),
      new_win_samples/new_win_energy, seen2.
    """
    S = xs.shape[0]
    num_avg = cfg.num_avg
    if cfg.sps > 1:
        e = timing.symbol_energy_rows(xs)
        e_cat = jnp.concatenate([win_energy, e], axis=0)
        s_cat = jnp.concatenate([win_samples, xs], axis=0)
        w = timing.windowed_bin_sums(e_cat, num_avg)
        if cfg.timing_interp:
            sample_index, sel = timing.select_decision_samples_interp(
                s_cat.reshape(-1), w, cfg.sps)
        else:
            sample_index, sel = timing.select_decision_samples(s_cat[:S], w)
        valid = (seen + 1 + jnp.arange(S, dtype=jnp.int32)) >= num_avg
        prev_exists = (seen + jnp.arange(S, dtype=jnp.int32)) >= num_avg
        new_win_s, new_win_e = s_cat[S:], e_cat[S:]
    else:
        # sps == 1: every sample is a symbol (see models/psk.py note on the
        # reference's stall in this mode, cpp/psk_soft.cpp:445,457).
        sel = xs[:, 0]
        sample_index = jnp.zeros((S,), jnp.int32)
        valid = jnp.ones((S,), bool)
        prev_exists = (seen + jnp.arange(S, dtype=jnp.int32)) >= 1
        new_win_s, new_win_e = win_samples, win_energy
    seen2 = jnp.minimum(seen + S, jnp.int32(num_avg))
    return dict(sel=sel, sample_index=sample_index, valid=valid,
                prev_exists=prev_exists, new_win_samples=new_win_s,
                new_win_energy=new_win_e, seen2=seen2)


def correct_and_slice(cfg: DemodConfig, sel, prev_exists, last_any, phase_seq):
    """C5/C6: differential decode or derotation, then bit slicing.

    Returns (soft, bits, new_last_any).
    """
    from ..ops import slicers

    m = cfg.constellation_size
    shifted = jnp.concatenate([last_any[None], sel[:-1]])
    prev = jnp.where(prev_exists, shifted, jnp.complex64(1.0 + 0.0j))
    if cfg.differential:
        base = sel / prev
        correction = jnp.zeros_like(phase_seq)
    else:
        base = sel
        correction = -phase_seq / m
    if m == 4:
        # +pi/4 so decisions sit at (+-1 +- j)/sqrt(2) (cpp/psk_soft.cpp:496-498).
        correction = correction + jnp.float32(jnp.pi / 4)
    phasor = jax.lax.complex(jnp.cos(correction), jnp.sin(correction))
    soft = (base * phasor).astype(jnp.complex64)
    bits = slicers.slice_bits(m, soft)
    return soft, bits, sel[-1]
