"""Fused high-throughput pipeline: Pallas timing frontend + FF symbol backend.

The flagship single-chip configuration for large channel counts: input is
kept **time-major** (T, C) -- channels on the TPU's 128-lane axis -- so the
sample-rate hot loop runs as one fused Pallas kernel that reads HBM once
(ops/pallas/frontend.py), and only symbol-rate (1/sps) data ever flows
through XLA ops afterwards.

Semantically identical to models/blockpsk (gated by tests); restricted to
sps > 1, matched_filter == "none", and channel counts that are multiples of
128 (pad otherwise).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import DemodConfig
from ..ops.pallas.frontend import timing_frontend_tm
from .blockpsk import SymbolBackendState, symbol_backend
from .psk import DemodOutputs


class FusedState(NamedTuple):
    """Carry for the fused time-major pipeline (C channels in lockstep)."""

    win_re: jnp.ndarray       # ((num_avg-1)*sps, C) float32
    win_im: jnp.ndarray       # ((num_avg-1)*sps, C) float32
    seen: jnp.ndarray         # () int32 -- all channels share the cadence
    phase_hist: jnp.ndarray   # (C, phase_avg-1) float32
    phase_count: jnp.ndarray  # (C,) int32
    last_phase: jnp.ndarray   # (C,) float32
    last_any: jnp.ndarray     # (C,) complex64


def fused_init(cfg: DemodConfig, channels: int) -> FusedState:
    from ..utils.transfer import complex_ones

    a1 = max(cfg.num_avg - 1, 0)
    return FusedState(
        win_re=jnp.zeros((a1 * cfg.sps, channels), jnp.float32),
        win_im=jnp.zeros((a1 * cfg.sps, channels), jnp.float32),
        seen=jnp.zeros((), jnp.int32),
        phase_hist=jnp.zeros((channels, max(cfg.phase_avg - 1, 0)), jnp.float32),
        phase_count=jnp.zeros((channels,), jnp.int32),
        last_phase=jnp.zeros((channels,), jnp.float32),
        last_any=complex_ones((channels,)),
    )


def demod_block_fused(cfg: DemodConfig, state: FusedState,
                      x_re: jnp.ndarray, x_im: jnp.ndarray, *,
                      s_tile: int = 256, interpret: bool = False,
                      assume_steady: bool = False):
    """Demodulate one time-major block.

    Args:
      x_re/x_im: (T, C) float32 planes, T = S * sps (planes rather than
        complex64 keep the axon host->device path and the Pallas kernel
        happy; combine with utils.transfer helpers on the way out).
    Returns (new_state, DemodOutputs) with (C, S)-shaped outputs.
    """
    if cfg.sps <= 1:
        raise ValueError("fused pipeline requires sps > 1")
    if cfg.matched_filter != "none":
        raise ValueError("fused pipeline does not fold the matched filter "
                         "yet; use models.blockpsk")
    sps, num_avg = cfg.sps, cfg.num_avg
    T, C = x_re.shape
    S = T // sps
    if T % sps:
        raise ValueError(f"block length {T} not a multiple of sps={sps}")

    cat_re = jnp.concatenate([state.win_re, x_re], axis=0)
    cat_im = jnp.concatenate([state.win_im, x_im], axis=0)
    sel_re, sel_im, idx = timing_frontend_tm(
        cat_re, cat_im, sps=sps, num_avg=num_avg, s_tile=s_tile,
        interpret=interpret)

    # Symbol rate from here on (1/sps of the data): channel-major.
    sel = jax.lax.complex(sel_re.T, sel_im.T)               # (C, S)
    sample_index = idx.T
    arange_s = jnp.arange(S, dtype=jnp.int32)
    if assume_steady:
        valid = jnp.ones((S,), bool)
        prev_exists = valid
    else:
        valid = (state.seen + 1 + arange_s) >= num_avg      # (S,)
        prev_exists = (state.seen + arange_s) >= num_avg

    bst = SymbolBackendState(state.phase_hist, state.phase_count,
                             state.last_phase, state.last_any)
    backend = jax.vmap(
        functools.partial(symbol_backend, cfg, assume_steady=assume_steady),
        in_axes=(0, 0, None, None))
    bst2, (soft, bits, phase_seq) = backend(bst, sel, valid, prev_exists)

    keep = (num_avg - 1) * sps
    new_state = FusedState(
        win_re=cat_re[cat_re.shape[0] - keep:] if keep else state.win_re,
        win_im=cat_im[cat_im.shape[0] - keep:] if keep else state.win_im,
        seen=jnp.minimum(state.seen + S, jnp.int32(num_avg)),
        phase_hist=bst2.phase_hist,
        phase_count=bst2.phase_count,
        last_phase=bst2.last_phase,
        last_any=bst2.last_any,
    )
    if assume_steady:
        outputs = DemodOutputs(
            soft=soft, bits=bits.astype(jnp.int8), phase=phase_seq,
            sample_index=sample_index,
            valid=jnp.ones(soft.shape, bool),
        )
    else:
        vmask = valid[None, :]
        outputs = DemodOutputs(
            soft=jnp.where(vmask, soft, 0),
            bits=jnp.where(vmask[..., None], bits, 0).astype(jnp.int8),
            phase=jnp.where(vmask, phase_seq, 0.0),
            sample_index=jnp.where(vmask, sample_index, 0),
            valid=jnp.broadcast_to(vmask, soft.shape),
        )
    return new_state, outputs


def make_fused_demod_fn(cfg: DemodConfig, *, s_tile: int = 256,
                        interpret: bool = False, assume_steady: bool = False):
    return jax.jit(functools.partial(demod_block_fused, cfg, s_tile=s_tile,
                                     interpret=interpret,
                                     assume_steady=assume_steady))
