"""Single-kernel steady-state pipeline built on ops/pallas/demod_kernel.

Usage pattern: run the flexible pipeline (models/blockpsk or models/fused)
through warm-up, convert the converged carry with :func:`full_from_ff`, then
stream blocks through :func:`demod_block_full` -- the whole demod is one
Pallas kernel and HBM traffic drops to the input read + symbol-rate outputs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DemodConfig
from ..ops.pallas import demod_kernel
from ..ops.phase import UNWRAP_TREND_LEN
from .psk import DemodOutputs


class FullState(NamedTuple):
    win_re: jnp.ndarray   # ((num_avg-1)*sps, C) float32
    win_im: jnp.ndarray   # ((num_avg-1)*sps, C) float32
    planes: jnp.ndarray   # (state_rows(phase_avg), C) float32


class FullOutputs(NamedTuple):
    """Time-major symbol-rate planes (S, C); bits are packed LSB-first ints.
    soft_re/soft_im are float32, or int8 when the kernel ran with
    ``soft_i8_scale`` (dequantize as ``plane / scale``)."""

    soft_re: jnp.ndarray
    soft_im: jnp.ndarray
    phase: jnp.ndarray
    bits_packed: jnp.ndarray
    sample_index: jnp.ndarray


class QuantSoft(NamedTuple):
    """Channel-major int8-quantized soft decisions inside DemodOutputs.soft
    (kernel ``soft_i8_scale`` mode): dequantize as ``(re_q + 1j*im_q) /
    scale``.  Kept quantized through the device->host fetch so the dominant
    output plane crosses at 2 bytes/symbol/channel; the packet layer
    dequantizes on the host (BankAssembler)."""

    re_q: jnp.ndarray    # (C, S) int8
    im_q: jnp.ndarray    # (C, S) int8
    scale: float


def full_from_ff(cfg: DemodConfig, ff_state, raw_win=None,
                 mixed_params=None) -> FullState:
    """Convert a *converged* channel-batched FFState (or FusedState) carry.

    Host-side, called once at the warm-up -> steady transition.

    Args:
      raw_win: required when ``cfg.matched_filter != "none"`` -- the last
        ``(num_avg-1)*sps + mf_ntaps-1`` RAW input samples per channel,
        shape (C, that) complex.  The kernel filters in-kernel, so its
        window carry holds raw samples (the FF carry only keeps filtered
        ones); the engine tracks this tail itself (FullKernelBatchEngine).
      mixed_params: models/mixed.MixedParams (per-channel M + differential)
        for a mixed-mode bank; written into the carry's mode rows so the
        kernel runs branch-free per-lane selects (pass mixed=True to
        demod_block_full).
    """
    from ..utils.transfer import to_host

    k = UNWRAP_TREND_LEN
    n1 = cfg.phase_avg - 1
    if n1 < k:
        raise ValueError(f"full pipeline requires phase_avg >= {k + 1}")
    ff_state = to_host(ff_state)                  # complex64-safe on axon
    hist = np.asarray(ff_state.phase_hist)        # (C, n-1) oldest..newest
    c = hist.shape[0]
    if cfg.matched_filter != "none":
        keep = (cfg.num_avg - 1) * cfg.sps + cfg.mf_ntaps - 1
        if raw_win is None or np.shape(raw_win) != (c, keep):
            raise ValueError(
                f"matched-filter configs need raw_win of shape {(c, keep)} "
                f"(raw input tail; the FF carry only holds filtered samples)")
        raw = np.asarray(raw_win)
        win_re = np.ascontiguousarray(raw.real.T).astype(np.float32)
        win_im = np.ascontiguousarray(raw.imag.T).astype(np.float32)
    elif hasattr(ff_state, "win_re"):             # FusedState (time-major)
        win_re = np.asarray(ff_state.win_re)
        win_im = np.asarray(ff_state.win_im)
    else:                                         # FFState (channel-major)
        win = np.asarray(ff_state.win_samples)    # (C, A-1, sps)
        flat = win.reshape(c, -1)
        win_re = np.ascontiguousarray(flat.real.T).astype(np.float32)
        win_im = np.ascontiguousarray(flat.imag.T).astype(np.float32)

    rs = demod_kernel.state_rows(cfg.phase_avg, k)
    planes = np.zeros((rs, c), np.float32)
    planes[:n1] = hist.T
    tail = hist[:, n1 - (k - 1):]                 # (C, k-1) newest k-1
    planes[n1:n1 + k - 1] = np.cos(tail).T
    planes[n1 + k - 1:n1 + 2 * (k - 1)] = np.sin(tail).T
    misc = n1 + 2 * (k - 1)
    last_k = hist[:, n1 - k:]                     # (C, k)
    ang_prev = np.arctan2(np.sin(last_k).sum(-1), np.cos(last_k).sum(-1))
    last_phase = np.asarray(ff_state.last_phase)
    planes[misc] = ang_prev
    planes[misc + 1] = (2 * np.pi) * np.round(
        (last_phase - ang_prev) / (2 * np.pi))
    last_any = np.asarray(ff_state.last_any)
    planes[misc + 2] = last_any.real
    planes[misc + 3] = last_any.imag
    if mixed_params is not None:
        planes[misc + 6] = np.asarray(mixed_params.m, np.float32)
        planes[misc + 7] = np.asarray(mixed_params.diff, np.float32)
    return FullState(win_re=jnp.asarray(win_re), win_im=jnp.asarray(win_im),
                     planes=jnp.asarray(planes))


def ff_from_full(cfg: DemodConfig, state: FullState):
    """Convert the fused-kernel carry back to a (converged) FFState.

    The inverse of :func:`full_from_ff`, used for live reconfigure on the
    flagship engine (C7 semantics, cpp/psk_soft.cpp:638-651): the kernel's
    state planes ARE the feed-forward carry in another layout --
    ``planes[:n-1]`` is the unwrapped-phase history (newest == last_phase
    after the end-of-tile re-wrap, exactly like blockpsk's
    ``new_hist = cat[S:] - off``), ``planes[misc+2/3]`` the previous
    decision sample.  Host-side, called once per property change.
    """
    from ..models.blockpsk import FFState
    from ..utils.transfer import to_device, to_host

    k = UNWRAP_TREND_LEN
    n1 = cfg.phase_avg - 1
    state = to_host(state)
    planes = np.asarray(state.planes)
    win_re = np.asarray(state.win_re)             # ((A-1)*sps, C)
    win_im = np.asarray(state.win_im)
    c = planes.shape[1]
    misc = n1 + 2 * (k - 1)

    raw = (win_re.T + 1j * win_im.T).astype(np.complex64)   # (C, rows)
    if cfg.matched_filter != "none":
        # Kernel window rows are RAW; the FF carry wants the FILTERED window
        # plus the raw (ntaps-1) tail.  Filter host-side (valid alignment,
        # ops/matched_filter.apply_fir convention y[t] = sum taps[k] x[t+k]).
        from ..ops.matched_filter import filter_taps

        taps = np.asarray(filter_taps(cfg), np.float64)
        L = taps.size
        sw = np.lib.stride_tricks.sliding_window_view(raw, L, axis=-1)
        filt = (sw @ taps).astype(np.complex64)             # (C, wlen)
        mf_tail = raw[:, raw.shape[1] - (L - 1):]
        win = filt.reshape(c, cfg.num_avg - 1, cfg.sps)
    else:
        mf_tail = np.zeros((c, 0), np.complex64)
        win = raw.reshape(c, cfg.num_avg - 1, cfg.sps)
    hist = np.ascontiguousarray(planes[:n1].T)    # (C, n-1) oldest..newest
    last_any = (planes[misc + 2] + 1j * planes[misc + 3]).astype(np.complex64)
    return FFState(
        win_samples=to_device(win),
        win_energy=jnp.asarray((win.real ** 2 + win.imag ** 2)
                               .astype(np.float32)),
        seen=jnp.full((c,), cfg.num_avg, jnp.int32),
        phase_hist=jnp.asarray(hist.astype(np.float32)),
        phase_count=jnp.full((c,), cfg.phase_avg, jnp.int32),
        last_phase=jnp.asarray(hist[:, -1].astype(np.float32) if n1 > 0
                               else np.zeros(c, np.float32)),
        last_any=to_device(last_any),
        mf_tail=to_device(mf_tail),
    )


def dequantize_full_state(state: FullState, in_scale: float) -> FullState:
    """Inverse of :func:`quantize_full_state`: back to float32 window planes
    (for ff_from_full / checkpoint interchange)."""
    if state.win_re.dtype != jnp.int16:
        return state
    return FullState(
        win_re=state.win_re.astype(jnp.float32) * in_scale,
        win_im=state.win_im.astype(jnp.float32) * in_scale,
        planes=state.planes)


def quantize_full_state(state: FullState, in_scale: float) -> FullState:
    """Quantize the carry's raw-sample window planes to int16 for the int16
    ingest path (demod_kernel int16 mode).  The phase/state planes stay
    float32 -- only the bulk sample window rides the 2-byte format.  When
    the f32 window itself came from dequantized int16 input (the production
    case), round() recovers the exact wire values."""
    q_re = jnp.clip(jnp.round(state.win_re / in_scale), -32768, 32767)
    q_im = jnp.clip(jnp.round(state.win_im / in_scale), -32768, 32767)
    return FullState(win_re=q_re.astype(jnp.int16),
                     win_im=q_im.astype(jnp.int16), planes=state.planes)


def demod_block_full(cfg: DemodConfig, state: FullState,
                     x_re: jnp.ndarray, x_im: jnp.ndarray, *,
                     s_tile: int = 256, double_buffer: bool | None = None,
                     mixed: bool = False, in_scale: float = 1.0,
                     pack_out: bool | None = None,
                     soft_i8_scale: float | None = None,
                     debug_ports: bool = True,
                     interpret: bool = False):
    """One steady-state block through the fused kernel.

    x_re/x_im: (T, C) float32 time-major planes, T = S * sps.  Always raw
    input; the matched filter (when configured) runs inside the kernel as
    chunked banded matmuls, and the window carry then holds raw samples.

    int16 ingest: pass int16 planes (+ ``in_scale``) and an int16-window
    state (:func:`quantize_full_state`); samples then cross HBM at 2 bytes
    and dequantize in VMEM, halving the input-bound roofline.
    """
    if cfg.sps <= 1:
        raise ValueError("full kernel supports sps > 1; use models.blockpsk "
                         "for the sps=1 passthrough")
    sps, num_avg = cfg.sps, cfg.num_avg
    taps = _static_taps(cfg)
    extra = (len(taps) - 1) if taps else 0
    keep = (num_avg - 1) * sps + extra
    if x_re.shape[0] < keep:
        # The carry-window update below slices the last keep input rows;
        # a shorter block would silently wrap the slice.  Engines pad EOS
        # remainders to a full block instead.
        raise ValueError(
            f"block must be >= (num_avg-1)*sps + mf_ntaps-1 = {keep} "
            f"samples, got {x_re.shape[0]}; pad the final block (see "
            f"FullKernelBatchEngine.flush)")
    soft_re, soft_im, phase, bits, idx, planes = demod_kernel.demod_full_tm(
        state.win_re, state.win_im, x_re, x_im, state.planes, sps=sps,
        num_avg=num_avg, phase_avg=cfg.phase_avg, m=cfg.constellation_size,
        diff=cfg.differential, s_tile=s_tile, double_buffer=double_buffer,
        mf_taps=taps, timing_interp=cfg.timing_interp, mixed=mixed,
        in_scale=in_scale, pack_out=pack_out, soft_i8_scale=soft_i8_scale,
        debug_ports=debug_ports, interpret=interpret)
    new_state = FullState(
        win_re=x_re[x_re.shape[0] - keep:],
        win_im=x_im[x_im.shape[0] - keep:],
        planes=planes,
    )
    return new_state, FullOutputs(soft_re, soft_im, phase, bits, idx)


def demod_block_full_rolling(cfg: DemodConfig, planes: jnp.ndarray,
                             prev_re: jnp.ndarray, prev_im: jnp.ndarray,
                             x_re: jnp.ndarray, x_im: jnp.ndarray, *,
                             s_tile: int = 256,
                             double_buffer: bool | None = None,
                             mixed: bool = False, in_scale: float = 1.0,
                             pack_out: bool | None = None,
                             soft_i8_scale: float | None = None,
                             debug_ports: bool = True,
                             interpret: bool = False):
    """Steady-state block with the window read IN PLACE from the previous
    block's input planes (demod_kernel rolling-window mode).

    The standard :func:`demod_block_full` materializes a fresh
    ``(num_avg-1)*sps``-row window carry every block (an HBM write) that the
    next block re-reads (an HBM read).  Here the kernel's window DMA instead
    points at the last window rows of ``prev_re/prev_im`` -- the previous
    block's planes, still resident in HBM -- so that round trip disappears
    (~12% of total kernel HBM traffic at the default 1024-channel config).
    Only the ``planes`` tracking carry is threaded.

    Requirements (ValueError otherwise, at trace time): no matched filter,
    8-row-aligned window ((num_avg-1)*sps % 8 == 0, 16 for int16 ingest),
    and prev planes at least one window long.  Engines fall back to the
    standard path automatically when unsupported
    (FullKernelBatchEngine._steady_step).

    Returns ``(planes', FullOutputs)``.
    """
    if cfg.sps <= 1:
        raise ValueError("full kernel supports sps > 1")
    if cfg.matched_filter != "none":
        raise ValueError("rolling-window mode requires matched_filter="
                         "'none' (the MF path stages [window | block] "
                         "through a concat)")
    sps, num_avg = cfg.sps, cfg.num_avg
    keep = (num_avg - 1) * sps
    if prev_re.shape[0] < keep:
        raise ValueError(f"prev planes must hold >= {keep} rows")
    if x_re.shape[0] < keep:
        raise ValueError(f"block must be >= (num_avg-1)*sps = {keep} "
                         f"samples, got {x_re.shape[0]}")
    off = prev_re.shape[0] - keep
    soft_re, soft_im, phase, bits, idx, planes2 = demod_kernel.demod_full_tm(
        prev_re, prev_im, x_re, x_im, planes, sps=sps, num_avg=num_avg,
        phase_avg=cfg.phase_avg, m=cfg.constellation_size,
        diff=cfg.differential, s_tile=s_tile, double_buffer=double_buffer,
        mf_taps=None, timing_interp=cfg.timing_interp, mixed=mixed,
        in_scale=in_scale, pack_out=pack_out, soft_i8_scale=soft_i8_scale,
        win_offset=off, debug_ports=debug_ports, interpret=interpret)
    return planes2, FullOutputs(soft_re, soft_im, phase, bits, idx)


def _static_taps(cfg: DemodConfig):
    """Matched-filter taps as a hashable static tuple (None when disabled)."""
    if cfg.matched_filter == "none":
        return None
    from ..ops.matched_filter import filter_taps

    return tuple(float(t) for t in filter_taps(cfg))


def make_full_demod_fn(cfg: DemodConfig, *, s_tile: int = 256,
                       in_scale: float = 1.0,
                       pack_out: bool | None = None,
                       soft_i8_scale: float | None = None,
                       interpret: bool = False):
    return jax.jit(functools.partial(demod_block_full, cfg, s_tile=s_tile,
                                     in_scale=in_scale, pack_out=pack_out,
                                     soft_i8_scale=soft_i8_scale,
                                     interpret=interpret))


def make_mixed_full_demod_fn(cfg: DemodConfig, *, s_tile: int = 256,
                             interpret: bool = False):
    """Mixed-mode flagship step: per-channel (M, differential) read from the
    carry's mode rows (convert with full_from_ff(..., mixed_params=params);
    XLA equivalent: models/mixed.make_mixed_demod_fn).  cfg's
    constellation_size/differential are ignored."""
    return jax.jit(functools.partial(demod_block_full, cfg, s_tile=s_tile,
                                     mixed=True, interpret=interpret))


def make_scanned_full_demod_fn(cfg: DemodConfig, *, s_tile: int = 256,
                               in_scale: float = 1.0,
                               pack_out: bool | None = None,
                               soft_i8_scale: float | None = None,
                               interpret: bool = False):
    """Many kernel block-steps in ONE dispatch: fn(state, xs_re, xs_im) with
    (K, T, C) plane stacks, scanning the fused kernel over the leading axis
    and returning (state, stacked FullOutputs)."""
    step = functools.partial(demod_block_full, cfg, s_tile=s_tile,
                             in_scale=in_scale, pack_out=pack_out,
                             soft_i8_scale=soft_i8_scale,
                             interpret=interpret)

    def run(state, xs_re, xs_im):
        def body(st, xy):
            st2, out = step(st, xy[0], xy[1])
            return st2, out
        return jax.lax.scan(body, state, (xs_re, xs_im))

    return jax.jit(run)


def to_demod_outputs(cfg: DemodConfig, out: FullOutputs,
                     soft_i8_scale: float | None = None) -> DemodOutputs:
    """Adapter to the standard channel-major DemodOutputs (for tests/tools;
    the packed-bits planes are the production interface).  phase and
    sample_index stay None when the kernel ran with debug_ports=False (the
    packet layer then omits those ports, like the reference with
    unconnected ports).

    When the kernel ran with ``soft_i8_scale`` the soft planes are int8;
    pass the same scale here and ``soft`` holds a :class:`QuantSoft` --
    still quantized, so the device->host fetch stays at 2 bytes/symbol/
    channel.  BankAssembler dequantizes on the host; library users call
    ``dequantize_soft``.
    """
    if out.soft_re.dtype == jnp.int8:
        if soft_i8_scale is None:
            raise ValueError("kernel emitted int8 soft planes; pass the "
                             "soft_i8_scale it ran with")
        soft = QuantSoft(out.soft_re.T, out.soft_im.T, float(soft_i8_scale))
        vshape = soft.re_q.shape
    else:
        soft = jax.lax.complex(out.soft_re.T, out.soft_im.T)
        vshape = soft.shape
    packed = out.bits_packed.T
    bits = jnp.stack([(packed >> i) & 1
                      for i in range(max(3, cfg.bits_per_symbol))],
                     axis=-1).astype(jnp.int8)
    return DemodOutputs(
        soft=soft,
        bits=bits,
        phase=None if out.phase is None else out.phase.T,
        sample_index=(None if out.sample_index is None
                      else out.sample_index.T),
        valid=jnp.ones(vshape, bool),
    )


def dequantize_soft(soft) -> np.ndarray:
    """Host-side complex64 soft decisions from a (host) QuantSoft (identity
    for already-complex arrays)."""
    if isinstance(soft, QuantSoft):
        inv = 1.0 / float(soft.scale)
        out = np.empty(np.shape(soft.re_q), np.complex64)
        out.real = np.asarray(soft.re_q, np.float32) * inv
        out.imag = np.asarray(soft.im_q, np.float32) * inv
        return out
    return np.asarray(soft)
