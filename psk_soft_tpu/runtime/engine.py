"""Streaming demod engines: the service-loop equivalent.

The reference's ``serviceFunction`` (C4, ``cpp/psk_soft.cpp:346-618``) is a
blocking packet loop: getPacket -> flush/mode/reset checks -> property
snapshot -> SRI propagation -> hot loop -> four pushPackets.  Here the same
contract is a host-side engine around the jitted block step:

* :class:`StreamEngine` -- one stream, full reference semantics
  (flush -> reset, real-mode rejection, live reconfigure with resync rules,
  EOS propagation, SRI rate rescaling, accurate per-port timestamps).
* :class:`BatchEngine` -- C aligned streams (e.g. channelizer outputs)
  demodulated as one batched device step; same per-packet semantics applied
  group-wide.

Device blocks are fixed-size (``block_symbols``) so one compiled program
serves the steady state; the sub-block remainder waits in a host staging
buffer (the reference's deques keep partial symbols across packets the same
way, via ``index``).  On EOS the remaining whole symbols are processed as one
final (recompiled once) block and the tail < sps samples are dropped, like
the reference's never-completed last window.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

# Structured logging in place of the reference's log4cxx macros
# (PREPARE_LOGGING/LOG_WARN/LOG_DEBUG, cpp/psk_soft.cpp:33,355,361,639-650).
logger = logging.getLogger("psk_soft_tpu.engine")

from ..config import DemodConfig
from ..models import blockpsk, psk
from .. import state as state_mod
from .streams import (SRI, Packet, PortStats, PORT_BITS, PORT_PHASE,
                      PORT_SAMPLE_INDEX, PORT_SOFT, propagate_sri,
                      record_packets)


@dataclasses.dataclass
class EngineMetrics:
    """Observability counters (SURVEY.md section 5: add symbols out, resyncs)."""

    packets_in: int = 0
    samples_in: int = 0
    symbols_out: int = 0
    bits_out: int = 0
    resets: int = 0
    reconfigures: int = 0
    real_mode_drops: int = 0
    eos_seen: int = 0


class _PipelineOps:
    """Pipeline-kind dispatch: exact scan vs feed-forward."""

    def __init__(self, kind: str):
        if kind == "ff":
            self.init = lambda cfg, shape=(): blockpsk.ff_init(cfg, shape)
            self.block = blockpsk.demod_block_ff
        elif kind == "exact":
            self.init = lambda cfg, shape=(): state_mod.init_state(cfg, shape)
            self.block = psk.demod_block
        else:
            raise ValueError(f"unknown pipeline {kind!r}")
        self.kind = kind


class StreamEngine:
    """Single-stream streaming demodulator with reference service semantics."""

    def __init__(self, cfg: DemodConfig, block_symbols: int = 512,
                 pipeline: str = "ff"):
        self.cfg = cfg
        self.block_symbols = int(block_symbols)
        self._ops = _PipelineOps(pipeline)
        self._state = self._ops.init(cfg)
        self._staging = np.zeros(0, np.complex64)
        self._sri: Optional[SRI] = None
        self._sri_dirty = True
        # Per-output-port counters (ProvidesPortStatisticsProvider analog,
        # psk_soft.scd.xml:86-95).
        self.port_stats: dict[str, PortStats] = {}
        self._time_origin: Optional[float] = None  # time of stream sample 0
        self._symbols_emitted = 0    # valid outputs so far (for timestamps)
        self._symbols_consumed = 0   # whole symbols fed to the device
        self.metrics = EngineMetrics()
        from ..utils.profiling import StepTimer
        self.step_timer = StepTimer()  # per-device-block wall time
        self._fns: dict = {}

    # ------------------------------------------------------------- config

    def configure(self, new_cfg: DemodConfig) -> None:
        """Live property change: explicit resync (C7 semantics).

        Mirrors cpp/psk_soft.cpp:365-426,619-651 -- the carry is re-derived,
        not cleared, so tracking survives compatible changes.
        """
        if new_cfg == self.cfg:
            return
        logger.debug("reconfigure: %s -> %s", self.cfg, new_cfg)
        if self._ops.kind == "exact":
            self._state = state_mod.reconfigure(self.cfg, new_cfg, self._state)
        else:
            self._state = reconfigure_ff(self.cfg, new_cfg, self._state)
        self.cfg = new_cfg
        self._sri_dirty = True
        # Conservatively drop back to the flexible (warm-up-capable) program:
        # a resync may leave partially-filled windows.
        self._symbols_consumed = 0
        # Re-anchor timestamps: the resync changes the symbol period and may
        # suppress emission for a re-warm-up, so the old origin/counter pair
        # no longer maps emitted-symbol index to time.
        self._symbols_emitted = 0
        self._time_origin = None
        self.metrics.reconfigures += 1

    def reset(self) -> None:
        """Full demod state reset (the resetState property,
        psk_soft.prf.xml:55-60, consumed at cpp/psk_soft.cpp:365-372)."""
        self._state = self._ops.init(self.cfg)
        self._staging = np.zeros(0, np.complex64)
        self._symbols_emitted = 0
        self._symbols_consumed = 0
        self._time_origin = None  # re-anchor timestamps at the next packet
        self.metrics.resets += 1

    def _reset_phase_only(self) -> None:
        """Clear only the phase-fit history (LinearFit::reset with a new
        sample rate, cpp/psk_soft.cpp:89-102): timing window, warm-up and
        staging survive."""
        fresh = self._ops.init(self.cfg)
        if self._ops.kind == "ff":
            self._state = self._state._replace(
                phase_hist=fresh.phase_hist, phase_count=fresh.phase_count,
                last_phase=fresh.last_phase)
        else:
            self._state = self._state._replace(
                ring=fresh.ring, ring_pos=fresh.ring_pos,
                ring_fill=fresh.ring_fill, phase_est=fresh.phase_est)

    # ------------------------------------------------------------- data

    def process(self, packet: Packet) -> dict[str, Packet]:
        """Feed one input packet; returns {port_name: Packet} for non-empty
        outputs (like the four conditional pushPackets,
        cpp/psk_soft.cpp:605-615)."""
        self.metrics.packets_in += 1
        if packet.input_queue_flushed:
            # cpp/psk_soft.cpp:353-357: data was dropped upstream; restart
            # tracking rather than demodulate across the gap.
            logger.warning("input queue flushed - data has been thrown on "
                           "the floor; flushing internal buffers (stream %s)",
                           packet.sri.stream_id)
            self.reset()
        if packet.sri.mode != 1:
            # cpp/psk_soft.cpp:359-363: cannot work with real data.
            logger.warning("cannot work with real data (stream %s mode=%d)",
                           packet.sri.stream_id, packet.sri.mode)
            self.metrics.real_mode_drops += 1
            return {}
        if self._sri is None or packet.sri != self._sri or packet.sri_changed:
            if self._sri is not None and packet.sri.xdelta != self._sri.xdelta:
                # Rate change invalidates only the phase-tracker history
                # (cpp/psk_soft.cpp:394-397 -> LinearFit.reset with the new
                # rate clears the fit; the timing deques survive).
                self._reset_phase_only()
                # Re-anchor the timestamp base: output times are computed as
                # origin + new_xdelta*sps*k, so the old (origin, k) pair would
                # misdate every packet after the rate change.  Symbols emitted
                # from this packet on are timed from this packet's T; staged
                # old-rate samples ahead of it are nudged to the new clock
                # (bounded by one block -- acceptable, like the reference's
                # input-packet-T stamping).
                self._time_origin = packet.t - \
                    packet.sri.xdelta * float(self._staging.size)
                self._symbols_emitted = 0
            self._sri = packet.sri
            self._sri_dirty = True

        data = np.asarray(packet.data, np.complex64).ravel()
        if self._time_origin is None:
            self._time_origin = packet.t
        self.metrics.samples_in += data.size
        self._staging = np.concatenate([self._staging, data])

        outputs = self._drain(final=packet.eos)
        if packet.eos:
            self.metrics.eos_seen += 1
            outputs = self._mark_eos(outputs, packet)
        return record_packets(self.port_stats, outputs)

    # ------------------------------------------------------------- internals

    def _step_fn(self, steady: bool) -> Callable:
        # One jitted step per (config, steadiness); XLA re-specializes per
        # block shape (steady state uses a single shape, EOS adds one more).
        key = (self.cfg, steady)
        fn = self._fns.get(key)
        if fn is None:
            import functools
            if self._ops.kind == "ff":
                fn = jax.jit(functools.partial(self._ops.block, self.cfg,
                                               assume_steady=steady))
            else:
                fn = jax.jit(functools.partial(self._ops.block, self.cfg))
            self._fns[key] = fn
        return fn

    def _is_steady(self) -> bool:
        """Warm-up fully behind us: timing window full and tracker window
        full; the compiled steady program then skips all warm-up machinery."""
        return (self._ops.kind == "ff" and self._symbols_consumed
                >= self.cfg.num_avg + self.cfg.phase_avg)

    def _drain(self, final: bool) -> dict[str, Packet]:
        sps = self.cfg.sps
        block = self.block_symbols * sps
        chunks = []
        while self._staging.size >= block:
            chunks.append(self._run_block(self._staging[:block]))
            self._staging = self._staging[block:]
        if final and self._staging.size >= sps:
            n = (self._staging.size // sps) * sps
            chunks.append(self._run_block(self._staging[:n]))
            self._staging = self._staging[n:]
        if final:
            self._staging = np.zeros(0, np.complex64)
        return self._assemble(chunks)

    def _run_block(self, samples: np.ndarray):
        from ..utils.transfer import to_device
        fn = self._step_fn(self._is_steady())
        with self.step_timer.measure():
            self._state, out = fn(self._state, to_device(samples))
        self._symbols_consumed += samples.size // self.cfg.sps
        return out

    def _assemble(self, chunks) -> dict[str, Packet]:
        if not chunks:
            return {}
        from ..utils.transfer import to_host
        chunks = [to_host(c) for c in chunks]  # complex64-safe on axon TPU
        valid = np.concatenate([np.asarray(c.valid) for c in chunks])
        if not valid.any():
            return {}
        soft = np.concatenate([np.asarray(c.soft) for c in chunks])[valid]
        bits3 = np.concatenate([np.asarray(c.bits) for c in chunks])[valid]
        phase = np.concatenate([np.asarray(c.phase) for c in chunks])[valid]
        sidx = np.concatenate([np.asarray(c.sample_index) for c in chunks])[valid]
        nb = self.cfg.bits_per_symbol
        bits = bits3[:, :nb].reshape(-1).astype(np.int16)

        sri = self._sri or SRI(stream_id="unknown")
        out_sri = propagate_sri(self.cfg, sri)
        # Timestamp: the first emitted symbol of this batch is stream symbol
        # k0 = symbols_emitted; its first sample's time is origin+k0*sps*xdelta.
        # (Deviation, documented: the reference stamps outputs with the
        # triggering *input* packet's T, cpp/psk_soft.cpp:608-615, which is
        # off by the window latency; we stamp the actual symbol time.)
        k0 = self._symbols_emitted
        t_out = (self._time_origin or 0.0) + sri.xdelta * self.cfg.sps * k0

        self._symbols_emitted += int(valid.sum())
        self.metrics.symbols_out += int(valid.sum())
        self.metrics.bits_out += bits.size

        sri_changed = self._sri_dirty
        self._sri_dirty = False

        def pkt(data, port):
            return Packet(data=data, sri=out_sri[port], t=t_out,
                          sri_changed=sri_changed)

        return {
            PORT_SOFT: pkt(soft, PORT_SOFT),
            PORT_BITS: pkt(bits, PORT_BITS),
            PORT_PHASE: pkt(phase.astype(np.float32), PORT_PHASE),
            PORT_SAMPLE_INDEX: pkt(sidx.astype(np.int16), PORT_SAMPLE_INDEX),
        }

    def _mark_eos(self, outputs, packet) -> dict[str, Packet]:
        # EOS must reach consumers even if no data is emitted.
        if not outputs:
            sri = self._sri or packet.sri
            out_sri = propagate_sri(self.cfg, sri)
            outputs = {p: Packet(data=np.zeros(0, np.float32), sri=s,
                                 t=packet.t)
                       for p, s in out_sri.items()}
        for p in outputs.values():
            p.eos = True
        return outputs


def reconfigure_ff(old_cfg: DemodConfig, new_cfg: DemodConfig,
                   state: blockpsk.FFState) -> blockpsk.FFState:
    """C7 resync for the feed-forward carry (see state.reconfigure for the
    exact-path equivalent and the reference rules)."""
    state = jax.tree_util.tree_map(np.asarray, state)
    channel_shape = np.shape(state.seen)
    new = blockpsk.ff_init(new_cfg, channel_shape)
    from ..utils.transfer import to_device
    new = new._replace(last_any=to_device(state.last_any))
    mf_keys = ("matched_filter", "sps", "rrc_beta", "rrc_span")
    if all(getattr(old_cfg, k) == getattr(new_cfg, k) for k in mf_keys):
        new = new._replace(mf_tail=to_device(state.mf_tail))

    resync = state_mod.resync_window(old_cfg, new_cfg, state.win_samples,
                                     state.seen)
    if resync is None:
        new = new._replace(
            win_samples=to_device(state.win_samples),
            win_energy=jnp.asarray(state.win_energy),
            seen=jnp.asarray(state.seen),
        )
    else:
        ws, we, seen = resync
        new = new._replace(win_samples=to_device(ws),
                           win_energy=jnp.asarray(we),
                           seen=jnp.asarray(seen))

    if old_cfg.constellation_size != new_cfg.constellation_size:
        return new  # phase history force-cleared (cpp/psk_soft.cpp:416-420)

    n_old, n_new = old_cfg.phase_avg, new_cfg.phase_avg
    hist = np.asarray(state.phase_hist)           # right-aligned (n_old-1,)
    # The FF history retains at most n_old-1 live values (the window's
    # newest n-1; the n-th lives only inside the fit), so cap the carried
    # count by what actually survives -- otherwise growing phase_avg counts
    # a zero slot as live history.
    count = np.minimum(np.asarray(state.phase_count), max(n_old - 1, 1))
    keep = np.minimum(count, max(n_new - 1, 0))
    m = max(n_new - 1, 0)
    L = max(n_old - 1, 0)
    # Right-align the newest keep values: new[..., s] = hist[..., L-m+s]
    # masked to s >= m-keep -- one vectorized gather, no per-channel host
    # loop (a 4096-channel property change is milliseconds, not seconds).
    if m > 0 and L > 0:
        s = np.arange(m)
        src_idx = np.clip(L - m + s, 0, L - 1)
        idx = np.broadcast_to(src_idx, channel_shape + (m,))
        gathered = np.take_along_axis(hist, idx, axis=-1)
        mask = s >= (m - np.asarray(keep)[..., None])
        new_hist = np.where(mask, gathered, 0.0).astype(np.float32)
    else:
        new_hist = np.zeros(channel_shape + (m,), np.float32)
    return new._replace(
        phase_hist=jnp.asarray(new_hist),
        phase_count=jnp.asarray(np.minimum(count, n_new).astype(np.int32)),
        last_phase=jnp.asarray(state.last_phase),
    )


@dataclasses.dataclass
class TMOutputs:
    """Raw kernel block outputs on their way to packet assembly: the
    device-resident time-major planes exactly as the fused kernel wrote
    them, plus the flush-path row validity mask and the soft_i8 scale.

    The packet fast path (BankAssembler.assemble_tm) fetches THESE planes
    and builds the channel-major packet payloads as host views -- no
    device-side transpose, lax.complex combine, or bit-unpack ever runs,
    so the only device work per block is the kernel itself and the only
    HBM traffic is its own outputs.  (step()'s array surface still returns
    channel-major DemodOutputs via models/full.to_demod_outputs.)
    """

    fo: object                      # models/full.FullOutputs (device)
    valid_rows: object = None       # np bool (S,) or None = all valid
    soft_scale: float | None = None


class BankAssembler:
    """SRI/timestamp packet assembly for the batch engines.

    The reference pushes SRI + timestamped packets on all four output ports
    (cpp/psk_soft.cpp:392-405, 605-615); StreamEngine._assemble provides that
    L2 metadata layer for one stream, this provides it for a channel bank
    (one SRI governs the aligned bank; packet data carries the leading
    channel axis).  Timestamps follow the StreamEngine convention: symbol
    k0's first-sample time from the bank time origin.
    """

    def __init__(self, cfg: DemodConfig, skip_debug: bool = False):
        self.cfg = cfg
        # skip_debug mirrors "phase/sampleIndex ports unconnected": those
        # packets are never assembled (and the fused kernel never writes
        # the planes -- demod_kernel debug_ports=False).
        self.skip_debug = skip_debug
        self.sri: Optional[SRI] = None
        self._dirty = True
        self._t0: Optional[float] = None
        self._k0 = 0

    def set_sri(self, sri: SRI, t: float = 0.0) -> None:
        """Declare the bank's input SRI (call before/whenever it changes)."""
        if self.sri is None or sri != self.sri:
            if self.sri is not None and sri.xdelta != self.sri.xdelta:
                self._t0 = t          # rate change: re-anchor the clock
                self._k0 = 0
            self.sri = sri
            self._dirty = True
        if self._t0 is None:
            self._t0 = t

    def reconfigure(self, cfg: DemodConfig) -> None:
        self.cfg = cfg
        self._dirty = True
        self._k0 = 0
        self._t0 = None

    def reset(self) -> None:
        self._k0 = 0
        self._t0 = None

    def _advance_clock(self, sv: int, eos: bool):
        """ONE place for the packet bookkeeping both assembly routes share:
        output SRIs, this batch's head timestamp (symbol clock _k0 advanced
        by sv emitted symbols), the sriChanged handshake, and the Packet
        constructor.  assemble and assemble_tm MUST stay clock-identical --
        test_tm_packets pins it."""
        sri = self.sri or SRI(stream_id="bank")
        out_sri = propagate_sri(self.cfg, sri)
        t_out = (self._t0 or 0.0) + sri.xdelta * self.cfg.sps * self._k0
        self._k0 += sv
        sric = self._dirty
        self._dirty = False

        def pkt(data, port):
            return Packet(data=data, sri=out_sri[port], t=t_out,
                          sri_changed=sric, eos=eos)

        return pkt

    def assemble(self, out, eos: bool = False) -> dict[str, Packet]:
        """Channel-major DemodOutputs -> {port: Packet} with propagated SRI,
        symbol-accurate timestamps, and EOS marking."""
        from ..utils.transfer import to_host

        sri = self.sri or SRI(stream_id="bank")
        out_sri = propagate_sri(self.cfg, sri)
        if out is None:
            if not eos:
                return {}
            pkts = {p: Packet(data=np.zeros(0, np.float32), sri=s,
                              t=(self._t0 or 0.0), eos=True)
                    for p, s in out_sri.items()
                    if not (self.skip_debug
                            and p in (PORT_PHASE, PORT_SAMPLE_INDEX))}
            return pkts
        out = to_host(out)
        valid = np.asarray(out.valid)
        v = valid[0] if valid.ndim > 1 else valid   # lockstep bank
        if not v.any():
            return self.assemble(None, eos=eos)
        # soft_i8 engines fetch int8-quantized soft planes (QuantSoft, 2
        # bytes/symbol/channel over the host link); PORT_SOFT packets carry
        # the dequantized (grid-snapped) complex values either way.
        from ..models.full import dequantize_soft
        soft = dequantize_soft(out.soft)[:, v]
        bits3 = np.asarray(out.bits)[:, v]
        nb = self.cfg.bits_per_symbol
        bits = bits3[:, :, :nb].reshape(bits3.shape[0], -1).astype(np.int16)

        pkt = self._advance_clock(int(v.sum()), eos)

        pkts = {
            PORT_SOFT: pkt(soft, PORT_SOFT),
            PORT_BITS: pkt(bits, PORT_BITS),
        }
        if not self.skip_debug and out.phase is not None:
            phase = np.asarray(out.phase)[:, v].astype(np.float32)
            pkts[PORT_PHASE] = pkt(phase, PORT_PHASE)
        if not self.skip_debug and out.sample_index is not None:
            sidx = np.asarray(out.sample_index)[:, v].astype(np.int16)
            pkts[PORT_SAMPLE_INDEX] = pkt(sidx, PORT_SAMPLE_INDEX)
        return pkts

    def assemble_tm(self, tm: TMOutputs, eos: bool = False) -> dict[str, Packet]:
        """Packet assembly straight from the kernel's time-major planes
        (see TMOutputs): fetch the raw planes, then build the SAME packet
        payloads as :meth:`assemble` -- channel-major, identical dtypes,
        values, timestamps -- with host-side views/unpacks instead of
        device-side transforms."""
        from ..utils.transfer import to_host

        fo = tm.fo
        s_re, s_im, phase_p, packed, sidx_p = to_host(
            (fo.soft_re, fo.soft_im, fo.phase, fo.bits_packed,
             fo.sample_index))
        v = tm.valid_rows
        if v is not None and not v.any():
            return self.assemble(None, eos=eos)
        if v is not None:
            s_re, s_im, packed = s_re[v], s_im[v], packed[v]
            phase_p = None if phase_p is None else phase_p[v]
            sidx_p = None if sidx_p is None else sidx_p[v]
        pkt = self._advance_clock(s_re.shape[0], eos)

        from ..models.full import QuantSoft, dequantize_soft
        if tm.soft_scale:
            soft_t = dequantize_soft(QuantSoft(s_re, s_im, tm.soft_scale))
        else:
            soft_t = np.empty(s_re.shape, np.complex64)      # (Sv, C)
            soft_t.real = s_re
            soft_t.imag = s_im
        nb = self.cfg.bits_per_symbol
        bits = ((packed.T[:, :, None] >> np.arange(nb)) & 1).astype(
            np.int16).reshape(packed.shape[1], -1)           # (C, Sv*nb)

        pkts = {
            PORT_SOFT: pkt(soft_t.T, PORT_SOFT),             # (C, Sv) view
            PORT_BITS: pkt(bits, PORT_BITS),
        }
        if not self.skip_debug and phase_p is not None:
            pkts[PORT_PHASE] = pkt(phase_p.T.astype(np.float32), PORT_PHASE)
        if not self.skip_debug and sidx_p is not None:
            pkts[PORT_SAMPLE_INDEX] = pkt(sidx_p.T.astype(np.int16),
                                          PORT_SAMPLE_INDEX)
        return pkts


class _PipelinedPackets:
    """Deferred-assembly packet pipelining shared by the batch engines.

    With ``pipeline_depth = d > 0``, ``step_packets`` dispatches block k to
    the device but assembles (device->host fetch) block k-d, so the host's
    staging/assembly work for the next block overlaps the device's compute
    of the current one -- the "double-buffered feed" of SURVEY section 7
    stage 7.  Depth 0 (default) keeps the synchronous one-in/one-out
    contract.  Output packets are identical either way (same data, same
    symbol-accurate timestamps), only their emission is delayed by d calls;
    EOS drains everything.
    """

    def _init_pipeline(self, depth: int) -> None:
        if depth < 0:
            raise ValueError("pipeline_depth must be >= 0")
        self._pipe_depth = int(depth)
        self._pending: list = []     # device outputs not yet assembled
        self._held: list[dict[str, Packet]] = []  # assembled, not yet emitted
        self._device_tap_fn = None
        # Per-output-port counters (ProvidesPortStatisticsProvider analog,
        # psk_soft.scd.xml:86-95); updated once per assembled block.
        self.port_stats: dict[str, PortStats] = {}

    def set_device_tap(self, fn) -> None:
        """Register an observer called with each raw block output
        (TMOutputs or channel-major DemodOutputs, still device-resident)
        right before packet assembly fetches it.  Lets downstream stages
        (runtime/framesync's device-resident syncer) consume the kernel's
        output planes without any plane-sized host transfer.  One slot;
        pass None to clear."""
        self._device_tap_fn = fn

    def push_block(self, block: np.ndarray) -> None:
        """Channel-major (C, n) complex64 append — the native-bank fast
        path (runtime/native_bank.py): zero-copy into empty staging."""
        block = np.asarray(block, np.complex64)
        if block.ndim != 2 or block.shape[0] != len(self._staging):
            raise ValueError(f"expected ({len(self._staging)}, n) block")
        for c in range(block.shape[0]):
            s = self._staging[c]
            self._staging[c] = (block[c] if s.size == 0
                                else np.concatenate([s, block[c]]))
        self.metrics.samples_in += block.size

    def _step_for_packets(self):
        """Block step feeding the packet path; engines with a raw
        (time-major-plane) route override this to skip the channel-major
        array conversion entirely."""
        return self.step()

    def _flush_for_packets(self):
        return self.flush()

    def _emit(self, out, eos: bool = False) -> dict[str, Packet]:
        if out is not None and self._device_tap_fn is not None:
            self._device_tap_fn(out)
        if isinstance(out, TMOutputs):
            pkts = self.assembler.assemble_tm(out, eos=eos)
        else:
            pkts = self.assembler.assemble(out, eos=eos)
        if self._pipe_depth:
            # Depth 0 counts eagerly in step()/flush(); pipelined blocks are
            # only fetched (and hence countable) here.
            soft = pkts.get(PORT_SOFT)
            if soft is not None:
                # (C, S) complex soft symbols: size == sum of valid flags.
                self.metrics.symbols_out += int(soft.data.size)
            bitsp = pkts.get(PORT_BITS)
            if bitsp is not None:
                self.metrics.bits_out += int(bitsp.data.size)
        return record_packets(self.port_stats, pkts)

    def _drain_pending(self) -> None:
        """Assemble every in-flight block now (old-config packets are held
        and returned by the next step_packets calls).  Used by configure()
        so a property change never applies new-config SRI/timestamps to
        blocks computed under the old config."""
        for out in self._pending:
            pkts = self._emit(out)
            if pkts:
                self._held.append(pkts)
        self._pending.clear()

    def step_packets(self) -> Optional[dict[str, Packet]]:
        """step() + L2 packet assembly: {port: Packet} with SRI/timestamps
        (the four conditional pushPackets, cpp/psk_soft.cpp:605-615).
        Returns None when nothing is ready to emit (distinct from {} = a
        block ran but emitted nothing, e.g. still warming up)."""
        if self._held:
            return self._held.pop(0)
        out = self._step_for_packets()
        if self._pipe_depth == 0:
            return None if out is None else self._emit(out)
        if out is not None:
            self._pending.append(out)
        if len(self._pending) > self._pipe_depth:
            return self._emit(self._pending.pop(0))
        return None

    def flush_packets(self) -> dict[str, Packet]:
        """flush() + assembly, EOS-marked on every port.  Pipelined blocks
        still in flight are assembled first and merged (per port, along the
        symbol axis): consecutive blocks are contiguous symbols, so the
        merged packet's head timestamp stays symbol-accurate."""
        dicts = list(self._held)
        self._held = []
        dicts += [p for p in (self._emit(o) for o in self._pending) if p]
        self._pending = []
        dicts.append(self._emit(self._flush_for_packets(), eos=True))
        return _merge_packet_dicts(dicts)


def _merge_packet_dicts(dicts: list[dict[str, Packet]]) -> dict[str, Packet]:
    """Concatenate per-port packets from consecutive blocks of one bank."""
    dicts = [d for d in dicts if d]
    if not dicts:
        return {}
    if len(dicts) == 1:
        return dicts[0]
    merged = {}
    for port in dicts[0]:
        ps = [d[port] for d in dicts if port in d]
        datas = [p.data for p in ps if p.data.size]
        data = (np.concatenate(datas, axis=-1) if datas
                else ps[0].data)
        merged[port] = Packet(
            data=data, sri=ps[-1].sri, t=ps[0].t,
            sri_changed=any(p.sri_changed for p in ps),
            eos=ps[-1].eos)
    return merged


class BatchEngine(_PipelinedPackets):
    """C aligned streams demodulated as one vmapped device step.

    Packets are pushed per channel slot; a device step runs whenever every
    slot holds at least ``block_symbols`` symbols (channelizer-aligned
    streams advance in lockstep).  Flush/reset/reconfigure semantics apply
    group-wide, matching C independent reference components with shared
    properties.
    """

    def __init__(self, cfg: DemodConfig, channels: int,
                 block_symbols: int = 512, pipeline: str = "ff",
                 guard_nonfinite: bool = False, pipeline_depth: int = 0):
        self._init_pipeline(pipeline_depth)
        if guard_nonfinite and pipeline_depth:
            # The guard must inspect each block's outputs on the host before
            # the next dispatch, which is exactly the sync pipelining removes.
            raise ValueError("guard_nonfinite and pipeline_depth are "
                             "mutually exclusive")
        self.cfg = cfg
        self.channels = channels
        self.block_symbols = int(block_symbols)
        self.guard_nonfinite = guard_nonfinite
        self._ops = _PipelineOps(pipeline)
        self._state = self._ops.init(cfg, (channels,))
        self._staging = [np.zeros(0, np.complex64) for _ in range(channels)]
        self.metrics = EngineMetrics()
        self.channel_resyncs = np.zeros(channels, np.int64)
        self.assembler = BankAssembler(cfg)
        from ..utils.profiling import StepTimer
        self.step_timer = StepTimer()
        import functools
        self._fn = jax.jit(jax.vmap(functools.partial(self._ops.block, cfg)))
        self._guard_fn = jax.jit(self._guard) if guard_nonfinite else None

    def set_input_sri(self, sri: SRI, t: float = 0.0) -> None:
        """Bank input SRI for packet assembly (step_packets/flush_packets)."""
        self.assembler.set_sri(sri, t)

    def push(self, channel: int, data: np.ndarray) -> None:
        self._staging[channel] = np.concatenate(
            [self._staging[channel], np.asarray(data, np.complex64).ravel()])
        self.metrics.samples_in += data.size

    def ready(self) -> bool:
        need = self.block_symbols * self.cfg.sps
        return all(s.size >= need for s in self._staging)

    def step(self):
        """Run one batched block; returns DemodOutputs (C, S) or None."""
        if not self.ready():
            return None
        need = self.block_symbols * self.cfg.sps
        x = np.stack([s[:need] for s in self._staging])
        self._staging = [s[need:] for s in self._staging]
        from ..utils.transfer import to_device
        with self.step_timer.measure():
            self._state, out = self._fn(self._state, to_device(x))
        if self._guard_fn is not None:
            self._state, bad = self._guard_fn(self._state, out)
            nbad = np.asarray(bad)
            if nbad.any():
                # Per-stream drop-and-resync (SURVEY.md section 5): a
                # poisoned channel (non-finite input burst, NaN propagation)
                # restarts its own tracking without touching its neighbors --
                # the reference's accepted-data-loss recovery, per channel.
                self.channel_resyncs[nbad] += 1
                self.metrics.resets += int(nbad.sum())
        if self._pipe_depth == 0:
            nv = int(np.asarray(out.valid).sum())
            self.metrics.symbols_out += nv
            self.metrics.bits_out += nv * self.assembler.cfg.bits_per_symbol
        return out

    def _guard(self, state, out):
        """Reset carries of channels whose outputs went non-finite."""
        bad = ~jnp.all(jnp.isfinite(out.soft.real)
                       & jnp.isfinite(out.soft.imag)
                       & jnp.isfinite(out.phase), axis=-1)      # (C,)
        fresh = self._ops.init(self.cfg, (self.channels,))

        def pick(new, old):
            b = bad.reshape(bad.shape + (1,) * (old.ndim - 1))
            return jnp.where(b, new, old)

        state2 = jax.tree_util.tree_map(pick, fresh, state)
        return state2, bad

    def configure(self, new_cfg: DemodConfig) -> None:
        """Live property change for the whole bank (C7 resync semantics,
        like StreamEngine.configure)."""
        import functools
        if new_cfg == self.cfg:
            return
        logger.debug("batch reconfigure: %s -> %s", self.cfg, new_cfg)
        self._drain_pending()
        if self._ops.kind == "exact":
            self._state = state_mod.reconfigure(self.cfg, new_cfg, self._state)
        else:
            self._state = reconfigure_ff(self.cfg, new_cfg, self._state)
        self.cfg = new_cfg
        self._fn = jax.jit(jax.vmap(functools.partial(self._ops.block,
                                                      new_cfg)))
        # The guard closure captures self.cfg via _ops.init at trace time;
        # rebuild so a post-reconfigure channel reset uses the new config.
        self._guard_fn = jax.jit(self._guard) if self.guard_nonfinite else None
        self.assembler.reconfigure(new_cfg)
        self.metrics.reconfigures += 1

    def flush(self):
        """EOS drain: process the remaining staged whole symbols (below the
        block size) as one final, shape-recompiled step; drops the < sps
        tail like the reference's never-completed last window."""
        from ..utils.transfer import to_device

        sps = self.cfg.sps
        n = (min(s.size for s in self._staging) // sps) * sps
        self._staging = [s[:n] for s in self._staging]
        if n == 0:
            self._staging = [np.zeros(0, np.complex64)
                             for _ in range(self.channels)]
            return None
        x = np.stack(self._staging)
        self._staging = [np.zeros(0, np.complex64)
                         for _ in range(self.channels)]
        with self.step_timer.measure():
            self._state, out = self._fn(self._state, to_device(x))
        if self._pipe_depth == 0:
            nv = int(np.asarray(out.valid).sum())
            self.metrics.symbols_out += nv
            self.metrics.bits_out += nv * self.assembler.cfg.bits_per_symbol
        return out

    def reset(self) -> None:
        self._state = self._ops.init(self.cfg, (self.channels,))
        self._staging = [np.zeros(0, np.complex64) for _ in range(self.channels)]
        self._pending.clear()
        self._held.clear()
        self.assembler.reset()
        self.metrics.resets += 1


class StreamRegistry:
    """Route interleaved packets of multiple streams to per-stream engines.

    BulkIO ports multiplex streams by streamID with independent SRI/EOS per
    stream (SURVEY.md section 1 L2); the reference component implicitly
    handles one stream at a time.  Here each streamID gets its own
    StreamEngine (lazily created with the registry's config); EOS retires
    the stream.
    """

    def __init__(self, cfg: DemodConfig, block_symbols: int = 512,
                 pipeline: str = "ff", max_streams: int = 1024):
        self.cfg = cfg
        self.block_symbols = block_symbols
        self.pipeline = pipeline
        self.max_streams = max_streams
        self.engines: dict[str, StreamEngine] = {}

    def process(self, packet: Packet) -> dict[str, Packet]:
        sid = packet.sri.stream_id
        eng = self.engines.get(sid)
        if eng is None:
            if len(self.engines) >= self.max_streams:
                raise RuntimeError(f"stream limit {self.max_streams} reached")
            eng = StreamEngine(self.cfg, self.block_symbols, self.pipeline)
            self.engines[sid] = eng
        out = eng.process(packet)
        if packet.eos:
            del self.engines[sid]
        return out

    def configure(self, new_cfg: DemodConfig) -> None:
        self.cfg = new_cfg
        for eng in self.engines.values():
            eng.configure(new_cfg)


class FullKernelBatchEngine(_PipelinedPackets):
    """BatchEngine for the single-kernel flagship: warms up through the
    channel-major feed-forward pipeline, then hands the carry to the fused
    Mosaic kernel (models/full.py) and streams time-major blocks through it.
    """

    def __init__(self, cfg: DemodConfig, channels: int,
                 block_symbols: int = 512, s_tile: int = 256,
                 interpret: bool = False, pipeline_depth: int = 0,
                 ingest_scale: float | None = None,
                 guard_nonfinite: bool = False,
                 debug_ports: bool = True,
                 soft_i8: bool = False, soft_i8_scale: float = 100.0):
        import functools
        from ..models import full as full_mod

        if channels % 128:
            raise ValueError("channels must be a multiple of 128")
        if guard_nonfinite and pipeline_depth:
            raise ValueError("guard_nonfinite and pipeline_depth are "
                             "mutually exclusive")
        if guard_nonfinite and soft_i8:
            # The guard detects poisoned channels via isfinite on the soft
            # planes; int8 planes quantize non-finites away.
            raise ValueError("guard_nonfinite and soft_i8 are mutually "
                             "exclusive")
        self._init_pipeline(pipeline_depth)
        self.guard_nonfinite = guard_nonfinite
        self.channel_resyncs = np.zeros(channels, np.int64)
        self.cfg = cfg
        self.channels = channels
        self.block_symbols = int(block_symbols)
        self._s_tile = s_tile
        self._interpret = interpret
        # int16-ingest mode: push_planes takes i16 wire planes dequantized
        # as i16 * ingest_scale; the steady kernel then reads 2-byte input
        # (demod_kernel int16 mode) and the carry window stays on the wire
        # format (quantize_full_state at the handoff).
        self._ingest_scale = (float(ingest_scale) if ingest_scale is not None
                              else None)
        # debug_ports=False = phase/sampleIndex ports unconnected: the
        # kernel never writes those symbol-rate planes and the packet
        # layer never assembles them (reference: bulkio skips pushes on
        # ports without consumers).
        self.debug_ports = debug_ports
        # soft_i8: the steady kernel emits int8-quantized soft planes
        # (round(s * scale), the SDR soft-bit wire format) -- the dominant
        # output plane crosses HBM and the host link at 2 bytes/symbol/
        # channel instead of 8; PORT_SOFT packets are dequantized on the
        # host (grid-snapped values, error <= 0.5/scale per component).
        self._soft_scale = float(soft_i8_scale) if soft_i8 else None
        self._full_kwargs = dict(s_tile=s_tile,
                                 in_scale=self._ingest_scale or 1.0,
                                 soft_i8_scale=self._soft_scale,
                                 debug_ports=debug_ports,
                                 interpret=interpret)
        self._warm_ops = _PipelineOps("ff")
        self._warm_state = self._warm_ops.init(cfg, (channels,))
        self._warm_fn = self._make_warm_fn(cfg)
        self._full_fn = jax.jit(functools.partial(
            full_mod.demod_block_full, cfg, **self._full_kwargs))
        self._full_mod = full_mod
        self._full_state = None
        # Rolling-window fast path: after the first steady block the kernel
        # reads its timing window in place from the previous block's planes
        # (demod_block_full_rolling), skipping the window-carry HBM round
        # trip.  _win_stale marks _full_state.win_* as superseded by
        # _prev_planes (materialized on demand: full_state property).
        self._prev_planes = None
        self._roll_fn = None
        self._roll_ok: bool | None = None
        self._win_stale = False
        self._staging = [np.zeros(0, np.complex64) for _ in range(channels)]
        self._plane_re: list[np.ndarray] = []   # staged (rows, C) planes
        self._plane_im: list[np.ndarray] = []
        self._plane_rows = 0
        self._consumed = 0
        # Raw-input tail for the kernel handoff under a matched filter: the
        # kernel filters in-kernel, so its window carry holds RAW samples,
        # which the FF warm-up carry does not keep (it stores the filtered
        # window).  Tracked host-side from the staged blocks.
        self._raw_tail = np.zeros((channels, 0), np.complex64)
        self.assembler = BankAssembler(cfg, skip_debug=not debug_ports)
        self.metrics = EngineMetrics()
        self._make_guard_fns()

    def _make_warm_fn(self, cfg: DemodConfig):
        import functools

        return jax.jit(jax.vmap(functools.partial(self._warm_ops.block,
                                                  cfg)))

    def _handoff(self, raw):
        """Warm-up -> steady-kernel carry conversion (hook for subclasses)."""
        return self._full_mod.full_from_ff(self.cfg, self._warm_state,
                                           raw_win=raw)

    def _fresh_planes(self, planes: jnp.ndarray) -> jnp.ndarray:
        """Reset value for a guarded channel's state-plane column (hook:
        the mixed engine re-writes its per-channel mode rows)."""
        return jnp.zeros_like(planes)

    def _make_guard_fns(self):
        """(Re)build the jitted guard closures; called at construction and
        after configure() so they never retain a stale config (the
        BatchEngine ADVICE-round fix, applied here from the start)."""
        if not self.guard_nonfinite:
            self._guard_full_jit = self._guard_warm_jit = None
            return
        self._guard_full_jit = jax.jit(self._guard_full)

        def guard_warm(state, out):
            bad = ~jnp.all(jnp.isfinite(out.soft.real)
                           & jnp.isfinite(out.soft.imag)
                           & jnp.isfinite(out.phase), axis=-1)    # (C,)
            fresh = self._warm_ops.init(self.cfg, (self.channels,))

            def pick(new, old):
                b = bad.reshape(bad.shape + (1,) * (old.ndim - 1))
                return jnp.where(b, new, old)

            return jax.tree_util.tree_map(pick, fresh, state), bad

        self._guard_warm_jit = jax.jit(guard_warm)

    def _note_bad(self, bad) -> None:
        nbad = np.asarray(bad)
        if nbad.any():
            self.channel_resyncs[nbad] += 1
            self.metrics.resets += int(nbad.sum())

    def _guard_full(self, state, soft_re, soft_im, phase):
        """Per-channel drop-and-resync on the steady kernel carry: zero the
        poisoned channel's window + state planes; it re-converges within
        numAvg + phaseAvg symbols (accepted-data-loss recovery, SURVEY
        section 5 -- the per-channel analogue of the reference's
        queue-flush reset, cpp/psk_soft.cpp:353-357)."""
        bad = ~jnp.all(jnp.isfinite(soft_re) & jnp.isfinite(soft_im)
                       & jnp.isfinite(phase), axis=0)             # (C,)
        state2 = type(state)(
            win_re=jnp.where(bad[None, :],
                             jnp.zeros_like(state.win_re), state.win_re),
            win_im=jnp.where(bad[None, :],
                             jnp.zeros_like(state.win_im), state.win_im),
            planes=jnp.where(bad[None, :],
                             self._fresh_planes(state.planes), state.planes),
        )
        return state2, bad

    def _materialize_state(self):
        """Re-attach the window planes (sliced from the previous block) to
        _full_state after rolling steps made them stale."""
        keep = (self.cfg.num_avg - 1) * self.cfg.sps
        pr, pi = self._prev_planes
        self._win_stale = False
        return self._full_state._replace(
            win_re=pr[pr.shape[0] - keep:], win_im=pi[pi.shape[0] - keep:])

    @property
    def full_state(self):
        """The current steady-kernel carry as a standard FullState (None
        during warm-up).  Materializes the window from the rolling-path
        planes when needed -- use this (not _full_state) for checkpointing."""
        if self._full_state is not None and self._win_stale:
            self._full_state = self._materialize_state()
        return self._full_state

    def restore_full_state(self, state) -> None:
        """Resume the steady kernel from a checkpointed FullState
        (utils.checkpoint.load_state): the mid-stream restart story the
        reference lacks entirely (SURVEY section 5 checkpoint/resume --
        a reference restart re-converges blind over numAvg*sps samples).
        Pair with the ``full_state`` property on the saving side."""
        rows = (self.cfg.num_avg - 1) * self.cfg.sps + (
            max(self.cfg.mf_ntaps - 1, 0)
            if self.cfg.matched_filter != "none" else 0)
        if state.win_re.shape != (rows, self.channels):
            raise ValueError(
                f"state window is {state.win_re.shape}, engine needs "
                f"{(rows, self.channels)} (config/channel mismatch)")
        # Discard any in-flight stream state from before the restore --
        # staged samples, pipelined blocks and the assembler clock belong
        # to the OLD stream and must not mix with the resumed one.
        self._pending.clear()
        self._held.clear()
        self._staging = [np.zeros(0, np.complex64)
                         for _ in range(self.channels)]
        self._plane_re, self._plane_im, self._plane_rows = [], [], 0
        self._raw_tail = np.zeros((self.channels, 0), np.complex64)
        self.assembler.reset()
        self._full_state = state
        self._warm_state = None
        self._consumed = self.cfg.num_avg + self.cfg.phase_avg
        self._prev_planes = None
        self._roll_fn = None
        self._roll_ok = None
        self._win_stale = False

    def _steady_step(self, x_re, x_im):
        """One steady kernel block.  Uses the rolling-window kernel mode
        when eligible (same-shape consecutive blocks, no matched filter, no
        per-channel guard); otherwise the standard window-carry path."""
        import functools

        roll = (not self.guard_nonfinite and self._roll_ok is not False
                and self._prev_planes is not None
                and self._prev_planes[0].shape == x_re.shape
                and self._prev_planes[0].dtype == x_re.dtype)
        if roll:
            if self._roll_fn is None:
                self._roll_fn = jax.jit(functools.partial(
                    self._full_mod.demod_block_full_rolling, self.cfg,
                    **self._full_kwargs))
            try:
                planes, fo = self._roll_fn(self._full_state.planes,
                                           *self._prev_planes, x_re, x_im)
            except ValueError as e:
                # Expected for configs the rolling DMA cannot serve
                # (unaligned window / concat path); anything else still
                # surfaces here, so record why before falling back.
                logger.info("rolling-window mode unavailable, using the "
                            "window-carry path: %s", e)
                self._roll_ok = False
            else:
                self._roll_ok = True
                self._full_state = self._full_state._replace(planes=planes)
                self._win_stale = True
                self._prev_planes = (x_re, x_im)
                return fo
        if self._win_stale:
            self._full_state = self._materialize_state()
        self._full_state, fo = self._full_fn(self._full_state, x_re, x_im)
        self._prev_planes = (x_re, x_im)
        return fo

    @property
    def _raw_keep(self) -> int:
        if self.cfg.matched_filter == "none":
            return 0
        return (self.cfg.num_avg - 1) * self.cfg.sps + self.cfg.mf_ntaps - 1

    def _track_raw(self, x: np.ndarray) -> None:
        keep = self._raw_keep
        if not keep:
            return
        cat = np.concatenate([self._raw_tail, x], axis=1)
        self._raw_tail = cat[:, max(0, cat.shape[1] - keep):]

    @property
    def steady(self) -> bool:
        return self._full_state is not None

    def configure(self, new_cfg: DemodConfig) -> None:
        """Live property change on the flagship engine (C7 resync semantics,
        cpp/psk_soft.cpp:638-651).

        The fused-kernel carry is converted back to the feed-forward layout
        (models/full.ff_from_full), resynced with the standard C7 rules
        (reconfigure_ff: timing window re-binned/truncated, phase history
        carried or cleared), and the engine re-warms on the flexible path
        before handing back to the kernel -- tracking survives compatible
        changes, exactly like StreamEngine.configure.
        """
        import functools

        if new_cfg == self.cfg:
            return
        logger.debug("full-kernel reconfigure: %s -> %s", self.cfg, new_cfg)
        self._drain_pending()
        if self._full_state is not None and self._win_stale:
            self._full_state = self._materialize_state()
        self._prev_planes = None
        self._roll_fn = None
        self._roll_ok = None
        if self._full_state is not None:
            if self._ingest_scale is not None:
                self._full_state = self._full_mod.dequantize_full_state(
                    self._full_state, self._ingest_scale)
            if self.cfg.matched_filter != "none":
                # Kernel window rows are raw input: seed the raw tail so the
                # next steady handoff has its history.
                wr = np.asarray(self._full_state.win_re)
                wi = np.asarray(self._full_state.win_im)
                self._raw_tail = np.ascontiguousarray(
                    (wr + 1j * wi).T.astype(np.complex64))
            ff = self._full_mod.ff_from_full(self.cfg, self._full_state)
            self._full_state = None
        else:
            ff = self._warm_state
        self._warm_state = reconfigure_ff(self.cfg, new_cfg, ff)
        self.cfg = new_cfg
        self._warm_fn = self._make_warm_fn(new_cfg)
        self._full_fn = jax.jit(functools.partial(
            self._full_mod.demod_block_full, new_cfg, **self._full_kwargs))
        self._make_guard_fns()
        # Conservatively re-run the warm-up gate: a resync may leave
        # partially-filled windows that the steady kernel cannot represent.
        self._consumed = 0
        self.assembler.reconfigure(new_cfg)
        self.metrics.reconfigures += 1

    def reset(self) -> None:
        """Full state reset (the resetState property / queue-flush answer)."""
        self._warm_state = self._warm_ops.init(self.cfg, (self.channels,))
        self._full_state = None
        self._prev_planes = None
        self._win_stale = False
        self._staging = [np.zeros(0, np.complex64)
                         for _ in range(self.channels)]
        self._plane_re = []
        self._plane_im = []
        self._plane_rows = 0
        self._consumed = 0
        self._raw_tail = np.zeros((self.channels, 0), np.complex64)
        self._pending.clear()
        self._held.clear()
        self.assembler.reset()
        self.metrics.resets += 1

    def set_input_sri(self, sri: SRI, t: float = 0.0) -> None:
        self.assembler.set_sri(sri, t)

    def push(self, channel: int, data: np.ndarray) -> None:
        if self._plane_rows:
            raise ValueError("engine is in plane-ingest mode (push_planes); "
                             "per-channel push would interleave streams")
        self._staging[channel] = np.concatenate(
            [self._staging[channel], np.asarray(data, np.complex64).ravel()])
        self.metrics.samples_in += data.size

    def push_planes(self, re: np.ndarray, im: np.ndarray) -> None:
        """Time-major (rows, C) re/im plane append -- the native plane
        bank's output (runtime/native_bank.NativePlaneBank) and the fused
        kernel's exact input layout, so the steady path uploads with ZERO
        host transposes.  float32 planes, or int16 wire planes when the
        engine was built with ``ingest_scale``."""
        if not isinstance(re, jax.Array):
            re = np.asarray(re)
            im = np.asarray(im)
        if re.shape != im.shape or re.ndim != 2 or re.shape[1] != self.channels:
            raise ValueError(f"expected (rows, {self.channels}) planes")
        if re.dtype == np.int16:
            if self._ingest_scale is None:
                raise ValueError("int16 planes need ingest_scale at "
                                 "construction")
        elif re.dtype != np.float32:
            raise ValueError(f"planes must be float32 or int16, got "
                             f"{re.dtype}")
        if any(s.size for s in self._staging):
            raise ValueError("engine already has per-channel staged data; "
                             "plane and channel pushes cannot mix")
        self._plane_re.append(re)
        self._plane_im.append(im)
        self._plane_rows += re.shape[0]
        self.metrics.samples_in += re.size

    def _take_plane_rows(self, rows: int):
        """Pop `rows` rows from the plane staging as contiguous planes."""
        take_re, take_im, got = [], [], 0
        while got < rows:
            r, i = self._plane_re[0], self._plane_im[0]
            need = rows - got
            if r.shape[0] <= need:
                take_re.append(r)
                take_im.append(i)
                got += r.shape[0]
                self._plane_re.pop(0)
                self._plane_im.pop(0)
            else:
                take_re.append(r[:need])
                take_im.append(i[:need])
                self._plane_re[0] = r[need:]
                self._plane_im[0] = i[need:]
                got = rows
        self._plane_rows -= rows
        if len(take_re) == 1:
            if isinstance(take_re[0], jax.Array):
                # device-resident planes (e.g. straight from the resampler)
                # flow through without a host round trip; the steady step's
                # jnp.asarray is then the identity
                return take_re[0], take_im[0]
            return (np.ascontiguousarray(take_re[0]),
                    np.ascontiguousarray(take_im[0]))
        return (np.concatenate([np.asarray(a) for a in take_re], axis=0),
                np.concatenate([np.asarray(a) for a in take_im], axis=0))

    def _planes_to_cmajor(self, re, im) -> np.ndarray:
        """Channel-major complex view of a plane block (warm-up path only;
        the steady kernel consumes the planes directly)."""
        # host numpy on purpose: eager complex arithmetic on device arrays
        # would upload a complex scalar, which poisons the axon session
        # (utils/transfer.py notes)
        re, im = np.asarray(re), np.asarray(im)
        if re.dtype == np.int16:
            s = self._ingest_scale
            return ((re.T.astype(np.float32) * s)
                    + 1j * (im.T.astype(np.float32) * s)).astype(np.complex64)
        return (re.T + 1j * im.T).astype(np.complex64)

    def ready(self) -> bool:
        need = self.block_symbols * self.cfg.sps
        if self._plane_rows:
            return self._plane_rows >= need
        return all(s.size >= need for s in self._staging)

    def _step_core(self):
        """One block: warm-up returns channel-major DemodOutputs; the
        steady kernel returns raw TMOutputs (time-major planes, fetched and
        converted only by whichever surface consumes them)."""
        from ..utils.transfer import to_device

        if not self.ready():
            return None
        need = self.block_symbols * self.cfg.sps
        plane_blk = None
        if self._plane_rows:
            plane_blk = self._take_plane_rows(need)
            x = None
        else:
            x = np.stack([s[:need] for s in self._staging])
            self._staging = [s[need:] for s in self._staging]
        self._consumed += self.block_symbols
        if self._full_state is None:
            if plane_blk is not None:
                x = self._planes_to_cmajor(*plane_blk)
            self._track_raw(x)
            self._warm_state, out = self._warm_fn(self._warm_state,
                                                  to_device(x))
            if self._guard_warm_jit is not None:
                self._warm_state, bad = self._guard_warm_jit(
                    self._warm_state, out)
                self._note_bad(bad)
            if (self._consumed >= self.cfg.num_avg + self.cfg.phase_avg
                    and self._raw_tail.shape[1] >= self._raw_keep):
                raw = (self._raw_tail if self._raw_keep else None)
                self._full_state = self._handoff(raw)
                if self._ingest_scale is not None:
                    self._full_state = self._full_mod.quantize_full_state(
                        self._full_state, self._ingest_scale)
                self._warm_state = None
                self._raw_tail = np.zeros((self.channels, 0), np.complex64)
        else:
            if plane_blk is not None:
                x_re = jnp.asarray(plane_blk[0])    # no transpose, no split
                x_im = jnp.asarray(plane_blk[1])
            else:
                x_re = jnp.asarray(np.ascontiguousarray(x.real.T))
                x_im = jnp.asarray(np.ascontiguousarray(x.imag.T))
            fo = self._steady_step(x_re, x_im)
            if self._guard_full_jit is not None:
                phase = fo.phase if fo.phase is not None else fo.soft_re
                self._full_state, bad = self._guard_full_jit(
                    self._full_state, fo.soft_re, fo.soft_im, phase)
                self._note_bad(bad)
            out = TMOutputs(fo=fo, soft_scale=self._soft_scale)
        if self._pipe_depth == 0:
            nv = self._count_symbols(out)
            self.metrics.symbols_out += nv
            self.metrics.bits_out += nv * self.assembler.cfg.bits_per_symbol
        return out

    def _count_symbols(self, out) -> int:
        if isinstance(out, TMOutputs):
            sv = (int(out.valid_rows.sum()) if out.valid_rows is not None
                  else out.fo.bits_packed.shape[0])
            return sv * self.channels
        return int(np.asarray(out.valid).sum())

    def _to_cmajor(self, out):
        """TMOutputs -> channel-major DemodOutputs (the step()/flush()
        array surface; the packet surface consumes TMOutputs directly)."""
        if not isinstance(out, TMOutputs):
            return out
        # Mixed high-order banks widen the bit planes past the shared cfg's
        # width; the assembler cfg carries the port layout either way.
        do = self._full_mod.to_demod_outputs(self.assembler.cfg, out.fo,
                                             soft_i8_scale=out.soft_scale)
        if out.valid_rows is not None:
            do = do._replace(
                valid=do.valid & jnp.asarray(out.valid_rows)[None, :])
        return do

    def step(self):
        """Returns channel-major DemodOutputs (via the adapter) or None."""
        return self._to_cmajor(self._step_core())

    def _step_for_packets(self):
        return self._step_core()

    def _flush_for_packets(self):
        return self._flush_core()

    def flush(self):
        """EOS drain (channel-major DemodOutputs surface)."""
        return self._to_cmajor(self._flush_core())

    def _flush_core(self):
        """EOS drain.  Before the steady handoff the flexible path handles
        any length; afterwards the remainder is zero-padded to a full block
        through the kernel and outputs whose timing window reaches into the
        padding are masked invalid (the reference never emits those symbols
        either, cpp/psk_soft.cpp:457)."""
        from ..utils.transfer import to_device

        sps, num_avg = self.cfg.sps, self.cfg.num_avg
        plane_blk = None
        if self._plane_rows:
            n = (self._plane_rows // sps) * sps
            plane_blk = self._take_plane_rows(n) if n else None
            self._plane_re, self._plane_im, self._plane_rows = [], [], 0
            x = None
        else:
            n = (min(s.size for s in self._staging) // sps) * sps
            x = np.stack([s[:n] for s in self._staging]) if n else None
        self._staging = [np.zeros(0, np.complex64)
                         for _ in range(self.channels)]
        if n == 0:
            return None
        if self._full_state is None:
            if plane_blk is not None:
                x = self._planes_to_cmajor(*plane_blk)
            self._warm_state, out = self._warm_fn(self._warm_state,
                                                  to_device(x))
        else:
            nsym = n // sps
            pad = self.block_symbols * sps - n
            if plane_blk is not None:
                x_re = jnp.asarray(np.pad(plane_blk[0], ((0, pad), (0, 0))))
                x_im = jnp.asarray(np.pad(plane_blk[1], ((0, pad), (0, 0))))
            else:
                xp = np.pad(x, ((0, 0), (0, pad)))
                x_re = jnp.asarray(np.ascontiguousarray(xp.real.T))
                x_im = jnp.asarray(np.ascontiguousarray(xp.imag.T))
            fo = self._steady_step(x_re, x_im)
            # Output o's window covers carry rows [o, o+numAvg-1]; with a
            # full carry (steady) plus nsym real new rows, windows are fully
            # real for o < nsym -- exactly the outputs the reference would
            # still emit before the stream ends.  A matched filter looks
            # mf_ntaps-1 raw samples ahead, so its last ceil((L-1)/sps)
            # symbols also touch the padding and are masked.
            nvalid = nsym
            if self.cfg.matched_filter != "none":
                nvalid = max(0, nsym - (-(-(self.cfg.mf_ntaps - 1)
                                          // self.cfg.sps)))
            mask = np.zeros(self.block_symbols, bool)
            mask[:nvalid] = True
            out = TMOutputs(fo=fo, valid_rows=mask,
                            soft_scale=self._soft_scale)
        if self._pipe_depth == 0:
            nv = self._count_symbols(out)
            self.metrics.symbols_out += nv
            self.metrics.bits_out += nv * self.assembler.cfg.bits_per_symbol
        return out


class MixedKernelBatchEngine(FullKernelBatchEngine):
    """BASELINE config 4 in production: ONE fused kernel demodulates a
    heterogeneous (M, differential) bank -- per-channel modes live in the
    carry's mode planes (demod_kernel mixed mode), so a 1024-channel
    BPSK/QPSK/8-PSK mix costs one kernel launch instead of one bucketed
    launch per mode (compare GroupEngine, which buckets and is still
    required when sps/numAvg/phaseAvg themselves differ).

    Inherits the whole FullKernelBatchEngine surface: plane ingest
    (push_planes, int16 wire via ingest_scale), pipelined packets, flush/
    reset, live configure().  The shared config's constellation_size/
    differential are ignored (per-channel params rule); packet assembly
    uses the 3-bit port layout for every channel (consumers mask with
    ``params.bits_per_symbol``), since one bank packet cannot carry
    per-channel bit rates.

    ``set_params`` is the per-channel analogue of the reference's
    constellation-change listener (cpp/psk_soft.cpp:643-646 semantics,
    applied per channel): channels whose M changed get their phase history
    force-cleared; differential-only changes keep tracking (the reference
    registers no listener on differentialDecoding).
    """

    def __init__(self, params, cfg: DemodConfig, channels: int,
                 block_symbols: int = 512, s_tile: int = 256,
                 interpret: bool = False, pipeline_depth: int = 0,
                 ingest_scale: float | None = None,
                 guard_nonfinite: bool = False,
                 debug_ports: bool = True,
                 soft_i8: bool = False, soft_i8_scale: float = 100.0):
        import dataclasses

        from ..models.mixed import MixedParams

        self.params = MixedParams.make(np.asarray(params.m),
                                       np.asarray(params.diff))
        if np.asarray(self.params.m).shape != (channels,):
            raise ValueError(f"params must carry {channels} channel modes")
        super().__init__(cfg, channels, block_symbols=block_symbols,
                         s_tile=s_tile, interpret=interpret,
                         pipeline_depth=pipeline_depth,
                         ingest_scale=ingest_scale,
                         guard_nonfinite=guard_nonfinite,
                         debug_ports=debug_ports,
                         soft_i8=soft_i8, soft_i8_scale=soft_i8_scale)
        self._full_kwargs["mixed"] = True
        import functools
        self._full_fn = jax.jit(functools.partial(
            self._full_mod.demod_block_full, cfg, **self._full_kwargs))
        # Uniform bit-plane port layout for the heterogeneous bank: wide
        # enough for the bank's largest M (3 planes for {2,4,8} banks,
        # 4/5 when 16/32-PSK channels are present).
        self.assembler = BankAssembler(
            dataclasses.replace(cfg,
                                constellation_size=1 << self.params.max_bits,
                                differential=False),
            skip_debug=not debug_ports)

    def _make_warm_fn(self, cfg: DemodConfig):
        from ..models.mixed import make_mixed_demod_fn

        fn = make_mixed_demod_fn(cfg, max_bits=self.params.max_bits)
        return lambda st, x: fn(self.params, st, x)

    def configure(self, new_cfg: DemodConfig) -> None:
        """Shared-property change; the port layout stays as wide as the
        bank's largest M (the base configure narrows the assembler to the
        shared cfg, which a 16/32-PSK bank must override)."""
        import dataclasses

        super().configure(new_cfg)
        self.assembler.reconfigure(dataclasses.replace(
            new_cfg, constellation_size=1 << self.params.max_bits,
            differential=False))

    def _handoff(self, raw):
        return self._full_mod.full_from_ff(self.cfg, self._warm_state,
                                           raw_win=raw,
                                           mixed_params=self.params)

    def _fresh_planes(self, planes: jnp.ndarray) -> jnp.ndarray:
        """Guarded channels restart with ZEROED tracking but their
        per-channel mode rows intact (losing the mode would silently turn
        a poisoned 8-PSK channel into BPSK)."""
        from ..ops.phase import UNWRAP_TREND_LEN

        misc = (self.cfg.phase_avg - 1) + 2 * (UNWRAP_TREND_LEN - 1)
        z = jnp.zeros_like(planes)
        z = z.at[misc + 6].set(jnp.asarray(self.params.m, planes.dtype))
        z = z.at[misc + 7].set(jnp.asarray(self.params.diff, planes.dtype))
        return z

    def set_params(self, new_params) -> None:
        """Live per-channel mode change (C7, per channel)."""
        from ..models.mixed import MixedParams

        new = MixedParams.make(np.asarray(new_params.m),
                               np.asarray(new_params.diff))
        if np.asarray(new.m).shape != (self.channels,):
            raise ValueError(f"params must carry {self.channels} modes")
        old_m = np.asarray(self.params.m)
        self._drain_pending()
        if self._full_state is not None and self._win_stale:
            self._full_state = self._materialize_state()
        self._prev_planes = None
        self._roll_fn = None
        self._roll_ok = None
        if self._full_state is not None:
            if self._ingest_scale is not None:
                self._full_state = self._full_mod.dequantize_full_state(
                    self._full_state, self._ingest_scale)
            if self.cfg.matched_filter != "none":
                wr = np.asarray(self._full_state.win_re)
                wi = np.asarray(self._full_state.win_im)
                self._raw_tail = np.ascontiguousarray(
                    (wr + 1j * wi).T.astype(np.complex64))
            ff = self._full_mod.ff_from_full(self.cfg, self._full_state)
            self._full_state = None
        else:
            ff = self._warm_state
        changed = (old_m != np.asarray(new.m))
        if changed.any():
            hist = np.asarray(ff.phase_hist).copy()
            hist[changed] = 0.0
            ff = ff._replace(
                phase_hist=jnp.asarray(hist),
                phase_count=jnp.asarray(np.where(
                    changed, 0, np.asarray(ff.phase_count)).astype(np.int32)),
                last_phase=jnp.asarray(np.where(
                    changed, 0.0, np.asarray(ff.last_phase)).astype(
                        np.float32)))
        self.params = new
        self._warm_state = ff
        self._warm_fn = self._make_warm_fn(self.cfg)  # rebinds params
        self._make_guard_fns()                        # guard rebinds modes
        self._consumed = 0                            # re-run the warm gate
        self.metrics.reconfigures += 1


class GroupEngine:
    """Heterogeneous channel bank: buckets channels by config (notably sps,
    whose symbol cadence cannot batch) into BatchEngines.

    The reference would run one component process per configuration; here
    each distinct config gets one compiled batched step, and channels map to
    (group, slot).
    """

    def __init__(self, channel_cfgs: list[DemodConfig],
                 block_symbols: int = 512, pipeline: str = "ff",
                 pipeline_depth: int = 0):
        groups: dict[DemodConfig, list[int]] = {}
        for ch, cfg in enumerate(channel_cfgs):
            groups.setdefault(cfg, []).append(ch)
        self.groups = []
        self.slot_of = {}
        for cfg, members in groups.items():
            eng = BatchEngine(cfg, channels=len(members),
                              block_symbols=block_symbols, pipeline=pipeline,
                              pipeline_depth=pipeline_depth)
            gi = len(self.groups)
            self.groups.append((cfg, members, eng))
            for slot, ch in enumerate(members):
                self.slot_of[ch] = (gi, slot)

    def push(self, channel: int, data: np.ndarray) -> None:
        gi, slot = self.slot_of[channel]
        self.groups[gi][2].push(slot, data)

    def set_input_sri(self, sri: SRI, t: float = 0.0) -> None:
        """Bank-wide input SRI for the packet-assembly layer (each group's
        output SRIs rescale by its own config's rates)."""
        for _, _, eng in self.groups:
            eng.set_input_sri(sri, t)

    def step_all_packets(self) -> dict[int, dict[str, Packet]]:
        """step_all + L2 packet assembly, per group: {group_index: {port:
        Packet}} (each group is one lockstep bank with its own SRI clock;
        `self.groups[gi][1]` lists its channel numbers)."""
        results = {}
        for gi, (_, _, eng) in enumerate(self.groups):
            pkts = eng.step_packets()
            if pkts is not None:
                results[gi] = pkts
        return results

    def flush_all_packets(self) -> dict[int, dict[str, Packet]]:
        """EOS drain with assembly on every group."""
        return {gi: eng.flush_packets()
                for gi, (_, _, eng) in enumerate(self.groups)}

    def step_all(self) -> dict[int, object]:
        """Step every ready group; returns {channel: per-channel outputs}."""
        results = {}
        for cfg, members, eng in self.groups:
            out = eng.step()
            if out is None:
                continue
            for slot, ch in enumerate(members):
                results[ch] = jax.tree_util.tree_map(lambda a: a[slot], out)
        return results

    def configure(self, channel_cfgs: list[DemodConfig]) -> None:
        """Live property change across the bank (C7 passthrough).

        The channel->group partition must be preserved: every channel of a
        group must move to the same new config (each group is one compiled
        batched step).  A partition-changing reconfigure needs a rebuilt
        GroupEngine -- raised explicitly rather than silently rebucketing,
        which would discard converged per-channel carries.
        """
        if len(channel_cfgs) != len(self.slot_of):
            raise ValueError(f"expected {len(self.slot_of)} configs, got "
                             f"{len(channel_cfgs)}")
        new_groups = []
        for gi, (cfg, members, eng) in enumerate(self.groups):
            cfgs = {channel_cfgs[ch] for ch in members}
            if len(cfgs) != 1:
                raise ValueError(
                    f"reconfigure splits group {gi} (channels {members}); "
                    f"rebuild the GroupEngine for partition changes")
            (new_cfg,) = cfgs
            eng.configure(new_cfg)
            new_groups.append((new_cfg, members, eng))
        self.groups = new_groups

    def flush_all(self) -> dict[int, object]:
        """EOS drain of every group (BatchEngine.flush passthrough)."""
        results = {}
        for cfg, members, eng in self.groups:
            out = eng.flush()
            if out is None:
                continue
            for slot, ch in enumerate(members):
                results[ch] = jax.tree_util.tree_map(lambda a: a[slot], out)
        return results

    def reset(self) -> None:
        """Full state reset of every group (resetState semantics)."""
        for _, _, eng in self.groups:
            eng.reset()

    @property
    def port_stats(self) -> dict[str, PortStats]:
        """Bank-wide per-port statistics: groups' counters summed (each
        group records its own packet pushes)."""
        merged: dict[str, PortStats] = {}
        for _, _, eng in self.groups:
            for port, s in eng.port_stats.items():
                m = merged.get(port)
                if m is None:
                    merged[port] = m = PortStats()
                    m.last_t, m.last_wall, m._t0 = s.last_t, s.last_wall, s._t0
                m.packets += s.packets
                m.items += s.items
                m.bytes += s.bytes
                m.eos_count += s.eos_count
                m.last_t = max(m.last_t, s.last_t)
                m.last_wall = max(m.last_wall, s.last_wall)
                m._t0 = min(m._t0, s._t0)
        return merged
