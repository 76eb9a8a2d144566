"""Streaming frame synchronizer wrapped around the bank engines.

Extension beyond the reference (see ops/framesync.py): detects unique-word
frame starts in the demodulated soft stream, resolves the M-fold carrier
ambiguity per frame, and emits aligned, derotated, re-sliced payloads.
Follows the QualityMonitor wrapper contract (runtime/quality.py): taps
``step_packets``/``flush_packets`` soft payloads, everything else delegates
to the wrapped engine.

Streaming is EXACTLY one-shot detection: the local-max peak criterion
(ops/framesync.detect_peaks) depends only on a bounded neighborhood of the
detection statistic, so the syncer holds back just enough lookahead
(``sep - 1`` correlation lags, i.e. ``sep + uw - 2`` symbols) plus the
payload span before committing a frame start, and carries a bounded
(C, ~frame+sep) soft tail across blocks -- no re-detection, no duplicates,
identical frames for any block split (gated in tests/test_framesync.py).
The device correlation re-runs over the short retained tail plus the new
block; the heavy work stays one jitted launch per block.
"""

from __future__ import annotations

import numpy as np

from ..ops.framesync import (Frame, FrameFormat, correlate_uw,
                             detect_peaks, resolve_rotation)
from ..ops import slicers
from .streams import PORT_SOFT


class FrameSyncer:
    """UW frame sync on a bank's soft-decision stream.

    Args:
      engine: wrapped bank engine (or wrapper stack), or an int channel
        count for standalone use via :meth:`observe`.
      fmt: frame format (UW indices, payload length, M, threshold).
      max_frames: ring limit on buffered frames (oldest dropped, counted
        in ``dropped_frames``) so an unserviced syncer cannot grow
        unboundedly.
    """

    def __init__(self, engine, fmt: FrameFormat, max_frames: int = 4096):
        if isinstance(engine, int):
            self.engine = None
            self._channels = engine
        else:
            self.engine = engine
            self._channels = engine.channels
        self.fmt = fmt
        self.max_frames = int(max_frames)
        # Emit peak t only once norm[t .. t+sep-1] is final AND the payload
        # is present: lookahead = max(frame span, detection window span).
        self._need_after = max(fmt.frame_len,
                               fmt.separation + fmt.uw_len - 1)
        # Left context so future peaks' look-back windows stay intact.
        self._keep_back = fmt.separation - 1
        self._buf = np.zeros((self._channels, 0), np.complex64)
        self._base = 0          # absolute symbol index of buf[:, 0]
        self._next_scan = 0     # first absolute start not yet committed
        self.frames: list[Frame] = []
        self.dropped_frames = 0
        self.frames_synced = 0

    # -- core ----------------------------------------------------------------

    def observe(self, soft: np.ndarray) -> list[Frame]:
        """Fold one (C, S) soft block; returns frames committed by it."""
        soft = np.asarray(soft, np.complex64)
        if soft.ndim != 2 or soft.shape[0] != self._channels:
            raise ValueError(f"expected ({self._channels}, S) soft block; "
                             f"got {soft.shape}")
        self._buf = np.concatenate([self._buf, soft], axis=1)
        new = self._scan()
        self._trim()
        return self._commit(new)

    def _commit(self, new: list[Frame]) -> list[Frame]:
        if new:
            self.frames_synced += len(new)
            self.frames.extend(new)
            excess = len(self.frames) - self.max_frames
            if excess > 0:
                del self.frames[:excess]
                self.dropped_frames += excess
        return new

    def _scan(self, hi: int | None = None) -> list[Frame]:
        l = self._buf.shape[1]
        if hi is None:
            hi = l - self._need_after      # inclusive last committable t
        lo = self._next_scan - self._base
        if hi < lo or l < self.fmt.uw_len:
            return []
        fmt = self.fmt
        from ..utils.transfer import to_device, to_host
        corr, norm = to_host(correlate_uw(self._buf, fmt.points))
        peaks = detect_peaks(norm, fmt.threshold, fmt.separation)
        nb = int(np.log2(fmt.m))
        heads = [(c, int(t)) for c, ts in enumerate(peaks)
                 for t in ts[(ts >= lo) & (ts <= hi)]]
        self._next_scan = self._base + hi + 1
        if not heads:
            return []
        ks, ress, payloads = [], [], []
        for c, t in heads:
            k, res = resolve_rotation(corr[c, t], fmt.m)
            derot = np.exp(-2j * np.pi * int(k) / fmt.m
                           ).astype(np.complex64)
            ks.append(int(k))
            ress.append(float(res))
            payloads.append(self._buf[c, t + fmt.uw_len: t + fmt.frame_len]
                            * derot)
        pm = np.asarray(payloads, np.complex64).reshape(len(heads),
                                                        fmt.payload)
        bits3 = np.asarray(slicers.slice_bits(fmt.m, to_device(pm)))
        bits = bits3[:, :, :nb].reshape(len(heads), -1).astype(np.int8)
        return [Frame(channel=c, start=self._base + t, rotation=ks[i],
                      corr=float(norm[c, t]), residual_phase=ress[i],
                      soft=pm[i], bits=bits[i])
                for i, (c, t) in enumerate(heads)]

    def _trim(self) -> None:
        keep_from = self._next_scan - self._base - self._keep_back
        if keep_from > 0:
            self._buf = self._buf[:, keep_from:]
            self._base += keep_from

    # -- engine surface --------------------------------------------------------

    def _tap(self, pkts):
        if pkts:
            soft = pkts.get(PORT_SOFT)
            if soft is not None and soft.data.size:
                self.observe(soft.data)
        return pkts

    def step_packets(self):
        return self._tap(self.engine.step_packets())

    def flush_packets(self):
        pkts = self._tap(self.engine.flush_packets())
        self.finalize()
        return pkts

    def finalize(self) -> list[Frame]:
        """End of stream: commit frames in the held-back tail whose payload
        is fully present (right detection windows see the stream edge,
        matching one-shot extraction on the whole stream)."""
        new = self._scan(hi=self._buf.shape[1] - self.fmt.frame_len)
        self._trim()
        return self._commit(new)

    def pop_frames(self) -> list[Frame]:
        """Drain and return all buffered frames."""
        out, self.frames = self.frames, []
        return out

    def reset(self) -> None:
        self.reset_sync()
        if self.engine is not None:
            self.engine.reset()

    def reset_sync(self) -> None:
        self._buf = np.zeros((self._channels, 0), np.complex64)
        self._base = 0
        self._next_scan = 0
        self.frames = []

    @property
    def channels(self) -> int:
        return self._channels

    def __getattr__(self, name):
        if self.engine is None:
            raise AttributeError(name)
        return getattr(self.engine, name)


class GroupFrameSyncer:
    """Per-channel frame formats over one bank (mixed-format banks).

    Mixed banks (models/mixed.py, MixedKernelBatchEngine) demodulate a
    heterogeneous (M, differential) channel mix in one kernel; their
    frame structure is naturally heterogeneous too.  This stage groups
    channels by format and runs one FrameSyncer per group over the
    channel-row slices of the tapped soft block -- each group keeps the
    single-format device correlation (one launch per group per block),
    and frames come back with bank-level channel indices.

    Args:
      engine: wrapped bank engine (or an int channel count for
        standalone ``observe``).
      fmts: per-channel formats, length = channels (channels sharing a
        format object form one group).
    """

    def __init__(self, engine, fmts, max_frames: int = 4096):
        if isinstance(engine, int):
            self.engine = None
            self._channels = engine
        else:
            self.engine = engine
            self._channels = engine.channels
        fmts = list(fmts)
        if len(fmts) != self._channels:
            raise ValueError(f"need one format per channel "
                             f"({self._channels}); got {len(fmts)}")
        groups: dict[int, list[int]] = {}
        uniq: list = []
        for c, fmt in enumerate(fmts):
            for gi, g_fmt in enumerate(uniq):
                if g_fmt is fmt or g_fmt == fmt:
                    groups[gi].append(c)
                    break
            else:
                uniq.append(fmt)
                groups[len(uniq) - 1] = [c]
        self.fmts = fmts
        self._rows = [np.asarray(groups[gi], np.int64)
                      for gi in range(len(uniq))]
        self._syncers = [FrameSyncer(len(rows), uniq[gi],
                                     max_frames=max_frames)
                         for gi, rows in enumerate(self._rows)]

    # -- core ----------------------------------------------------------------

    def observe(self, soft: np.ndarray) -> list[Frame]:
        soft = np.asarray(soft, np.complex64)
        if soft.ndim != 2 or soft.shape[0] != self._channels:
            raise ValueError(f"expected ({self._channels}, S) soft block; "
                             f"got {soft.shape}")
        out = []
        for rows, sync in zip(self._rows, self._syncers):
            for f in sync.observe(np.ascontiguousarray(soft[rows])):
                f.channel = int(rows[f.channel])
                out.append(f)
        return out

    def finalize(self) -> list[Frame]:
        out = []
        for rows, sync in zip(self._rows, self._syncers):
            for f in sync.finalize():
                f.channel = int(rows[f.channel])
                out.append(f)
        return out

    def pop_frames(self) -> list[Frame]:
        out = []
        for rows, sync in zip(self._rows, self._syncers):
            for f in sync.pop_frames():
                # observe/finalize already remapped committed frames; a
                # direct pop on a standalone group must remap too -- the
                # mapping is idempotent only when done once, so frames
                # drain through THIS object's pop, never the children's.
                out.append(f)
        out.sort(key=lambda f: (f.start, f.channel))
        return out

    @property
    def frames_synced(self) -> int:
        return sum(s.frames_synced for s in self._syncers)

    @property
    def dropped_frames(self) -> int:
        return sum(s.dropped_frames for s in self._syncers)

    def reset_sync(self) -> None:
        for s in self._syncers:
            s.reset_sync()

    def reset(self) -> None:
        self.reset_sync()
        if self.engine is not None:
            self.engine.reset()

    # -- engine surface --------------------------------------------------------

    def _tap(self, pkts):
        if pkts:
            soft = pkts.get(PORT_SOFT)
            if soft is not None and soft.data.size:
                self.observe(soft.data)
        return pkts

    def step_packets(self):
        return self._tap(self.engine.step_packets())

    def flush_packets(self):
        pkts = self._tap(self.engine.flush_packets())
        self.finalize()
        return pkts

    @property
    def channels(self) -> int:
        return self._channels

    def __getattr__(self, name):
        if self.engine is None:
            raise AttributeError(name)
        return getattr(self.engine, name)
