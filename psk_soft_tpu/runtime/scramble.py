"""Descrambling stages for the receive chain (see ops/scramble.py).

Two stages matching the two standard constructions:

- :class:`FrameDescrambler` -- frame-synchronous additive descrambling:
  wraps the frame layer (FrameSyncer or FecFrameDecoder); every popped
  frame's final bit payload (``info_bits`` when FEC decoded, else the
  raw sliced ``bits``) is XORed with the LFSR keystream re-seeded at the
  frame start.  All frames of a drain descramble in ONE GF(2)-matmul
  launch (ops/scramble.additive_scramble).
- :class:`StreamDescrambler` -- self-synchronizing multiplicative
  descrambling over a continuous per-channel bit stream: feed-forward
  taps with a max(taps)-bit history carry per channel, so streaming over
  any block split is identical to one-shot descrambling (the same carry
  discipline as every other streaming stage in the framework).
"""

from __future__ import annotations

import numpy as np

from ..ops.scramble import Lfsr, additive_scramble, selfsync_descramble


class FrameDescrambler:
    """Frame-synchronous additive descrambler behind the frame layer.

    Args:
      frames_src: a FrameSyncer / FecFrameDecoder (anything with
        ``pop_frames``); everything else delegates inward.
      lfsr: the keystream generator, re-seeded per frame.
    """

    def __init__(self, frames_src, lfsr: Lfsr):
        self.frames_src = frames_src
        self.lfsr = lfsr
        self.frames_descrambled = 0

    def pop_frames(self) -> list:
        frames = self.frames_src.pop_frames()
        if not frames:
            return frames
        use_info = frames[0].info_bits is not None
        mat = np.stack([f.info_bits if use_info else f.bits
                        for f in frames])
        out = np.asarray(additive_scramble(self.lfsr, mat)).astype(np.int8)
        for f, row in zip(frames, out):
            if use_info:
                f.info_bits = row
            else:
                f.bits = row
        self.frames_descrambled += len(frames)
        return frames

    def reset(self) -> None:
        self.frames_src.reset()

    def __getattr__(self, name):
        return getattr(self.frames_src, name)


class StreamDescrambler:
    """Self-synchronizing descrambler over (C, L) bit blocks.

    y[n] = x[n] ^ x[n-t1] ^ ... with an exact per-channel history carry:
    ``observe`` over any block split equals one-shot descrambling of the
    concatenated stream.  Bits before the stream start are taken as 0;
    after a ``reset`` (stream discontinuity) the first max(taps) outputs
    re-synchronize, which is the construction's point.
    """

    def __init__(self, channels: int, taps: tuple = (18, 23)):
        if min(taps) < 1:
            raise ValueError("tap delays must be >= 1")
        self.channels = int(channels)
        self.taps = tuple(int(t) for t in taps)
        self._d = max(self.taps)
        self._hist = np.zeros((self.channels, self._d), np.int8)

    def observe(self, bits: np.ndarray) -> np.ndarray:
        x = np.asarray(bits, np.int8)
        if x.ndim != 2 or x.shape[0] != self.channels:
            raise ValueError(f"expected ({self.channels}, L) bit block; "
                             f"got {x.shape}")
        xx = np.concatenate([self._hist, x], axis=1)
        y = np.asarray(selfsync_descramble(xx, self.taps))[:, self._d:]
        tail = xx[:, xx.shape[1] - self._d:]
        self._hist = np.ascontiguousarray(tail)
        return y.astype(np.int8)

    def reset(self) -> None:
        self._hist[:] = 0
