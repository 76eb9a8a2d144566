"""CRC integrity stage behind the frame layer (see ops/crc.py).

Wrapper contract like FrameDescrambler: drained frames' final bit
payloads (``info_bits`` when FEC decoded, else raw ``bits``) are split
into message || CRC, the CRC recomputed for the whole drain in ONE GF(2)
matmul launch, ``crc_ok`` set per frame and the CRC field stripped from
the payload.  Stacks outside the descrambler:

    FrameCrcChecker(FrameDescrambler(FecFrameDecoder(FrameSyncer(...))))

matching the TX order info -> append_crc -> scramble -> encode -> frame
(ops/tx.build_frame).
"""

from __future__ import annotations

import numpy as np

from ..ops.crc import CrcSpec, check_crc


class FrameCrcChecker:
    """Check + strip each frame's trailing CRC field.

    Args:
      frames_src: FrameSyncer / FecFrameDecoder / FrameDescrambler
        (anything with ``pop_frames``); everything else delegates inward.
      spec: the CRC (ops/crc presets: CRC16_CCITT / CRC32_MPEG2).
    """

    def __init__(self, frames_src, spec: CrcSpec):
        self.frames_src = frames_src
        self.spec = spec
        self.frames_checked = 0
        self.crc_failures = 0

    def pop_frames(self) -> list:
        frames = self.frames_src.pop_frames()
        if not frames:
            return frames
        use_info = frames[0].info_bits is not None
        mat = np.stack([f.info_bits if use_info else f.bits
                        for f in frames])
        msgs, ok = check_crc(self.spec, mat)
        for f, m, good in zip(frames, msgs, ok):
            if use_info:
                f.info_bits = m
            else:
                f.bits = m
            f.crc_ok = bool(good)
        self.frames_checked += len(frames)
        self.crc_failures += int((~ok).sum())
        return frames

    def reset(self) -> None:
        self.frames_src.reset()

    def __getattr__(self, name):
        return getattr(self.frames_src, name)
