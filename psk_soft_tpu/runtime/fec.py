"""FEC-decoding frame stage wrapped around the frame synchronizer.

Extension beyond the reference (see ops/fec.py): decodes the convolutional
code on every synchronized frame payload, turning the receive chain into
engine -> FrameSyncer -> FecFrameDecoder -> information bits.  Follows the
wrapper contract of the other runtime stages (everything not overridden
delegates inward); the syncer's ``pop_frames`` surface is preserved --
frames come back with ``info_bits`` filled in.

Batching strategy: frames drain in bursts (one per channel per frame slot),
so payloads are decoded in ONE Viterbi launch per drain, padded to
power-of-two batch buckets to bound jit cache growth (the trellis scan
dominates; padding rows are dead lanes the VPU processes for free).

Observability: the decoder re-encodes each decoded frame and counts
disagreements with the received hard decisions -- ``corrected`` per frame
(the channel-error count the code absorbed) and a cumulative
``errors_corrected`` across the stream; frames whose re-encode mismatch
exceeds the code's plausible correction span are flagged ``suspect``
(decoder ran out of distance -- payload should not be trusted).
"""

from __future__ import annotations

import numpy as np

from ..ops.fec import (CODE_K7, ConvCode, conv_encode, info_bits_for,
                       make_viterbi_fn, psk_llrs)


def _bucket(n: int) -> int:
    b = 1
    while b < n:
        b <<= 1
    return b


class FecFrameDecoder:
    """Viterbi-decode synchronized frame payloads.

    Args:
      syncer: a runtime.framesync.FrameSyncer (or compatible wrapper)
        whose frames carry derotated soft payloads.
      code: the convolutional code (default K=7 (171,133) rate 1/2).
      terminate: payloads end with K-1 zero flush bits (frame mode).
      suspect_fraction: flag a frame ``suspect`` when the re-encoded
        disagreement fraction exceeds this (0.08 ~ the hard-decision BER
        where the K=7 code's output starts failing).

    Payload contract: ``fmt.payload * log2(M)`` code bits must form a
    whole number of trellis steps (after depuncturing) with room for the
    flush bits -- validated at construction against the syncer's format.
    """

    def __init__(self, syncer, code: ConvCode = CODE_K7,
                 terminate: bool = True, suspect_fraction: float = 0.08):
        self.syncer = syncer
        self.code = code
        self.terminate = terminate
        self.suspect_fraction = float(suspect_fraction)
        fmt = syncer.fmt
        self._m = fmt.m
        self._nb = int(np.log2(fmt.m))
        self._code_bits = fmt.payload * self._nb
        # Shared TX/RX contract: divisibility + flush-room validation.
        self.info_bits = info_bits_for(code, self._code_bits, terminate)
        self._decode = make_viterbi_fn(code, terminate=terminate)
        self.frames_decoded = 0
        self.errors_corrected = 0
        self.suspect_frames = 0

    # -- decode --------------------------------------------------------------

    def decode_payloads(self, payloads: np.ndarray):
        """(N, payload) complex soft payloads -> (info, corrected).

        info: (N, info_bits) int8; corrected: (N,) int32 re-encode
        disagreement counts.  One padded launch per power-of-two bucket.
        """
        from ..utils.transfer import to_device, to_host

        payloads = np.ascontiguousarray(payloads, np.complex64)
        n = payloads.shape[0]
        if n == 0:
            return (np.zeros((0, self.info_bits), np.int8),
                    np.zeros(0, np.int32))
        b = _bucket(n)
        if b != n:
            payloads = np.concatenate(
                [payloads, np.zeros((b - n,) + payloads.shape[1:],
                                    np.complex64)])
        llr = psk_llrs(self._m, to_device(payloads))
        llr = llr.reshape(b, self._code_bits)
        info = self._decode(llr)
        # Corrected-error observability: re-encode and compare against the
        # received hard decisions (same launch group, all device work).
        reenc = conv_encode(self.code, info, terminate=self.terminate)
        hard = (llr < 0)
        corrected = (reenc.astype(bool) ^ hard).sum(axis=-1)
        info, corrected = to_host((info, corrected))
        return info[:n].astype(np.int8), corrected[:n].astype(np.int32)

    def _decode_frames(self, frames: list) -> list:
        if not frames:
            return frames
        info, corrected = self.decode_payloads(
            np.stack([f.soft for f in frames]))
        limit = self.suspect_fraction * self._code_bits
        for f, i, c in zip(frames, info, corrected):
            f.info_bits = i
            f.corrected = int(c)
            f.suspect = bool(c > limit)
            self.suspect_frames += f.suspect
        self.frames_decoded += len(frames)
        self.errors_corrected += int(corrected.sum())
        return frames

    # -- syncer surface --------------------------------------------------------

    def pop_frames(self) -> list:
        """Drain the syncer's frames, decoded (one batched launch)."""
        return self._decode_frames(self.syncer.pop_frames())

    def reset(self) -> None:
        self.reset_fec()
        self.syncer.reset()

    def reset_fec(self) -> None:
        self.frames_decoded = 0
        self.errors_corrected = 0
        self.suspect_frames = 0

    def __getattr__(self, name):
        return getattr(self.syncer, name)
