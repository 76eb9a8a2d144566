"""Randomized lifecycle soak for the receive-chain wrapper stack.

Counterpart of tests/test_soak.py for the round-3 stages: interleaved
ragged observes, resets, finalizes, and drains against the standalone
FrameSyncer -> FecFrameDecoder -> FrameDescrambler -> FrameCrcChecker
stack, checking structural invariants only -- no event ordering may
wedge a stage, desynchronize counters, or emit malformed frames.

Invariants at every drain:
  - every frame's info_bits has exactly the configured message width
  - corrected >= 0, crc_ok is a bool, channel/start in range
  - counters (frames_synced/decoded/checked) are consistent and
    monotone between resets
"""

import numpy as np
import pytest

from psk_soft_tpu.ops import tx
from psk_soft_tpu.ops.crc import CRC16_CCITT
from psk_soft_tpu.ops.fec import CODE_K7, info_bits_for
from psk_soft_tpu.ops.framesync import FrameFormat
from psk_soft_tpu.ops.scramble import prbs15
from psk_soft_tpu.runtime.crc import FrameCrcChecker
from psk_soft_tpu.runtime.fec import FecFrameDecoder, StreamFecDecoder
from psk_soft_tpu.runtime.framesync import FrameSyncer
from psk_soft_tpu.runtime.scramble import FrameDescrambler


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_frame_stack_event_soak(seed):
    rng = np.random.default_rng(300 + seed)
    fmt = FrameFormat(uw=tuple(rng.integers(0, 4, 32)), payload=64, m=4,
                      threshold=0.7)
    lf = prbs15()
    n_msg = info_bits_for(CODE_K7, 128) - CRC16_CCITT.degree
    sync = FrameSyncer(2, fmt, max_frames=16)    # tiny ring: force drops
    top = FrameCrcChecker(
        FrameDescrambler(FecFrameDecoder(sync, CODE_K7), lf), CRC16_CCITT)

    def make_block(s):
        """s symbols of fill with a frame embedded when it fits."""
        if s >= fmt.frame_len + 8:
            info = rng.integers(0, 2, n_msg, np.int8)
            idx = tx.frame_stream(fmt, [info], [4], s, code=CODE_K7,
                                  lfsr=lf, crc=CRC16_CCITT,
                                  seed=int(rng.integers(1 << 30)))
        else:
            idx = rng.integers(0, 4, s)
        x = tx.symbols_to_iq(4, np.stack([idx, idx[::-1]]))
        return (x + 0.03 * (rng.standard_normal(x.shape)
                            + 1j * rng.standard_normal(x.shape))
                ).astype(np.complex64)

    drained = 0
    last_synced = 0
    for _ in range(60):
        ev = rng.choice(["observe", "observe", "observe", "drain",
                         "finalize", "reset"])
        if ev == "observe":
            s = int(rng.integers(1, 260))
            sync.observe(make_block(s))
        elif ev == "finalize":
            sync.finalize()
        elif ev == "reset":
            top.reset()            # counters survive (metrics convention)
        else:
            frames = top.pop_frames()
            drained += len(frames)
            for f in frames:
                assert f.channel in (0, 1)
                assert f.start >= 0
                assert f.info_bits.shape == (n_msg,)
                assert f.corrected >= 0
                assert isinstance(f.crc_ok, bool)
        # counters monotone between resets, consistent across stages
        assert sync.frames_synced >= last_synced
        last_synced = sync.frames_synced
        assert top.frames_checked == top.frames_decoded \
            == top.frames_descrambled
    # stack survived 60 events; drains produced well-formed frames
    assert drained + len(sync.frames) <= sync.frames_synced \
        - sync.dropped_frames + 16


@pytest.mark.parametrize("seed", [0, 1])
def test_stream_fec_event_soak(seed):
    """StreamFecDecoder under ragged observes, resets, finalize: emitted
    bit counts stay consistent with the step bookkeeping."""
    rng = np.random.default_rng(400 + seed)
    dec = StreamFecDecoder(2, CODE_K7, m=4, depth=70, block_steps=128)
    popped = 0
    for _ in range(40):
        ev = rng.choice(["observe", "observe", "observe", "pop", "reset",
                         "finalize"])
        if ev == "observe":
            s = int(rng.integers(1, 400))
            soft = tx.symbols_to_iq(4, rng.integers(0, 4, (2, s)))
            dec.observe((soft + 0.05 * rng.standard_normal(soft.shape)
                         ).astype(np.complex64))
        elif ev == "pop":
            bits = dec.pop_bits()
            assert bits.shape[0] == 2
            assert ((bits == 0) | (bits == 1)).all()
            popped += bits.shape[1]
        elif ev == "finalize":
            dec.finalize()
        else:
            dec.reset()            # drops pending output, keeps counter
            popped = dec.steps_decoded
    dec.finalize()
    popped += dec.pop_bits().shape[1]
    assert popped <= dec.steps_decoded
