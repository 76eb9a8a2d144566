"""Frame CRC stage (runtime/crc.py) in the full receive stack."""

import numpy as np

from psk_soft_tpu.ops import tx
from psk_soft_tpu.ops.crc import CRC16_CCITT
from psk_soft_tpu.ops.fec import CODE_K7, info_bits_for
from psk_soft_tpu.ops.framesync import FrameFormat
from psk_soft_tpu.ops.scramble import prbs15
from psk_soft_tpu.runtime.crc import FrameCrcChecker
from psk_soft_tpu.runtime.fec import FecFrameDecoder
from psk_soft_tpu.runtime.framesync import FrameSyncer
from psk_soft_tpu.runtime.scramble import FrameDescrambler


def test_full_stack_crc_ok_and_failure():
    """TX info -> CRC -> scramble -> FEC -> frame; RX full stack strips
    and checks.  An uncorrectable frame (garbage payload) fails CRC."""
    rng = np.random.default_rng(81)
    fmt = FrameFormat(uw=tuple(rng.integers(0, 4, 32)), payload=64, m=4,
                      threshold=0.7)
    lf = prbs15()
    cap = info_bits_for(CODE_K7, fmt.payload * 2)       # 58
    n_msg = cap - CRC16_CCITT.degree                    # 42
    infos = [rng.integers(0, 2, n_msg, np.int8) for _ in range(3)]
    starts = [60, 400, 740]
    idx = tx.frame_stream(fmt, infos, starts, 1100, code=CODE_K7,
                          lfsr=lf, crc=CRC16_CCITT, seed=5)
    soft = tx.symbols_to_iq(4, idx).astype(np.complex64)
    # Destroy the middle frame's payload beyond any correction.
    soft[starts[1] + fmt.uw_len: starts[1] + fmt.frame_len] = \
        tx.symbols_to_iq(4, rng.integers(0, 4, fmt.payload))

    sync = FrameSyncer(1, fmt)
    top = FrameCrcChecker(
        FrameDescrambler(FecFrameDecoder(sync, CODE_K7), lf), CRC16_CCITT)
    sync.observe(soft[None])
    sync.finalize()
    frames = top.pop_frames()
    assert [f.start for f in frames] == starts
    assert top.frames_checked == 3 and top.crc_failures == 1
    for f, info in zip(frames, infos):
        assert f.info_bits.size == n_msg
        if f.start == starts[1]:
            assert f.crc_ok is False
        else:
            assert f.crc_ok is True
            assert np.array_equal(f.info_bits, info)
    # Delegation reaches every layer of the stack.
    assert top.frames_decoded == 3 and top.frames_descrambled == 3
    assert top.channels == 1
    top.reset()
    assert sync.frames == []


def test_crc_without_fec():
    """CRC directly over raw sliced payload bits (no FEC, no scramble)."""
    rng = np.random.default_rng(82)
    fmt = FrameFormat(uw=tuple(rng.integers(0, 4, 32)), payload=30, m=4,
                      threshold=0.7)
    n_msg = 30 * 2 - CRC16_CCITT.degree                 # 44
    infos = [rng.integers(0, 2, n_msg, np.int8) for _ in range(2)]
    idx = tx.frame_stream(fmt, infos, [50, 300], 500, crc=CRC16_CCITT,
                          seed=6)
    soft = tx.symbols_to_iq(4, idx).astype(np.complex64)
    top = FrameCrcChecker(FrameSyncer(1, fmt), CRC16_CCITT)
    top.frames_src.observe(soft[None])
    top.frames_src.finalize()
    frames = top.pop_frames()
    assert len(frames) == 2 and all(f.crc_ok for f in frames)
    for f, info in zip(frames, infos):
        assert np.array_equal(f.bits, info)             # stripped field
