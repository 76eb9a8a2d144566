"""Descrambler stages (runtime/scramble.py): streaming self-sync carry and
frame-synchronous additive descrambling behind the frame/FEC layer."""

import numpy as np
import pytest

from psk_soft_tpu.ops import slicers
from psk_soft_tpu.ops.fec import CODE_K7, conv_encode
from psk_soft_tpu.ops.framesync import FrameFormat, psk_points
from psk_soft_tpu.ops.scramble import (additive_scramble, prbs15,
                                       selfsync_scramble)
from psk_soft_tpu.runtime.fec import FecFrameDecoder
from psk_soft_tpu.runtime.framesync import FrameSyncer
from psk_soft_tpu.runtime.scramble import FrameDescrambler, StreamDescrambler


def qpsk_modulate(bits):
    pts = psk_points(np.arange(4), 4)
    labels = np.asarray(slicers.slice_bits(4, pts))[:, :2]
    lut = np.zeros(4, np.int64)
    for sym, (b0, b1) in enumerate(labels):
        lut[b0 + 2 * b1] = sym
    pairs = np.asarray(bits).reshape(-1, 2)
    return pts[lut[pairs[:, 0] + 2 * pairs[:, 1]]]


def test_stream_descrambler_split_invariance():
    rng = np.random.default_rng(41)
    taps = (18, 23)
    bits = rng.integers(0, 2, (3, 500), np.int8)
    wire = np.asarray(selfsync_scramble(bits, taps))
    one = StreamDescrambler(3, taps).observe(wire)
    assert np.array_equal(one, bits)
    for splits in ([100, 400], [1, 499], [250, 250], [37, 463]):
        d = StreamDescrambler(3, taps)
        got = np.concatenate(
            [d.observe(w) for w in np.split(wire, np.cumsum(splits)[:-1],
                                            axis=1)], axis=1)
        assert np.array_equal(got, bits)


def test_stream_descrambler_resyncs_after_reset():
    rng = np.random.default_rng(42)
    taps = (5, 9)
    bits = rng.integers(0, 2, (1, 200), np.int8)
    wire = np.asarray(selfsync_scramble(bits, taps))
    d = StreamDescrambler(1, taps)
    d.observe(wire[:, :100])
    d.reset()                                    # simulate a stream gap
    got = d.observe(wire[:, 100:])
    # After max(taps) bits the self-sync property restores exact output.
    assert np.array_equal(got[:, 9:], bits[:, 109:])
    with pytest.raises(ValueError):
        d.observe(np.zeros((2, 8), np.int8))


def build_frame_stream(fmt, payload_bits_list, starts, total, rng):
    stream = psk_points(rng.integers(0, 4, total), 4)
    uw = psk_points(np.asarray(fmt.uw), 4)
    for pb, s0 in zip(payload_bits_list, starts):
        stream[s0:s0 + fmt.uw_len] = uw
        stream[s0 + fmt.uw_len:s0 + fmt.frame_len] = qpsk_modulate(pb)
    return stream.astype(np.complex64)


def test_frame_descrambler_raw_bits():
    rng = np.random.default_rng(43)
    fmt = FrameFormat(uw=tuple(rng.integers(0, 4, 32)), payload=40, m=4,
                      threshold=0.7)
    lf = prbs15()
    infos = [rng.integers(0, 2, 80, np.int8) for _ in range(3)]
    wire_bits = [np.asarray(additive_scramble(lf, i)) for i in infos]
    starts = [50, 300, 600]
    x = build_frame_stream(fmt, wire_bits, starts, 900, rng)[None]
    sync = FrameSyncer(1, fmt)
    top = FrameDescrambler(sync, lf)
    sync.observe(x)
    sync.finalize()
    frames = top.pop_frames()
    assert len(frames) == 3 and top.frames_descrambled == 3
    for f in frames:
        assert np.array_equal(f.bits, infos[starts.index(f.start)])
    assert top.channels == 1                     # delegation


def test_frame_descrambler_after_fec():
    """TX: info -> additive scramble -> FEC encode -> QPSK.  RX: frame
    sync -> Viterbi -> descramble recovers the info bits."""
    rng = np.random.default_rng(44)
    fmt = FrameFormat(uw=tuple(rng.integers(0, 4, 32)), payload=64, m=4,
                      threshold=0.7)
    lf = prbs15()
    infos = [rng.integers(0, 2, 58, np.int8) for _ in range(2)]
    payload_bits = [np.asarray(conv_encode(
        CODE_K7, np.asarray(additive_scramble(lf, i)))) for i in infos]
    starts = [60, 500]
    x = build_frame_stream(fmt, payload_bits, starts, 800, rng)[None]
    sync = FrameSyncer(1, fmt)
    top = FrameDescrambler(FecFrameDecoder(sync, CODE_K7), lf)
    sync.observe(x)
    sync.finalize()
    frames = top.pop_frames()
    assert len(frames) == 2
    for f in frames:
        assert f.corrected == 0
        assert np.array_equal(f.info_bits, infos[starts.index(f.start)])
    assert top.frames_decoded == 2               # delegates through the fec
