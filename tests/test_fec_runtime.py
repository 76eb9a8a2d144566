"""FEC frame stage (runtime/fec.py): synced payloads -> information bits.

Drives the standalone FrameSyncer surface with QPSK streams whose frame
payloads carry the K=7 convolutional code, and checks exact recovery,
corrected-error accounting, the suspect flag on an uncorrectable payload,
and construction-time payload validation.
"""

import numpy as np
import pytest

from psk_soft_tpu.ops import slicers
from psk_soft_tpu.ops.fec import CODE_K7, PUNCTURE_2_3, ConvCode, conv_encode
from psk_soft_tpu.ops.framesync import FrameFormat, psk_points
from psk_soft_tpu.runtime.fec import FecFrameDecoder
from psk_soft_tpu.runtime.framesync import FrameSyncer


def qpsk_modulate(bits):
    pts = psk_points(np.arange(4), 4)
    labels = np.asarray(slicers.slice_bits(4, pts))[:, :2]
    lut = np.zeros(4, np.int64)
    for sym, (b0, b1) in enumerate(labels):
        lut[b0 + 2 * b1] = sym
    pairs = np.asarray(bits).reshape(-1, 2)
    return pts[lut[pairs[:, 0] + 2 * pairs[:, 1]]]


def build_stream(fmt, infos, starts, total, rng, rot=0):
    """One channel's soft-symbol stream with coded frames embedded."""
    stream = psk_points(rng.integers(0, 4, total), 4)
    uw = psk_points(np.asarray(fmt.uw), 4)
    for info, s0 in zip(infos, starts):
        payload = qpsk_modulate(np.asarray(conv_encode(CODE_K7, info)))
        stream[s0:s0 + fmt.uw_len] = uw
        stream[s0 + fmt.uw_len:s0 + fmt.frame_len] = payload
    derot = np.exp(2j * np.pi * rot / 4).astype(np.complex64)
    return (stream * derot).astype(np.complex64)


@pytest.fixture
def fmt():
    rng = np.random.default_rng(2)
    # payload 64 QPSK symbols = 128 code bits = 64 trellis steps
    # -> 58 info bits at rate 1/2 terminated.
    return FrameFormat(uw=tuple(rng.integers(0, 4, 32)), payload=64, m=4,
                       threshold=0.7)


def test_decodes_clean_frames(fmt):
    rng = np.random.default_rng(21)
    sync = FrameSyncer(2, fmt)
    dec = FecFrameDecoder(sync, CODE_K7)
    assert dec.info_bits == 58
    starts = [40, 300, 700]
    infos = [[rng.integers(0, 2, 58) for _ in starts] for _ in range(2)]
    x = np.stack([build_stream(fmt, infos[c], starts, 1000, rng, rot=c)
                  for c in range(2)])
    for pos in range(0, 1000, 250):              # streamed in 4 blocks
        sync.observe(x[:, pos:pos + 250])
    sync.finalize()
    frames = dec.pop_frames()
    assert len(frames) == 6
    assert dec.frames_decoded == 6
    assert dec.errors_corrected == 0
    for f in frames:
        i = starts.index(f.start)
        assert np.array_equal(f.info_bits, infos[f.channel][i])
        assert f.corrected == 0 and not f.suspect


def test_corrects_and_counts_symbol_errors(fmt):
    rng = np.random.default_rng(22)
    sync = FrameSyncer(1, fmt)
    dec = FecFrameDecoder(sync, CODE_K7)
    info = rng.integers(0, 2, 58)
    x = build_stream(fmt, [info], [100], 400, rng)[None]
    x = np.array(x)
    # Corrupt 3 well-separated payload symbols (flip the real sign:
    # toggles b0 = sr^si and leaves b1 -- exactly one wrong bit each).
    for off in (5, 25, 45):
        x[0, 100 + fmt.uw_len + off] = -np.conj(x[0, 100 + fmt.uw_len + off])
    sync.observe(x)
    sync.finalize()
    (f,) = dec.pop_frames()
    assert np.array_equal(f.info_bits, info)
    assert f.corrected == 3 and not f.suspect
    assert dec.errors_corrected == 3


def test_suspect_flag_on_garbage_payload(fmt):
    rng = np.random.default_rng(23)
    sync = FrameSyncer(1, fmt)
    dec = FecFrameDecoder(sync, CODE_K7)
    stream = psk_points(rng.integers(0, 4, 400), 4).astype(np.complex64)
    # A real UW followed by uncoded random fill: syncs, cannot decode.
    stream[100:100 + fmt.uw_len] = psk_points(np.asarray(fmt.uw), 4)
    sync.observe(stream[None])
    sync.finalize()
    (f,) = dec.pop_frames()
    assert f.suspect and f.corrected > dec.suspect_fraction * 128
    assert dec.suspect_frames == 1


def test_batch_bucketing_matches_single(fmt):
    rng = np.random.default_rng(24)
    sync = FrameSyncer(1, fmt)
    dec = FecFrameDecoder(sync, CODE_K7)
    infos = [rng.integers(0, 2, 58) for _ in range(3)]   # bucket pads 3->4
    payloads = np.stack([
        qpsk_modulate(np.asarray(conv_encode(CODE_K7, i))) for i in infos])
    noisy = payloads + 0.1 * (rng.standard_normal(payloads.shape)
                              + 1j * rng.standard_normal(payloads.shape))
    info_b, corr_b = dec.decode_payloads(noisy.astype(np.complex64))
    assert info_b.shape == (3, 58)
    for i in range(3):
        info_1, corr_1 = dec.decode_payloads(
            noisy[i:i + 1].astype(np.complex64))
        assert np.array_equal(info_b[i], info_1[0])
        assert corr_b[i] == corr_1[0]
        assert np.array_equal(info_b[i], infos[i])


def test_payload_validation(fmt):
    sync = FrameSyncer(1, fmt)
    # 128 code bits work for rate 1/2 (64 steps) but not for n=3.
    with pytest.raises(ValueError):
        FecFrameDecoder(sync, ConvCode(7, (0o171, 0o133, 0o165)))
    # Punctured 2/3: 128 kept bits / 3-per-period -> not a multiple.
    with pytest.raises(ValueError):
        FecFrameDecoder(sync, ConvCode(7, (0o171, 0o133), PUNCTURE_2_3))
    # Too short for the flush bits.
    tiny = FrameSyncer(1, FrameFormat(uw=fmt.uw, payload=6, m=4))
    with pytest.raises(ValueError):
        FecFrameDecoder(tiny, CODE_K7)


def test_reset_and_delegation(fmt):
    sync = FrameSyncer(1, fmt)
    dec = FecFrameDecoder(sync, CODE_K7)
    assert dec.channels == 1                      # delegates through
    assert dec.fmt is fmt
    rng = np.random.default_rng(25)
    info = rng.integers(0, 2, 58)
    sync.observe(build_stream(fmt, [info], [50], 300, rng)[None])
    sync.finalize()
    assert len(dec.pop_frames()) == 1
    assert dec.frames_decoded == 1
    dec.reset()                    # stream state resets; counters survive
    assert dec.frames_decoded == 1 and sync.frames == []
    dec.reset_fec()                # explicit counter zeroing
    assert dec.frames_decoded == 0
