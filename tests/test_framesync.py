"""UW frame synchronization (ops/framesync.py, runtime/framesync.py).

Gates: one-shot detection finds exact frame starts and resolves the M-fold
rotation (payload bits recovered in the transmitted labeling), the
normalized statistic rejects noise, streaming over any block split commits
EXACTLY the one-shot frames (incl. the end-of-stream finalize), and the
wrapper recovers payload bits through a live engine whose carrier tracker
locked to an arbitrary ambiguity rotation."""

import numpy as np
import pytest

from psk_soft_tpu import DemodConfig
from psk_soft_tpu.ops import slicers
from psk_soft_tpu.ops.framesync import (FrameFormat, correlate_uw,
                                        extract_frames, psk_points,
                                        uw_points)
from psk_soft_tpu.runtime.framesync import FrameSyncer

UW16 = (0, 0, 1, 3, 2, 0, 2, 2, 3, 1, 1, 0, 3, 2, 1, 3)
# 32-symbol UW: threshold^2 * U ~ 15.7 at 0.7 -> <1e-6 false alarms per
# position against random QPSK fill (see FrameFormat.threshold docs).
UW32 = UW16 + (2, 1, 0, 2, 3, 3, 1, 2, 0, 3, 0, 1, 1, 2, 3, 0)


def _ideal_bits(idx, m):
    pts = uw_points(np.asarray(idx) % m, m)
    nb = int(np.log2(m))
    b3 = np.asarray(slicers.slice_bits(m, pts))
    return b3[:, :nb].reshape(-1).astype(np.int8)


def _stream(fmt: FrameFormat, starts, payload_idx, total, rot_k=0,
            snr_db=None, seed=0, m=None):
    """Soft-symbol stream: random fill + frames at ``starts``; the whole
    stream rotated by the ambiguity 2*pi*rot_k/M (+ noise)."""
    m = m or fmt.m
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, m, total)
    for s, pl in zip(starts, payload_idx):
        idx[s:s + fmt.uw_len] = fmt.uw
        idx[s + fmt.uw_len:s + fmt.frame_len] = pl
    soft = psk_points(idx, m) * np.exp(2j * np.pi * rot_k / m)
    if snr_db is not None:
        sigma = 10.0 ** (-snr_db / 20.0)
        soft = soft + sigma / np.sqrt(2.0) * (
            rng.standard_normal(total) + 1j * rng.standard_normal(total))
    return soft.astype(np.complex64), idx


def test_oneshot_detects_resolves_rotation_and_bits():
    fmt = FrameFormat(uw=UW32, payload=32, m=4, threshold=0.7)
    rng = np.random.default_rng(1)
    rows, wants = [], []
    starts = [40, 300, 700]
    for c, k in enumerate([0, 1, 3]):
        pls = [rng.integers(0, 4, fmt.payload) for _ in starts]
        soft, _ = _stream(fmt, starts, pls, 1000, rot_k=k, snr_db=15.0,
                          seed=c + 10)
        rows.append(soft)
        wants.append(pls)
    frames = extract_frames(fmt, np.stack(rows))
    by_chan = {c: sorted([f for f in frames if f.channel == c],
                         key=lambda f: f.start) for c in range(3)}
    for c, k in enumerate([0, 1, 3]):
        got = by_chan[c]
        assert [f.start for f in got] == starts
        for f, pl in zip(got, wants[c]):
            assert f.rotation == k
            assert f.corr > 0.9
            assert abs(f.residual_phase) < 0.2
            np.testing.assert_array_equal(f.bits, _ideal_bits(pl, 4))


def test_noise_only_no_frames_and_correlation_floor():
    fmt = FrameFormat(uw=UW32, payload=16, m=4, threshold=0.6)
    rng = np.random.default_rng(2)
    noise = (rng.standard_normal((2, 4096))
             + 1j * rng.standard_normal((2, 4096))).astype(np.complex64)
    assert extract_frames(fmt, noise) == []
    _, norm = correlate_uw(noise, fmt.points)
    assert float(np.asarray(norm).max()) < 0.6


@pytest.mark.parametrize("m", [2, 8])
def test_other_constellations(m):
    uw = tuple(int(x) % m for x in UW32)
    fmt = FrameFormat(uw=uw, payload=24, m=m,
                      threshold=0.8 if m == 2 else 0.7)
    rng = np.random.default_rng(m)
    pl = rng.integers(0, m, fmt.payload)
    k = m - 1
    soft, _ = _stream(fmt, [100], [pl], 400, rot_k=k, snr_db=18.0, seed=m)
    frames = extract_frames(fmt, soft[None])
    assert len(frames) == 1
    assert frames[0].start == 100 and frames[0].rotation == k
    np.testing.assert_array_equal(frames[0].bits, _ideal_bits(pl, m))


def test_streaming_equals_oneshot_any_split():
    fmt = FrameFormat(uw=UW32, payload=20, m=4, threshold=0.7)
    rng = np.random.default_rng(3)
    starts = [5, 200, 431, 600, 930]   # last one needs the finalize path
    pls = [rng.integers(0, 4, fmt.payload) for _ in starts]
    soft, _ = _stream(fmt, starts, pls, 986, rot_k=2, snr_db=12.0, seed=4)
    soft2 = np.stack([soft, soft])

    ref = extract_frames(fmt, soft2)

    for splits in ([17, 100, 333, 650], [1, 2, 3, 985],
                   [480], list(range(50, 986, 50))):
        sync = FrameSyncer(2, fmt)
        got = []
        for blk in np.split(soft2, splits, axis=1):
            got += sync.observe(blk)
        got += sync.finalize()
        assert len(got) == len(ref), splits
        for g, r in zip(sorted(got, key=lambda f: (f.channel, f.start)),
                        sorted(ref, key=lambda f: (f.channel, f.start))):
            assert (g.channel, g.start, g.rotation) == \
                (r.channel, r.start, r.rotation)
            np.testing.assert_array_equal(g.bits, r.bits)
            np.testing.assert_allclose(g.corr, r.corr, rtol=1e-5)


def test_engine_integration_resolves_tracker_ambiguity():
    """Full pipeline: a constant carrier phase offset makes the M-th-power
    tracker lock to an arbitrary rotation; the syncer still recovers the
    transmitted payload bits."""
    from psk_soft_tpu.runtime.engine import BatchEngine

    cfg = DemodConfig(sps=8, num_avg=50, constellation_size=4, phase_avg=50)
    fmt = FrameFormat(uw=UW32, payload=32, m=4, threshold=0.7)
    rng = np.random.default_rng(5)
    s_total = 1024
    starts = [100, 400, 700]
    pls = [rng.integers(0, 4, fmt.payload) for _ in starts]
    idx = rng.integers(0, 4, s_total)
    for s, pl in zip(starts, pls):
        idx[s:s + fmt.uw_len] = fmt.uw
        idx[s + fmt.uw_len:s + fmt.frame_len] = pl
    # Transmit WITHOUT the +pi/4 convention (the demod adds it) and with a
    # deliberate constant phase offset inside the ambiguity set's gaps.
    x = np.repeat(np.exp(1j * (2 * np.pi * idx / 4 + 1.9)), cfg.sps)
    x = (x + 0.01 * (rng.standard_normal(x.size)
                     + 1j * rng.standard_normal(x.size))
         ).astype(np.complex64)

    eng = BatchEngine(cfg, 1, block_symbols=128)
    from psk_soft_tpu.runtime.streams import SRI
    eng.set_input_sri(SRI(stream_id="fs"))
    sync = FrameSyncer(eng, fmt)
    pos = 0
    need = 128 * cfg.sps
    while pos + need <= x.size:
        sync.push(0, x[pos:pos + need])
        sync.step_packets()
        pos += need
    sync.flush_packets()

    frames = sync.pop_frames()
    # Warm-up eats the first num_avg-1 symbols; every frame whose UW lands
    # after that must be found with exact payload bits.
    assert len(frames) == 3
    for f, pl in zip(sorted(frames, key=lambda fr: fr.start), pls):
        np.testing.assert_array_equal(f.bits, _ideal_bits(pl, 4))
        assert f.corr > 0.9


def test_validation_and_limits():
    with pytest.raises(ValueError):
        FrameFormat(uw=(0, 4), payload=8, m=4)          # index out of range
    with pytest.raises(ValueError):
        FrameFormat(uw=(), payload=8, m=4)              # empty UW
    with pytest.raises(ValueError):
        FrameFormat(uw=(0, 1), payload=-1, m=4)
    with pytest.raises(ValueError):
        FrameFormat(uw=(0, 1), payload=8, m=4, threshold=0.0)
    fmt = FrameFormat(uw=UW32, payload=4, m=4, threshold=0.7)
    with pytest.raises(ValueError):
        correlate_uw(np.zeros((1, 4), np.complex64), fmt.points)

    # max_frames ring drop accounting.
    sync = FrameSyncer(1, fmt, max_frames=2)
    rng = np.random.default_rng(6)
    starts = list(range(10, 1000, 60))
    pls = [rng.integers(0, 4, fmt.payload) for _ in starts]
    soft, _ = _stream(fmt, starts, pls, 1100, seed=7)
    sync.observe(soft[None])
    sync.finalize()
    assert sync.frames_synced == len(starts)
    assert len(sync.frames) == 2
    assert sync.dropped_frames == len(starts) - 2
    sync.reset_sync()
    assert sync.pop_frames() == []
