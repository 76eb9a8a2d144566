"""One-call receiver assembly (runtime/receiver.py)."""

import numpy as np
import pytest

from psk_soft_tpu import DemodConfig
from psk_soft_tpu.ops import tx
from psk_soft_tpu.ops.crc import CRC16_CCITT
from psk_soft_tpu.ops.fec import CODE_K7, info_bits_for
from psk_soft_tpu.ops.framesync import FrameFormat
from psk_soft_tpu.ops.scramble import prbs15
from psk_soft_tpu.runtime.receiver import build_receiver


def test_full_stack_receiver_closes_link():
    C, sps = 2, 8
    cfg = DemodConfig(sps=sps, num_avg=30, constellation_size=4,
                      phase_avg=40)
    rng = np.random.default_rng(111)
    fmt = FrameFormat(uw=tuple(rng.integers(0, 4, 32)), payload=64, m=4)
    lf = prbs15()
    n_msg = info_bits_for(CODE_K7, 128) - CRC16_CCITT.degree
    starts = [300, 700, 1100]
    truth, rows = {}, []
    for c in range(C):
        infos = [rng.integers(0, 2, n_msg, np.int8) for _ in starts]
        for s0, i in zip(starts, infos):
            truth[(c, s0)] = i
        idx = tx.frame_stream(fmt, infos, starts, 1600, code=CODE_K7,
                              lfsr=lf, crc=CRC16_CCITT, labeling="gray",
                              seed=50 + c)
        x = tx.shape(4, idx, sps) * np.exp(1j * 0.9)
        x = x + 0.04 * (rng.standard_normal(x.size)
                        + 1j * rng.standard_normal(x.size))
        rows.append(x.astype(np.complex64))
    wire = np.stack(rows)

    rx = build_receiver(cfg, C, block_symbols=256, quality=True,
                        uw=fmt.uw, frame_payload=64,
                        fec=CODE_K7, fec_labeling="gray",
                        descramble=lf, crc=CRC16_CCITT)
    assert rx.quality is not None and rx.fec is not None
    block = 256 * sps
    pos = 0
    while pos < wire.shape[1]:
        for c in range(C):
            rx.engine.push(c, wire[c, pos:pos + block])
        rx.engine.step_packets()
        pos += block
    rx.engine.flush_packets()
    frames = rx.pop_frames()
    assert len(frames) == C * len(starts)
    for f in frames:
        assert f.crc_ok
        assert np.array_equal(f.info_bits, truth[(f.channel, f.start)])
    snap = rx.quality.snapshot()
    assert (snap["lock"] > 0.5).all()
    assert rx.channels == C                      # delegation to the engine


def test_receiver_validation_and_minimal():
    cfg = DemodConfig(sps=8, num_avg=20, constellation_size=4,
                      phase_avg=20)
    with pytest.raises(ValueError):
        build_receiver(cfg, 2, fec=CODE_K7)      # frame stage without uw
    with pytest.raises(ValueError):
        build_receiver(cfg, 2, engine="mosaic")
    with pytest.raises(ValueError):
        build_receiver(cfg, 2, uw=(0, 1, 2, 3), frame_payload=64,
                       fec=CODE_K7, stream_fec=CODE_K7)
    rx = build_receiver(cfg, 2)                  # bare engine
    assert rx.frames is None and rx.quality is None
    with pytest.raises(ValueError):
        rx.pop_frames()
    rx2 = build_receiver(cfg, 2, stream_fec=CODE_K7)
    assert rx2.stream_fec is not None
    assert rx2.engine is rx2.stream_fec
