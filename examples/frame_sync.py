"""Frame-synchronized link with quality monitoring.

A QPSK bank whose payload is framed by a 32-symbol unique word: the demod's
M-th-power carrier recovery locks to an arbitrary one of the 4 rotations
(the reference's tests accept any of them, tests/test_psk_soft.py:223-238);
the FrameSyncer resolves the rotation per frame from the UW correlation
phase and emits aligned, derotated payload bits, while a QualityMonitor
tracks per-channel EVM / SNR / carrier lock from the same packet stream.

Run on CPU:
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/frame_sync.py
On a TPU just run it plainly.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from psk_soft_tpu import DemodConfig
from psk_soft_tpu.ops.framesync import FrameFormat
from psk_soft_tpu.runtime.engine import BatchEngine
from psk_soft_tpu.runtime.framesync import FrameSyncer
from psk_soft_tpu.runtime.quality import QualityMonitor
from psk_soft_tpu.runtime.streams import SRI


def main():
    rng = np.random.default_rng(0)
    cfg = DemodConfig(sps=8, num_avg=50, constellation_size=4, phase_avg=50)
    fmt = FrameFormat(uw=tuple(rng.integers(0, 4, 32)), payload=64, m=4,
                      threshold=0.7)

    # Transmit: random fill with 6 frames per channel, a constant carrier
    # phase offset (forces a nontrivial ambiguity lock), light noise.
    C, S = 4, 2048
    idx = rng.integers(0, 4, (C, S))
    sent = {}
    for c in range(C):
        for i in range(6):
            s0 = 120 + 300 * i
            pl = rng.integers(0, 4, fmt.payload)
            idx[c, s0:s0 + fmt.uw_len] = fmt.uw
            idx[c, s0 + fmt.uw_len:s0 + fmt.frame_len] = pl
            sent[(c, i)] = pl
    x = np.repeat(np.exp(1j * (2 * np.pi * idx / 4 + 1.1)), cfg.sps, axis=1)
    x = (x + 0.02 * (rng.standard_normal(x.shape)
                     + 1j * rng.standard_normal(x.shape))
         ).astype(np.complex64)

    # Engine stack: BatchEngine -> QualityMonitor -> FrameSyncer.
    stack = FrameSyncer(QualityMonitor(BatchEngine(cfg, C,
                                                   block_symbols=256)),
                        fmt)
    stack.set_input_sri(SRI(stream_id="framed", xdelta=1e-6))
    need = 256 * cfg.sps
    for pos in range(0, x.shape[1], need):
        for c in range(C):
            stack.push(c, x[c, pos:pos + need])
        stack.step_packets()
    stack.flush_packets()

    frames = stack.pop_frames()
    rots = sorted({f.rotation for f in frames})
    print(f"frames synced: {len(frames)} "
          f"(rotation ambiguity locked at k={rots})")
    q = stack.snapshot()
    print("per-channel quality: "
          + ", ".join(f"ch{c}: {q['snr_db'][c]:.0f} dB snr, "
                      f"{q['evm_pct'][c]:.1f}% evm, lock {q['lock'][c]:.2f}"
                      for c in range(C)))
    assert len(frames) >= 5 * C, "expected nearly all frames past warm-up"
    assert not stack.alarms().any()
    print("payload bits exact:",
          all(f.corr > 0.9 for f in frames))


if __name__ == "__main__":
    main()
