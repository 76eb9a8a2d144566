"""Hardware check: FEC / scrambling / TX / probe subsystems on the real chip.

Drives the round-3b additions through the COMPILED flagship engine on the
axon TPU:

1. TX chain (ops/tx.py) builds a coded + scrambled framed bank; the
   FullKernelBatchEngine demodulates it; FrameSyncer + FecFrameDecoder +
   FrameDescrambler recover every info payload exactly (Viterbi, GF(2)
   keystream matmul, and LLR kernels all execute on the TPU).
2. Symbol errors injected at the wire come back corrected and counted.
3. probe (estimate_baud + classify_psk FFT launches) surveys the same
   capture on-chip and reports the configured sps / M / CFO.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/hwcheck_r03b.py
"""

import numpy as np
import jax

from psk_soft_tpu import DemodConfig
from psk_soft_tpu.ops import tx
from psk_soft_tpu.ops.fec import CODE_K7, info_bits_for
from psk_soft_tpu.ops.framesync import FrameFormat
from psk_soft_tpu.ops.probe import classify_psk, estimate_baud
from psk_soft_tpu.ops.scramble import prbs15
from psk_soft_tpu.runtime.engine import FullKernelBatchEngine
from psk_soft_tpu.runtime.fec import FecFrameDecoder
from psk_soft_tpu.runtime.framesync import FrameSyncer
from psk_soft_tpu.runtime.scramble import FrameDescrambler
from psk_soft_tpu.runtime.streams import SRI


def main():
    dev = jax.devices()[0]
    print("platform:", dev.platform, dev.device_kind)
    C, sps, cfo = 128, 8, 3e-4
    rng = np.random.default_rng(9)
    fmt = FrameFormat(uw=tuple(rng.integers(0, 4, 32)), payload=64, m=4,
                      threshold=0.7)
    lf = prbs15()
    n_info = info_bits_for(CODE_K7, fmt.payload * 2)
    starts = list(range(800, 3500, 300))
    truth, rows = {}, []
    for c in range(C):
        infos = [rng.integers(0, 2, n_info, np.int8) for _ in starts]
        for s0, info in zip(starts, infos):
            truth[(c, s0)] = info
        idx = tx.frame_stream(fmt, infos, starts, 4096, code=CODE_K7,
                              lfsr=lf, seed=100 + c)
        x = tx.shape(4, idx, sps)
        x = x * np.exp(2j * np.pi * (cfo * np.arange(x.size) + 0.3))
        x = x + 0.03 * (rng.standard_normal(x.size)
                        + 1j * rng.standard_normal(x.size))
        rows.append(x.astype(np.complex64))
    rx = np.stack(rows)
    # Inject 2 payload-symbol errors per channel in the LAST frame: a
    # 90-degree rotation commutes with the carrier phase (so it stays a
    # one-quadrant decision error under any tracker lock) and is
    # invisible to the M-th-power phase estimate (j^4 = 1).  The quadrant
    # labeling is not Gray, so each gives 1 or 2 wrong bits.
    s_err = starts[-1]
    for c in range(C):
        for off in (10, 40):
            p = (s_err + fmt.uw_len + off) * sps
            rx[c, p:p + sps] *= 1j

    cfg = DemodConfig(sps=sps, num_avg=50, constellation_size=4,
                      phase_avg=50)
    eng = FullKernelBatchEngine(cfg, C, block_symbols=256)
    eng.set_input_sri(SRI(stream_id="hw3b"))
    sync = FrameSyncer(eng, fmt)
    top = FrameDescrambler(FecFrameDecoder(sync, CODE_K7), lf)
    need = 256 * sps
    for pos in range(0, rx.shape[1] - need + 1, need):
        for c in range(C):
            sync.push(c, rx[c, pos:pos + need])
        top.step_packets()
    top.flush_packets()
    frames = top.pop_frames()

    exact = sum(np.array_equal(f.info_bits, truth[(f.channel, f.start)])
                for f in frames)
    corrected = sum(f.corrected for f in frames)
    n_expected = C * len(starts)
    print(f"frames: {len(frames)}/{n_expected} exact={exact} "
          f"corrected_errors={corrected} (injected {2 * C}) "
          f"suspect={sum(f.suspect for f in frames)}")
    assert len(frames) == n_expected
    assert exact == len(frames)
    assert 2 * C <= corrected <= 4 * C  # 1-2 wrong bits per injected flip
    assert not any(f.suspect for f in frames)

    sps_est, bconf = estimate_baud(rx[:8], sps_min=2, sps_max=32)
    m_est, cfo_est, lconf = classify_psk(rx[:8], max_m=8)
    print(f"probe: sps={sps_est.mean():.3f} m={m_est.tolist()[:4]}... "
          f"cfo={cfo_est.mean():.2e} (true {cfo:.1e}) "
          f"baud_conf={bconf.mean():.0f} line_conf={lconf.mean():.0f}")
    assert np.all(np.abs(sps_est - sps) < 0.05)
    assert np.all(m_est == 4)
    assert np.all(np.abs(cfo_est - cfo) < 5e-5)
    print("HWCHECK_R03B PASS")


if __name__ == "__main__":
    main()
