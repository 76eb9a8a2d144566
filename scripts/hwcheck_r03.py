"""Hardware check: round-3 receiver-chain subsystems on the real chip.

Drives the NEW round-3 components through the COMPILED flagship engine
(FullKernelBatchEngine, not interpret mode) on the axon TPU:

1. EqFrontEnd (block CMA) in front of the fused-kernel engine over a bank
   with a one-symbol echo -- the raw kernel demod loses lock, the
   equalized one recovers it (quality gap asserted on-chip).
2. FrameSyncer on the engine's packet stream: every synced frame's payload
   bits exact in the transmitted labeling (M-fold ambiguity resolved
   against whatever rotation the compiled tracker picked).
3. QualityMonitor EMAs from the same packets (lock/SNR sanity).
4. One timed datapoint of the chain (fetch-forced) for the session log.

Usage: PYTHONPATH=/root/repo python scripts/hwcheck_r03.py
"""

import time

import numpy as np
import jax

from psk_soft_tpu import DemodConfig
from psk_soft_tpu.ops.equalizer import EqConfig, multipath
from psk_soft_tpu.ops.framesync import FrameFormat, uw_points
from psk_soft_tpu.ops import slicers
from psk_soft_tpu.runtime.engine import FullKernelBatchEngine
from psk_soft_tpu.runtime.equalizer import EqFrontEnd
from psk_soft_tpu.runtime.framesync import FrameSyncer
from psk_soft_tpu.runtime.quality import QualityMonitor
from psk_soft_tpu.runtime.streams import SRI


def build_bank(C, sps, fmt, s_total, seed=11):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, 4, (C, s_total))
    sent = []
    starts = list(range(1200, s_total - fmt.frame_len - 300, 400))
    for c in range(C):
        row = []
        for s0 in starts:
            pl = rng.integers(0, 4, fmt.payload)
            idx[c, s0:s0 + fmt.uw_len] = fmt.uw
            idx[c, s0 + fmt.uw_len:s0 + fmt.frame_len] = pl
            row.append(pl)
        sent.append(row)
    x = np.repeat(np.exp(1j * (2 * np.pi * idx / 4 + 2.2)), sps, axis=1)
    x = (x + 0.02 * (rng.standard_normal(x.shape)
                     + 1j * rng.standard_normal(x.shape))
         ).astype(np.complex64)
    rx = multipath(x, [1.0] + [0.0] * (sps - 1) + [0.5j])
    return rx, sent, starts


def run_chain(cfg, rx, fmt, equalized, block_symbols=256):
    C = rx.shape[0]
    eng = FullKernelBatchEngine(cfg, C, block_symbols=block_symbols)
    eng.set_input_sri(SRI(stream_id="hw3"))
    mon = QualityMonitor(eng, alpha=0.01)
    sync = FrameSyncer(mon, fmt)
    top = EqFrontEnd(sync, EqConfig(taps=33, mu=5e-5)) if equalized else sync
    need = block_symbols * cfg.sps
    t0 = time.perf_counter()
    for pos in range(0, rx.shape[1] - need + 1, need):
        blk = rx[:, pos:pos + need]
        if equalized:
            top.push_block(blk)
        else:
            for c in range(C):
                sync.push(c, blk[c])
        top.step_packets()
    top.flush_packets()
    dt = time.perf_counter() - t0
    return sync.pop_frames(), mon.snapshot(), dt


def main():
    dev = jax.devices()[0]
    print("platform:", dev.platform, dev.device_kind)
    C, sps = 128, 8
    cfg = DemodConfig(sps=sps, num_avg=50, constellation_size=4,
                      phase_avg=50)
    rng = np.random.default_rng(7)
    fmt = FrameFormat(uw=tuple(rng.integers(0, 4, 32)), payload=32, m=4,
                      threshold=0.7)
    rx, sent, starts = build_bank(C, sps, fmt, s_total=4096)

    frames_raw, q_raw, _ = run_chain(cfg, rx, fmt, equalized=False)
    frames_eq, q_eq, dt = run_chain(cfg, rx, fmt, equalized=True)

    def ideal_bits(pl):
        pts = uw_points(pl, 4)
        return np.asarray(slicers.slice_bits(4, pts))[:, :2].reshape(-1)

    # frame payloads exact (match against the transmitted grid)
    exact = 0
    for f in frames_eq:
        want = [ideal_bits(pl) for pl in sent[f.channel]]
        exact += any(np.array_equal(f.bits, w) for w in want)
    n_expected = C * sum(s > 1400 for s in starts)  # past eq convergence
    print(f"frames: raw={len(frames_raw)} eq={len(frames_eq)} "
          f"exact_payloads={exact}/{len(frames_eq)} "
          f"(expected >= {int(0.9 * n_expected)})")
    print(f"quality raw: lock={q_raw['lock'].mean():.2f} "
          f"snr={q_raw['snr_db'].mean():.1f} dB "
          f"evm={q_raw['evm_pct'].mean():.0f}%")
    print(f"quality eq : lock={q_eq['lock'].mean():.2f} "
          f"snr={q_eq['snr_db'].mean():.1f} dB "
          f"evm={q_eq['evm_pct'].mean():.0f}%")
    rate = rx.size / dt
    print(f"equalized-chain wall rate (incl. host frame sync): "
          f"{rate / 1e6:.0f} Msps over {C} ch")

    assert exact == len(frames_eq) and len(frames_eq) >= 0.9 * n_expected
    assert q_eq["lock"].mean() > q_raw["lock"].mean() + 0.2
    assert q_eq["snr_db"].mean() > q_raw["snr_db"].mean() + 4
    print("HWCHECK_R03 PASS")


if __name__ == "__main__":
    main()
