"""Hardware check: Gray labeling / interleaving / CRC / streaming FEC on TPU.

Completes the round-3 bit-layer hardware validation (hwcheck_r03b covers
the framed K=7 chain + probe):

1. Full coded link with the Gray labeling, block interleaving, scrambling
   AND CRC through the compiled flagship engine -- the deepest wrapper
   stack (CRC(Descrambler(Fec(Sync(engine))))), every stage's device ops
   (LLR kernel, Viterbi scans, GF(2) matmuls, gather permutations)
   executing on the chip.
2. StreamFecDecoder: windowed-traceback streaming Viterbi on-chip, exact
   vs the one-shot decode, with a throughput datapoint (info bits/s at
   batch 128).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/hwcheck_r03c.py
"""

import time

import numpy as np
import jax

from psk_soft_tpu import DemodConfig
from psk_soft_tpu.ops import tx
from psk_soft_tpu.ops.crc import CRC16_CCITT
from psk_soft_tpu.ops.fec import CODE_K7, conv_encode, info_bits_for
from psk_soft_tpu.ops.framesync import FrameFormat
from psk_soft_tpu.ops.scramble import prbs15
from psk_soft_tpu.runtime.crc import FrameCrcChecker
from psk_soft_tpu.runtime.engine import FullKernelBatchEngine
from psk_soft_tpu.runtime.fec import FecFrameDecoder, StreamFecDecoder
from psk_soft_tpu.runtime.framesync import FrameSyncer
from psk_soft_tpu.runtime.scramble import FrameDescrambler
from psk_soft_tpu.runtime.streams import SRI


def framed_chain():
    C, sps = 128, 8
    rng = np.random.default_rng(17)
    fmt = FrameFormat(uw=tuple(rng.integers(0, 4, 32)), payload=64, m=4,
                      threshold=0.7)
    lf = prbs15()
    cap = info_bits_for(CODE_K7, fmt.payload * 2)      # 58
    n_msg = cap - CRC16_CCITT.degree                   # 42
    starts = list(range(600, 3400, 400))
    truth, rows = {}, []
    for c in range(C):
        infos = [rng.integers(0, 2, n_msg, np.int8) for _ in starts]
        for s0, i in zip(starts, infos):
            truth[(c, s0)] = i
        idx = tx.frame_stream(fmt, infos, starts, 4096, code=CODE_K7,
                              lfsr=lf, crc=CRC16_CCITT, interleave_rows=8,
                              labeling="gray", seed=300 + c)
        x = tx.shape(4, idx, sps)
        x = x * np.exp(2j * np.pi * 0.7)
        x = x + 0.05 * (rng.standard_normal(x.size)
                        + 1j * rng.standard_normal(x.size))
        rows.append(x.astype(np.complex64))
    rx = np.stack(rows)

    cfg = DemodConfig(sps=sps, num_avg=50, constellation_size=4,
                      phase_avg=50)
    eng = FullKernelBatchEngine(cfg, C, block_symbols=256)
    eng.set_input_sri(SRI(stream_id="hw3c"))
    sync = FrameSyncer(eng, fmt)
    top = FrameCrcChecker(
        FrameDescrambler(
            FecFrameDecoder(sync, CODE_K7, interleave_rows=8,
                            labeling="gray"), lf), CRC16_CCITT)
    need = 256 * sps
    for pos in range(0, rx.shape[1] - need + 1, need):
        for c in range(C):
            sync.push(c, rx[c, pos:pos + need])
        top.step_packets()
    top.flush_packets()
    frames = top.pop_frames()
    exact = sum(np.array_equal(f.info_bits, truth[(f.channel, f.start)])
                for f in frames)
    n_expected = C * len(starts)
    print(f"framed: {len(frames)}/{n_expected} exact={exact} "
          f"crc_failures={top.crc_failures} "
          f"suspect={sum(f.suspect for f in frames)}")
    assert len(frames) == n_expected == exact
    assert top.crc_failures == 0


def stream_fec():
    C, n_bits = 128, 4096
    rng = np.random.default_rng(18)
    bits = rng.integers(0, 2, (C, n_bits), np.int8)
    coded = np.asarray(conv_encode(CODE_K7, bits, terminate=False))
    syms = tx.symbols_to_iq(
        4, tx.bits_to_symbols(4, coded.reshape(-1), "gray").reshape(C, -1))
    noisy = (syms + 0.1 * (rng.standard_normal(syms.shape)
                           + 1j * rng.standard_normal(syms.shape))
             ).astype(np.complex64)
    dec = StreamFecDecoder(C, CODE_K7, m=4, depth=70, block_steps=512,
                           labeling="gray")
    # warm-up/compile pass
    dec.observe(noisy[:, :2048 // 2])
    t0 = time.perf_counter()
    dec.observe(noisy[:, 1024:])
    dec.finalize()
    dt = time.perf_counter() - t0
    got = dec.pop_bits()
    assert got.shape == bits.shape
    assert np.array_equal(got, bits)
    rate = C * (n_bits - 1024) / dt
    print(f"stream-fec: exact over {C}x{n_bits} bits; "
          f"steady decode ~{rate / 1e6:.1f} Minfobits/s "
          f"(batch {C}, incl. host hops)")


def main():
    dev = jax.devices()[0]
    print("platform:", dev.platform, dev.device_kind)
    framed_chain()
    stream_fec()
    print("HWCHECK_R03C PASS")


if __name__ == "__main__":
    main()
