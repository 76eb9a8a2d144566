"""Per-stage on-chip timing of the seam receive chain (round 5).

Times four nested one-launch programs on the real chip (scan-amortized,
checksum-forced): demod alone, + seam sync, + LLR+Viterbi, + CRC (the
full chain).  Differences give the stage costs that set the chain's
input-rate gap to demod-alone (VERDICT r4 item 3).

PYTHONPATH=/root/repo:/root/.axon_site python scripts/chain_stage_split.py
"""

import functools
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import numpy as np
import jax
import jax.numpy as jnp

from psk_soft_tpu import DemodConfig
from psk_soft_tpu.models.blockpsk import demod_block_ff, ff_init
from psk_soft_tpu.models.chain import (commit_bounds, make_seam_tail_fn,
                                       seam_tail_init)
from psk_soft_tpu.models.full import demod_block_full, full_from_ff
from psk_soft_tpu.ops.crc import CRC16_CCITT
from psk_soft_tpu.ops.fec import CODE_K7, psk_llrs
from psk_soft_tpu.ops.framesync import FrameFormat, sync_extract_topk_tm
from psk_soft_tpu.ops.pallas.viterbi_kernel import viterbi_decode_pallas
from psk_soft_tpu.utils.transfer import to_device


def build(C=1024, S=512, sps=8, payload=64, uw_len=32):
    from bench import _plant_unaligned_frames   # shared TX plan

    cfg = DemodConfig(sps=sps, num_avg=100, constellation_size=4,
                      phase_avg=50)
    code, crc = CODE_K7, CRC16_CCITT
    rng = np.random.default_rng(12)
    fmt = FrameFormat(uw=tuple(rng.integers(0, 4, uw_len)),
                      payload=payload, m=4, threshold=0.7)
    _, k_frames, _, x_np, _, _ = _plant_unaligned_frames(
        C, S, sps, fmt, code, crc, rng)
    st_ff = ff_init(cfg, (C,))
    warm = jax.jit(jax.vmap(lambda s, b: demod_block_ff(cfg, s, b)))
    st_ff, _ = warm(st_ff, to_device(x_np))
    state = full_from_ff(cfg, st_ff)
    x_re = jnp.asarray(np.ascontiguousarray(x_np.real.T))
    x_im = jnp.asarray(np.ascontiguousarray(x_np.imag.T))
    return cfg, fmt, code, crc, k_frames, state, x_re, x_im, C, S, sps


def time_variant(body, carry, x_re, x_im, iters=100, reps=3):
    @functools.partial(jax.jit, static_argnames=("k",))
    def run_k(st, x_re, x_im, k):
        def sbody(s, _):
            s2, chk = body(s, x_re, x_im)
            return s2, chk
        st, chks = jax.lax.scan(sbody, st, None, length=k)
        return st, jnp.sum(chks)

    carry, _ = run_k(carry, x_re, x_im, 2)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        carry, chk = run_k(carry, x_re, x_im, iters)
        float(chk)
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    cfg, fmt, code, crc, k, state, x_re, x_im, C, S, sps = build()
    step = functools.partial(demod_block_full, cfg, debug_ports=False)
    tail = make_seam_tail_fn(fmt, code, k, crc=crc, labeling="gray")
    lo, hi = commit_bounds(fmt, S)
    nb = 2
    n_rows = C * k

    def demod_only(st, x_re, x_im):
        st2, fo = step(st, x_re, x_im)
        return st2, jnp.sum(fo.soft_re) + jnp.sum(fo.bits_packed)

    def demod_sync(carry, x_re, x_im):
        st, tre, tim = carry
        st2, fo = step(st, x_re, x_im)
        ext_re = jnp.concatenate([tre, fo.soft_re], axis=0)
        ext_im = jnp.concatenate([tim, fo.soft_im], axis=0)
        sync = sync_extract_topk_tm(ext_re, ext_im, fmt, k,
                                    commit_lo=lo, commit_hi=hi)
        chk = (jnp.sum(sync.payloads.real) + sync.found.sum()
               + sync.count.sum())
        return (st2, ext_re[S:], ext_im[S:]), chk

    def demod_sync_vit(carry, x_re, x_im):
        st, tre, tim = carry
        st2, fo = step(st, x_re, x_im)
        ext_re = jnp.concatenate([tre, fo.soft_re], axis=0)
        ext_im = jnp.concatenate([tim, fo.soft_im], axis=0)
        sync = sync_extract_topk_tm(ext_re, ext_im, fmt, k,
                                    commit_lo=lo, commit_hi=hi)
        llr = psk_llrs(fmt.m, sync.payloads.reshape(n_rows, fmt.payload),
                       labeling="gray")
        bits = viterbi_decode_pallas(
            code, llr.reshape(n_rows, fmt.payload * nb), interpret=False)
        chk = bits.astype(jnp.int32).sum() + sync.found.sum()
        return (st2, ext_re[S:], ext_im[S:]), chk

    def full_chain(carry, x_re, x_im):
        st, t = carry
        st2, fo = step(st, x_re, x_im)
        t2, out = tail(t, fo.soft_re, fo.soft_im)
        chk = (out.msg.astype(jnp.int32).sum() + out.found.sum()
               + out.ok.sum() + out.count.sum())
        return (st2, t2), chk

    t0 = seam_tail_init(fmt, C)
    res = {}
    res["demod"] = time_variant(demod_only, state, x_re, x_im)
    res["demod+sync"] = time_variant(
        demod_sync, (state, t0.tail_re, t0.tail_im), x_re, x_im)
    res["demod+sync+vit"] = time_variant(
        demod_sync_vit, (state, t0.tail_re, t0.tail_im), x_re, x_im)
    res["full"] = time_variant(full_chain, (state, t0), x_re, x_im)
    samp = C * S * sps
    for name, sec in res.items():
        print(f"{name:16s} {sec * 1e3:7.3f} ms/block   "
              f"{samp / sec / 1e9:6.2f} Gsps", flush=True)
    d = res
    print(f"stages: demod {d['demod']*1e3:.3f}  "
          f"sync +{(d['demod+sync'] - d['demod'])*1e3:.3f}  "
          f"llr+vit +{(d['demod+sync+vit'] - d['demod+sync'])*1e3:.3f}  "
          f"crc+asm +{(d['full'] - d['demod+sync+vit'])*1e3:.3f} ms")


if __name__ == "__main__":
    main()
