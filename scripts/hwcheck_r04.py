"""Hardware check: round-4 items on the real chip.

VERDICT r3 item 4a: the time-sharded flagship had only ever run in
interpret mode (`__graft_entry__.py` dryrun, CPU-mesh tests) -- Mosaic
compilation *under shard_map* was unproven on silicon.  This check compiles
`make_time_sharded_full_demod` with ``interpret=False`` on a 1x1
(chan x time) mesh on the axon TPU and gates its outputs against the XLA
feed-forward reference, for both the plain QPSK profile and the
RRC + fractional-timing profile.

VERDICT r3 item 1 (measurement leg): the Mosaic Viterbi kernel
(`ops/pallas/viterbi_kernel.py`) decoding K=7 rate-1/2 on-chip at >= 512
decode rows, gated exact against the XLA scan decoder and against the
transmitted bits, with a measured info-bit throughput (target >= 100
Minfobits/s vs round-3's 2.2).

Anchors: the sequential bit pipeline this replaces,
/root/reference/cpp/psk_soft.cpp:502-566, 605-615; the launch surface the
mesh generalizes, /root/reference/cpp/main.cpp:24-29.

Usage: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon,cpu \
           python scripts/hwcheck_r04.py
(the cpu backend hosts the XLA feed-forward parity reference; the axon
relay's TPU backend does not implement every op the scan reference needs)
"""

import os
import time

os.environ["JAX_PLATFORMS"] = "axon,cpu"

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from psk_soft_tpu import DemodConfig
from psk_soft_tpu.models.blockpsk import ff_init, make_ff_demod_fn
from psk_soft_tpu.parallel.mesh import make_mesh
from psk_soft_tpu.parallel.sharded_full import make_time_sharded_full_demod
from psk_soft_tpu.ops import fec
from psk_soft_tpu.ops.pallas import viterbi_kernel

C, NS, SPS = 128, 4096, 8


def _signals(m=4, pulse="impulse"):
    """Bank of C PSK streams with small CFO + noise.

    "impulse": energy concentrated in one intra-symbol bin so the timing
    argmax is decisive across backends (rect pulses put equal signal energy
    in every bin and the cross-backend tie then resolves by noise rounding).
    "rrc": matched-filter-peaked pulses from the shared test generator.
    """
    if pulse == "rrc":
        from psk_soft_tpu.testing.signals import gen_psk_channel
        return np.stack([
            gen_psk_channel(NS, sps=SPS, m=m, seed=900 + i, snr_db=25,
                            freq_offset=1e-4, pulse="rrc")[0]
            for i in range(C)])
    out = []
    for i in range(C):
        rng = np.random.default_rng(i)
        j = rng.integers(0, m, NS)
        pts = np.exp(2j * np.pi * j / m)
        x = np.zeros(NS * SPS, np.complex64)
        x[3::SPS] = pts * np.exp(2j * np.pi * 1e-4 * SPS * np.arange(NS))
        x = x + (0.01 * rng.standard_normal(x.size)).astype(np.complex64)
        out.append(x.astype(np.complex64))
    return np.stack(out)


def check_sharded_flagship(profile: str):
    """Compile the time-sharded kernel (interpret=False) on a 1x1 mesh."""
    if profile == "rrc":
        # BASELINE config-3 profile: 8-PSK + RRC matched filter +
        # fractional timing (tests/test_time_sharded_full.py twin).
        cfg = DemodConfig(sps=SPS, num_avg=50, constellation_size=8,
                          phase_avg=20, matched_filter="rrc", rrc_beta=0.35,
                          rrc_span=8, timing_interp=True)
        xs = _signals(m=8, pulse="rrc")
        tol = 3e-2
    else:
        cfg = DemodConfig(sps=SPS, num_avg=50, constellation_size=4,
                          phase_avg=20)
        xs = _signals()
        # Max soft error vs the CPU XLA reference is phase-tracker precision
        # skew (TPU octant atan2 + float32 rounding feeding the linear-fit
        # trend over 4k symbols); round-2 measured the same family on-chip
        # at phase_err up to 2.3e-2 (docs/HWCHECK_r02.md).  Logic errors
        # would show as timing-index mismatches or a large mean -- both
        # gated tight below.
        tol = 3e-2
    mesh = make_mesh(chan=1, time=1)
    run = make_time_sharded_full_demod(cfg, mesh, NS, s_tile=128,
                                       interpret=False)
    sh = NamedSharding(mesh, P("time", "chan"))
    x_re = jax.device_put(jnp.asarray(np.ascontiguousarray(xs.real.T)), sh)
    x_im = jax.device_put(jnp.asarray(np.ascontiguousarray(xs.imag.T)), sh)
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(x_re, x_im))
    t_compile = time.perf_counter() - t0

    # Checksum-forced timing: the relay's block_until_ready returns before
    # execution completes, so fetch a scalar depending on every output.
    def _chk(a, b):
        o = run(a, b)
        return sum(jnp.sum(jnp.abs(v.astype(jnp.float32))) for v in o)

    chk = jax.jit(_chk)
    float(chk(x_re, x_im))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chk(x_re, x_im))
        ts.append(time.perf_counter() - t0)
    t_run = min(ts)

    soft_re, soft_im, phase, packed, idx, valid = out
    soft_sh = (np.asarray(soft_re) + 1j * np.asarray(soft_im)).T
    valid = np.asarray(valid).T
    idx_sh = np.asarray(idx).T

    # XLA feed-forward reference on the host CPU backend (the axon relay
    # does not implement every op the scan reference uses).
    with jax.default_device(jax.devices("cpu")[0]):
        fn = make_ff_demod_fn(cfg, channels=C)
        _, ref = jax.block_until_ready(fn(ff_init(cfg, (C,)),
                                          jnp.asarray(xs)))
    a1 = cfg.num_avg - 1
    soft_ff = np.zeros((C, NS), np.complex64)
    soft_ff[:, : NS - a1] = np.asarray(ref.soft)[:, a1:]
    idx_ff = np.zeros((C, NS), np.float64)
    idx_ff[:, : NS - a1] = np.asarray(ref.sample_index)[:, a1:]

    assert valid.any() and (~valid).any()
    m = cfg.constellation_size
    diffs = [soft_sh[valid] * np.exp(2j * np.pi * r / m) - soft_ff[valid]
             for r in range(m)]
    r_best = int(np.argmin([np.abs(d).max() for d in diffs]))
    err_max = np.abs(diffs[r_best]).max()
    err_mean = np.abs(diffs[r_best]).mean()
    # timing_interp yields fractional indices; precision-tolerant compare.
    idx_mis = int((np.abs(idx_sh[valid].astype(np.float64)
                          - idx_ff[valid]) > 1e-3).sum())
    rate = xs.size / t_run
    print(f"sharded-flagship[{profile}]: compiled Mosaic under shard_map "
          f"(1x1 mesh, interpret=False); vs XLA ff max|err|={err_max:.4f} "
          f"mean={err_mean:.1e} (tol {tol}) idx_mis={idx_mis}; "
          f"compile {t_compile:.1f}s, run {t_run * 1e3:.1f}ms "
          f"= {rate / 1e9:.2f} Gsps over {C} ch")
    assert err_max < tol, (profile, err_max)
    assert err_mean < 5e-3, (profile, err_mean)
    assert idx_mis == 0, (profile, idx_mis)


def check_viterbi_onchip(rows, info_bits=4096, min_rate=100e6,
                        code_name="K7"):
    """Mosaic Viterbi, compiled (K=7 rate-1/2 by default; K=9 leg pins
    the 256-state layout on silicon).

    Timing is checksum-forced: the axon relay's ``block_until_ready``
    returns before device execution completes, so each timed call fetches a
    scalar that data-depends on every decoded bit.  Exactness is gated with
    full coverage ON DEVICE (mismatch count vs transmitted bits fetched as
    a scalar) -- no multi-MB relay fetch -- plus a host spot-check of the
    first rows against the XLA scan decoder.
    """
    code = getattr(fec, f"CODE_{code_name}")
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, (rows, info_bits)).astype(np.int8)
    coded = fec.conv_encode(code, jnp.asarray(bits))
    llrs = jax.device_put(fec.hard_llrs(coded))
    want = jax.device_put(jnp.asarray(bits))

    def _dec(y):
        return viterbi_kernel.viterbi_decode_pallas(code, y,
                                                    interpret=False)

    timed = jax.jit(lambda y: _dec(y).astype(jnp.int32).sum())
    mism = jax.jit(lambda y, w: (_dec(y) != w).sum())
    dec_head = jax.jit(lambda y: _dec(y))

    t0 = time.perf_counter()
    float(timed(llrs))
    t_compile = time.perf_counter() - t0
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(timed(llrs))          # scalar fetch forces completion
        ts.append(time.perf_counter() - t0)
    rate = rows * info_bits / min(ts)

    n_bad = int(mism(llrs, want))
    assert n_bad == 0, f"{n_bad} decoded bits != transmitted"
    ref = np.asarray(jax.block_until_ready(
        jax.jit(lambda y: fec.viterbi_decode(code, y))(llrs[:8])))
    head = np.asarray(dec_head(llrs[:8]))
    assert np.array_equal(head, ref), "kernel != XLA scan decoder"
    print(f"viterbi-kernel: {code_name} rate-1/2, {rows} rows x {info_bits} info "
          f"bits, exact vs tx bits (device-side, full) + XLA decoder; "
          f"compile {t_compile:.1f}s, {rate / 1e6:.0f} Minfobits/s on-chip "
          f"(checksum-forced)")
    assert rate >= min_rate, rate
    return rate


def check_device_framesync(C=1024, S=4096):
    """Device-resident frame sync at flagship channel count (VERDICT r3
    item 2): the retained buffer, correlation, local-max detection, and
    payload extraction all run on device; the host sees only sparse
    candidates + committed payload rows."""
    from psk_soft_tpu.ops import slicers
    from psk_soft_tpu.ops.framesync import FrameFormat, correlate_uw
    from psk_soft_tpu.ops.framesync import psk_points
    from psk_soft_tpu.runtime.framesync import FrameSyncer
    from psk_soft_tpu.utils.transfer import to_device, to_host

    rng = np.random.default_rng(4)
    fmt = FrameFormat(uw=tuple(rng.integers(0, 4, 32)), payload=64, m=4,
                      threshold=0.7)
    idx = rng.integers(0, 4, (C, S))
    starts = list(range(50, S - fmt.frame_len - 50, 4 * fmt.frame_len))
    for c in range(C):
        for s0 in starts:
            idx[c, s0:s0 + fmt.uw_len] = fmt.uw
    soft = psk_points(idx.reshape(-1), 4).reshape(C, S)
    soft = (soft + 0.05 * (rng.standard_normal((C, S))
                           + 1j * rng.standard_normal((C, S)))
            ).astype(np.complex64)

    blocks = 8
    devblocks = [to_device(soft[:, i * (S // blocks):(i + 1) * (S // blocks)])
                 for i in range(blocks)]
    sync = FrameSyncer(C, fmt)
    frames = []
    for b in devblocks:                      # warm the compiled programs
        frames += sync.observe_device(b)
    frames += sync.finalize()
    n_want = C * len(starts)
    assert len(frames) == n_want, (len(frames), n_want)
    ok = 0
    for f in frames[:64]:
        ideal = psk_points(idx[f.channel, f.start + fmt.uw_len:
                               f.start + fmt.frame_len], 4)
        want = np.asarray(slicers.slice_bits(4, to_device(ideal[None]))
                          )[0][:, :2]
        ok += np.array_equal(f.bits.reshape(-1, 2), want)
    assert ok == 64, ok

    sync2 = FrameSyncer(C, fmt)
    t0 = time.perf_counter()
    n2 = 0
    for b in devblocks:
        n2 += len(sync2.observe_device(b))
    n2 += len(sync2.finalize())
    dt = time.perf_counter() - t0
    assert n2 == n_want
    rate = C * S / dt
    nb = 2
    host_bytes = n2 * (16 + fmt.payload * (8 + nb)) + 3 * blocks * 8
    plane_bytes = C * (S - fmt.uw_len + 1) * 12      # legacy corr+norm fetch
    # Old-path cost for contrast: one full corr+norm plane fetch.
    t0 = time.perf_counter()
    _ = to_host(correlate_uw(to_device(soft), fmt.points))
    dt_old = time.perf_counter() - t0
    print(f"device-framesync: {C} ch x {S} syms, {n2} frames exact; "
          f"{rate / 1e6:.1f} Msym/s sync rate; host bytes "
          f"{host_bytes / 1e6:.1f} MB (= frames x payload wire size; legacy "
          f"path fetched {plane_bytes / 1e6:.0f} MB of planes); one legacy "
          f"full-plane fetch alone: {dt_old:.2f}s "
          f"({dt_old / dt:.0f}x the whole sparse run)")
    return rate


def check_chain(C=1024, S=512, min_rate=120e6):
    """The one-launch receive chain (models/chain.make_chain_fn) on-chip:
    correctness gated (frames found at exact positions, payloads decoding
    to the transmitted message bits, CRCs green), then scan-amortized
    checksum-forced throughput -- the regression anchor for the chain
    bench (bench.py --profile chain)."""


    from psk_soft_tpu.models.blockpsk import demod_block_ff, ff_init
    from psk_soft_tpu.models.chain import (chain_init, chain_msg_bits,
                                           make_chain_fn)
    from psk_soft_tpu.models.full import full_from_ff
    from psk_soft_tpu.ops import tx
    from psk_soft_tpu.ops.crc import CRC16_CCITT
    from psk_soft_tpu.ops.fec import CODE_K7
    from psk_soft_tpu.ops.framesync import FrameFormat
    from psk_soft_tpu.utils.transfer import to_device

    cfg = DemodConfig(sps=SPS, num_avg=100, constellation_size=4,
                      phase_avg=50)
    code, crc = CODE_K7, CRC16_CCITT
    rng = np.random.default_rng(12)
    fmt = FrameFormat(uw=tuple(rng.integers(0, 4, 32)), payload=64, m=4,
                      threshold=0.7)
    n_msg = chain_msg_bits(fmt, code, crc)
    a1 = cfg.num_avg - 1
    rows = [120, 280]
    starts = [r - a1 for r in rows]
    infos = [rng.integers(0, 2, n_msg, np.int8) for _ in rows]
    idx_row = tx.frame_stream(fmt, infos, starts, S, code=code, crc=crc,
                              labeling="gray", seed=3)
    x_np = np.repeat(np.exp(1j * (2 * np.pi
                                  * np.tile(idx_row, (C, 1)) / 4 + 0.4)),
                     SPS, axis=1).astype(np.complex64)
    x_np += (0.01 * (rng.standard_normal(x_np.shape)
                     + 1j * rng.standard_normal(x_np.shape))
             ).astype(np.complex64)
    st_ff = ff_init(cfg, (C,))
    warm = jax.jit(jax.vmap(lambda s, b: demod_block_ff(cfg, s, b)))
    st_ff, _ = warm(st_ff, to_device(x_np))
    state = chain_init(fmt, C, full_from_ff(cfg, st_ff))
    x_re = jnp.asarray(np.ascontiguousarray(x_np.real.T))
    x_im = jnp.asarray(np.ascontiguousarray(x_np.imag.T))

    step = make_chain_fn(cfg, fmt, code, len(rows), crc=crc)
    sj = jax.jit(step)
    state, out = sj(state, x_re, x_im)
    state, out = sj(state, x_re, x_im)               # steady block
    assert np.asarray(out.found).all(), "chain: frames missed"
    assert (np.asarray(out.pos) == np.tile(rows, (C, 1))).all()
    assert np.asarray(out.ok).all(), "chain: CRC failures"
    assert np.array_equal(np.asarray(out.msg),
                          np.tile(np.stack(infos), (C, 1, 1)))

    iters = 100

    @jax.jit
    def run_k(st):
        def body(s, _):
            s2, o = step(s, x_re, x_im)
            return s2, (o.msg.astype(jnp.int32).sum() + o.found.sum()
                        + o.ok.sum())
        st, chks = jax.lax.scan(body, st, None, length=iters)
        return st, jnp.sum(chks)

    state, chk = run_k(state)
    float(chk)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, chk = run_k(state)
        float(chk)
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / iters
    n_info = n_msg + crc.degree
    rate = C * len(rows) * n_info / dt
    print(f"chain: {C} ch x {S} syms, {len(rows)} frames/ch exact "
          f"(pos/CRC/info bits); {rate / 1e6:.0f} Minfobits/s "
          f"({C * S * SPS / dt / 1e9:.2f} Gsps input, checksum-forced)")
    assert rate >= min_rate, f"chain rate {rate / 1e6:.0f}M < target"
    return rate


def main():
    dev = jax.devices()[0]
    print("platform:", dev.platform, dev.device_kind)
    check_sharded_flagship("plain")
    check_sharded_flagship("rrc")
    check_viterbi_onchip(rows=2048)                     # VERDICT gate
    check_viterbi_onchip(rows=8192, min_rate=200e6)     # chip-filling batch
    check_viterbi_onchip(rows=1024, info_bits=1024, min_rate=10e6,
                         code_name="K9")               # 256-state layout
    check_device_framesync()
    check_chain()                                       # one-launch chain
    print("HWCHECK_R04 PASS")


if __name__ == "__main__":
    main()
