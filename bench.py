"""Headline benchmark: multi-channel QPSK streaming demod throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/s", "vs_baseline": N}

Baseline (BASELINE.md north star): >10 Gsamples/s aggregate for 1k-channel
QPSK on a v5e-16 slice => 625 Msamples/s per chip.  vs_baseline is the
per-chip throughput divided by that per-chip share.

The measured pipeline is the streaming feed-forward flagship
(models/blockpsk.py) carrying real state block-to-block: 1024 channels,
QPSK, sps=8, numAvg=100, phaseAvg=50 -- the reference's test operating point
(tests/test_psk_soft.py:191-193) at scale.
"""

import argparse
import copy
import json
import os
import subprocess
import sys
import time

import numpy as np


PER_CHIP_BASELINE = 10e9 / 16  # north-star aggregate / v5e-16 chips

# Degraded tunnel windows show a per-block-step floor (~17 ms observed)
# that is NOT proportional to block size, capping the default 512-symbol
# block at ~0.25-2.3 Gsps while fast windows reach >40 Gsps on the same
# program (README "measured ranges").  A full-kernel rate below this is
# unambiguously a floor-dominated window -- retry with a bigger block to
# amortize the floor.
DEGRADED_RATE = 3e9


def _qpsk_block(C, symbols, sps, seed=0):
    """The bench's standard C-channel QPSK block (slow residual CFO, 1%
    noise) -- one deterministic generator so every variant measures the
    same signal content."""
    rng = np.random.default_rng(seed)
    sym = rng.integers(0, 4, size=(C, symbols))
    pts = np.exp(1j * (2 * np.pi * sym / 4
                       + 2 * np.pi * 1e-4 * np.arange(symbols)))
    x = np.repeat(pts, sps, axis=1).astype(np.complex64)
    x += (0.01 * rng.standard_normal(x.shape)).astype(np.complex64)
    return x


def _await_backend():
    """Wait out tunneled-TPU outage windows before touching jax.

    The axon backend has observed outages where init raises UNAVAILABLE
    ("TPU backend setup/compile error") for tens of minutes.  This bench is
    run unattended (once, at round end), so probe device init in a
    SUBPROCESS (a failed init poisons the parent's backend cache) and
    retry until it succeeds or PSK_BENCH_WAIT_S (default 900) elapses --
    then proceed and let the real failure surface."""
    max_wait = float(os.environ.get("PSK_BENCH_WAIT_S", "900"))
    t0 = time.monotonic()
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, text=True, timeout=600)
            ok = r.returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if ok:
            return
        waited = time.monotonic() - t0
        if waited > max_wait:
            print(f"backend probe still failing after {waited:.0f}s; "
                  f"proceeding anyway", file=sys.stderr)
            return
        print(f"device backend unavailable ({waited:.0f}s elapsed); "
              f"retrying in 60s", file=sys.stderr)
        time.sleep(60)


def _cpu_fallback(args):
    """Last resort when every device pipeline failed (backend outage):
    re-measure the ff pipeline on the CPU backend in a subprocess (the
    parent's jax backend cache is poisoned by the failed init) so the
    round still records a real, honestly-labeled data point."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # axon registration rides this
    env["JAX_PLATFORMS"] = "cpu"
    env["PSK_BENCH_WAIT_S"] = "0"
    env["PSK_BENCH_OUTAGE"] = "1"
    cmd = [sys.executable, os.path.abspath(__file__), "--pipeline", "ff",
           "--channels", str(min(args.channels, 256)),
           "--symbols", str(min(args.symbols, 256)),
           "--sps", str(args.sps),
           "--iters", "20", "--reps", "3", "--warmup", "1"]
    return subprocess.run(cmd, env=env, timeout=3600).returncode


def emit(C, label, rate):
    import jax
    kind = jax.devices()[0].device_kind
    if os.environ.get("PSK_BENCH_OUTAGE"):
        kind += "; TPU backend outage at measurement time"
    print(json.dumps({
        "metric": f"{C}-channel QPSK streaming demod throughput "
                  f"({label}, {kind})",
        "value": rate,
        "unit": "samples/s",
        "vs_baseline": rate / PER_CHIP_BASELINE,
    }))
    return 0


def run_ff(args, cfg, C, T, x_np):
    """XLA feed-forward pipeline; returns the measured rate.

    All iters run inside ONE dispatch (lax.scan) and the timed region ends
    with a host fetch of a checksum that data-depends on every output --
    per-dispatch relay overhead is amortized and deferred-execution tricks
    cannot inflate the number.
    """
    import functools
    import jax
    import jax.numpy as jnp
    from psk_soft_tpu.models.blockpsk import demod_block_ff, ff_init
    from psk_soft_tpu.utils.transfer import to_device

    state = ff_init(cfg, (C,))
    x = to_device(x_np)
    step = jax.vmap(functools.partial(demod_block_ff, cfg))

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_k(state, x, k):
        def body(st, _):
            st2, out = step(st, x)
            chk = (jnp.sum(out.phase) + jnp.sum(out.soft.real)
                   + jnp.sum(out.bits) + jnp.sum(out.sample_index))
            return st2, chk
        st, chks = jax.lax.scan(body, state, None, length=k)
        return st, jnp.sum(chks)

    state, _ = run_k(state, x, args.warmup or 1)
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        state, chk = run_k(state, x, args.iters)
        float(chk)  # host fetch: forces true completion of all work
        best = min(best, time.perf_counter() - t0)
    return C * T * args.iters / best


def run_full(args, cfg, C, T, x_np, raw_tail=False, mixed=None):
    """Flagship: the single fused Pallas kernel (models/full.py), entered
    after converging through the flexible pipeline.

    raw_tail: pass the raw input tail to the handoff (matched-filter
    configs).  mixed: (ms, diffs) per-channel mode arrays (BASELINE
    config 4 on the kernel's mode planes).
    """
    import jax
    import jax.numpy as jnp
    from psk_soft_tpu.models.blockpsk import demod_block_ff, ff_init
    from psk_soft_tpu.models.full import demod_block_full, full_from_ff
    from psk_soft_tpu.utils.transfer import to_device

    import functools

    st_ff = ff_init(cfg, (C,))
    mixed_params = None
    if mixed is not None:
        from psk_soft_tpu.models.mixed import MixedParams, make_mixed_demod_fn
        mixed_params = MixedParams.make(*mixed)
        warm_fn = make_mixed_demod_fn(cfg)
        st_ff, _ = warm_fn(mixed_params, st_ff, to_device(x_np))
    else:
        warm = jax.jit(jax.vmap(lambda s, b: demod_block_ff(cfg, s, b)))
        st_ff, _ = warm(st_ff, to_device(x_np))
    raw = None
    if raw_tail:
        keep = (cfg.num_avg - 1) * cfg.sps + max(cfg.mf_ntaps - 1, 0)
        raw = x_np[:, x_np.shape[1] - keep:]
    state = full_from_ff(cfg, st_ff, raw_win=raw, mixed_params=mixed_params)
    in_scale = 1.0
    if getattr(args, "ingest", "f32") == "i16":
        # SDR wire format: int16 I/Q planes + scale, dequantized in VMEM --
        # half the f32 path's HBM input read (see demod_kernel int16 mode).
        from psk_soft_tpu.models.full import quantize_full_state
        in_scale = float(max(np.abs(x_np.real).max(),
                             np.abs(x_np.imag).max())) / 32000.0
        state = quantize_full_state(state, in_scale)
        x_re = jnp.asarray(np.ascontiguousarray(
            np.round(x_np.real.T / in_scale).astype(np.int16)))
        x_im = jnp.asarray(np.ascontiguousarray(
            np.round(x_np.imag.T / in_scale).astype(np.int16)))
    else:
        x_re = jnp.asarray(np.ascontiguousarray(x_np.real.T))
        x_im = jnp.asarray(np.ascontiguousarray(x_np.imag.T))

    soft_scale = 100.0 if getattr(args, "soft", "f32") == "i8" else None
    debug_ports = not getattr(args, "no_debug_ports", False)
    step = functools.partial(demod_block_full, cfg,
                             mixed=mixed is not None, in_scale=in_scale,
                             soft_i8_scale=soft_scale,
                             debug_ports=debug_ports)

    def chksum(out):
        s = jnp.sum(out.soft_re.astype(jnp.float32)) + jnp.sum(out.bits_packed)
        if out.phase is not None:       # debug planes compiled away otherwise
            s = s + jnp.sum(out.phase) + jnp.sum(out.sample_index)
        return s

    # Rolling-window mode when the config supports it: the kernel reads its
    # timing window in place from the previous block's HBM-resident planes
    # (here the repeated bench block -- numerically identical to the
    # window-carry path, which also sees the same block every iteration),
    # so the window-carry write+read disappears, exactly as on the
    # production engine's steady path (FullKernelBatchEngine._steady_step).
    if cfg.matched_filter == "none":
        from psk_soft_tpu.models.full import demod_block_full_rolling
        roll_step = functools.partial(demod_block_full_rolling, cfg,
                                      mixed=mixed is not None,
                                      in_scale=in_scale,
                                      soft_i8_scale=soft_scale,
                                      debug_ports=debug_ports)

        @functools.partial(jax.jit, static_argnames=("k",))
        def run_k_roll(planes, x_re, x_im, k):
            def body(p, _):
                p2, out = roll_step(p, x_re, x_im, x_re, x_im)
                return p2, chksum(out)
            p, chks = jax.lax.scan(body, planes, None, length=k)
            return p, jnp.sum(chks)

        try:
            planes, _ = run_k_roll(state.planes, x_re, x_im,
                                   args.warmup or 1)
        except ValueError:
            pass    # alignment/tile can't roll; fall through to the carry
        else:
            return _time_run_k(args, run_k_roll, planes, x_re, x_im, C, T,
                               warmed=True)

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_k(state, x_re, x_im, k):
        def body(st, _):
            st2, out = step(st, x_re, x_im)
            return st2, chksum(out)
        st, chks = jax.lax.scan(body, state, None, length=k)
        return st, jnp.sum(chks)

    return _time_run_k(args, run_k, state, x_re, x_im, C, T)


def _time_run_k(args, run_k, carry, x_re, x_im, C, T, warmed=False):
    """Shared warm-then-min-of-reps timing loop (fetch-forced): every
    measured pipeline variant uses THIS methodology so numbers stay
    comparable."""
    if not warmed:
        carry, _ = run_k(carry, x_re, x_im, args.warmup or 1)
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        carry, chk = run_k(carry, x_re, x_im, args.iters)
        float(chk)  # host fetch: forces true completion of all work
        best = min(best, time.perf_counter() - t0)
    return C * T * args.iters / best


def _plant_unaligned_frames(C, S, sps, fmt, code, crc, rng):
    """Shared TX plan for the chain/receiver benches (and the stage-split
    script): K7+CRC16 coded frames on an UNALIGNED cadence over the
    S-periodic stream, planted with wraparound so at least one frame
    straddles the block seam whenever S % cadence != 0.  Built batched
    (one CRC matmul + one conv_encode over all C*k frames; per-frame
    tx.build_frame would cost a device dispatch per frame).  No CFO so
    the repeated bench block is phase-continuous.

    Returns (starts, k_frames, infos (C,k,n_msg), x_np (C, S*sps),
    n_info, n_msg)."""
    import jax.numpy as jnp
    from psk_soft_tpu.ops import tx
    from psk_soft_tpu.ops.crc import append_crc
    from psk_soft_tpu.ops.fec import conv_encode, info_bits_for

    n_info = info_bits_for(code, fmt.payload * 2)
    n_msg = n_info - crc.degree
    cadence = max(fmt.separation, 104) + 1
    k_frames = S // cadence
    if k_frames == 0:
        raise ValueError("block too short for one frame; raise --symbols")
    starts = [(17 + j * cadence) % S for j in range(k_frames)]
    infos = rng.integers(0, 2, (C, k_frames, n_msg)).astype(np.int8)
    coded = np.asarray(conv_encode(code, jnp.asarray(
        append_crc(crc, infos))), np.int8)          # (C, k, payload*nb)
    pay_syms = tx.bits_to_symbols(4, coded, "gray")  # (C, k, payload)
    idx = rng.integers(0, 4, (C, S))
    uw_arr = np.asarray(fmt.uw, np.int64)
    for j, s0 in enumerate(starts):
        cols = (s0 + np.arange(fmt.frame_len)) % S      # wraparound plant
        idx[:, cols[:fmt.uw_len]] = uw_arr[None, :]
        idx[:, cols[fmt.uw_len:]] = pay_syms[:, j]
    x_np = np.repeat(np.exp(1j * (2 * np.pi * idx / 4 + 0.4)),
                     sps, axis=1).astype(np.complex64)
    x_np += (0.01 * (rng.standard_normal(x_np.shape)
                     + 1j * rng.standard_normal(x_np.shape))
             ).astype(np.complex64)
    return starts, k_frames, infos, x_np, n_info, n_msg


def run_chain(args):
    """One-number receive-chain benchmark: capture -> flagship demod
    kernel -> SEAM-CARRYING device frame sync -> Mosaic Viterbi -> CRC,
    composed as ONE jitted program per block (no host round trips inside
    the chain), info-bits/s with the standard fetch-forced timing.

    Round 5: the measured path is the seam chain (models/chain.py seam
    mode) on an UNALIGNED cadence -- frames are planted wherever the
    cadence lands them, including straddling the block seam -- and the
    warm-up asserts every planted frame is decoded exactly once per
    period (exact position, exact bits, CRC green) before anything is
    timed.  The round-4 bench required a cadence with p + frame_len <= S
    (containment); that restriction is gone because the chain carries a
    soft tail across blocks (VERDICT r4 item 1).  vs_baseline stays in
    the bench's standard unit (input samples/s against the per-chip
    north-star share).
    """
    import functools

    import jax
    import jax.numpy as jnp
    from psk_soft_tpu import DemodConfig
    from psk_soft_tpu.models.blockpsk import demod_block_ff, ff_init
    from psk_soft_tpu.models.full import demod_block_full, full_from_ff
    from psk_soft_tpu.models.chain import make_seam_tail_fn, seam_tail_init
    from psk_soft_tpu.ops.crc import CRC16_CCITT
    from psk_soft_tpu.ops.fec import CODE_K7
    from psk_soft_tpu.ops.framesync import FrameFormat
    from psk_soft_tpu.utils.transfer import to_device

    C, sps, S = args.channels, args.sps, args.symbols
    cfg = DemodConfig(sps=sps, num_avg=100, constellation_size=4,
                      phase_avg=50)
    code, crc = CODE_K7, CRC16_CCITT
    rng = np.random.default_rng(12)
    fmt = FrameFormat(uw=tuple(rng.integers(0, 4, args.uw_len)),
                      payload=args.payload, m=4, threshold=0.7)
    a1 = cfg.num_avg - 1
    starts, k_frames, infos, x_np, n_info, n_msg = \
        _plant_unaligned_frames(C, S, sps, fmt, code, crc, rng)
    rows = [(p + a1) % S for p in starts]       # detection rows (mod S)

    # Converge the tracker, hand off to the fused kernel (run_full recipe).
    st_ff = ff_init(cfg, (C,))
    warm = jax.jit(jax.vmap(lambda s, b: demod_block_ff(cfg, s, b)))
    st_ff, _ = warm(st_ff, to_device(x_np))
    state = full_from_ff(cfg, st_ff)
    in_scale = 1.0
    if getattr(args, "ingest", "f32") == "i16":
        # SDR wire format, as in run_full: int16 I/Q planes dequantized in
        # VMEM -- halves the demod's HBM input read, the chain's largest
        # single HBM term now that it is demod-dominated (r5 stage split).
        from psk_soft_tpu.models.full import quantize_full_state
        in_scale = float(max(np.abs(x_np.real).max(),
                             np.abs(x_np.imag).max())) / 32000.0
        state = quantize_full_state(state, in_scale)
        x_re = jnp.asarray(np.ascontiguousarray(
            np.round(x_np.real.T / in_scale).astype(np.int16)))
        x_im = jnp.asarray(np.ascontiguousarray(
            np.round(x_np.imag.T / in_scale).astype(np.int16)))
    else:
        x_re = jnp.asarray(np.ascontiguousarray(x_np.real.T))
        x_im = jnp.asarray(np.ascontiguousarray(x_np.imag.T))

    interp = jax.default_backend() != "tpu"   # CPU smoke runs interpret
    step = functools.partial(demod_block_full, cfg, debug_ports=False,
                             in_scale=in_scale, interpret=interp)
    tail_step = make_seam_tail_fn(fmt, code, k_frames, crc=crc,
                                  labeling="gray", interpret=interp)
    tail0 = seam_tail_init(fmt, C)

    def chain_body(carry, x_re, x_im):
        st, tail = carry
        st2, fo = step(st, x_re, x_im)
        tail2, out = tail_step(tail, fo.soft_re, fo.soft_im)
        return (st2, tail2), (out.msg, out.found, out.pos, out.ok,
                              out.count)

    def check_steady(msg, found, pos, ok, count):
        """Steady-state gate: exactly the k planted frames per period,
        each at its planted row (mod S), exact bits, CRC green."""
        msg, found, pos, ok, count = map(np.asarray,
                                         (msg, found, pos, ok, count))
        assert found.all(), f"missed {(~found).sum()} frames"
        assert (count == k_frames).all(), "unexpected extra peaks"
        assert ok.all(), f"{(~ok).sum()} CRC failures"
        pos_mod = np.mod(pos, S)
        # Commits come earliest-first; map each to its planted frame.
        order = {r: j for j, r in enumerate(rows)}
        for slot in range(k_frames):
            r = pos_mod[:, slot]
            assert (r == r[0]).all(), "channels disagree on positions"
            j = order.get(int(r[0]))
            assert j is not None, f"commit at unplanted row {int(r[0])}"
            assert (msg[:, slot] == infos[:, j]).all(), "info bits wrong"

    # Warm-up + correctness gate on the steady block, BEFORE timing.
    chain_jit = jax.jit(chain_body)
    carry = (state, tail0)
    carry, outs = chain_jit(carry, x_re, x_im)
    carry, outs = chain_jit(carry, x_re, x_im)
    carry, outs = chain_jit(carry, x_re, x_im)       # steady period
    check_steady(*outs)

    # Steady-state rolling-window mode (same as run_full / the production
    # engine's _steady_step): the kernel reads its timing window in place
    # from the previous block's HBM-resident planes, so the window-carry
    # write+read disappears.  Gated with the full frame/CRC/info asserts
    # before replacing the timed body.
    body = chain_body
    if cfg.matched_filter == "none":
        from psk_soft_tpu.models.full import demod_block_full_rolling
        roll_step = functools.partial(demod_block_full_rolling, cfg,
                                      debug_ports=False,
                                      in_scale=in_scale, interpret=interp)

        def chain_body_roll(carry, x_re, x_im):
            planes, tail = carry
            p2, fo = roll_step(planes, x_re, x_im, x_re, x_im)
            tail2, out = tail_step(tail, fo.soft_re, fo.soft_im)
            return (p2, tail2), (out.msg, out.found, out.pos, out.ok,
                                 out.count)

        st, tail = carry
        try:
            carry_r, outs = jax.jit(chain_body_roll)((st.planes, tail),
                                                     x_re, x_im)
        except ValueError:
            pass          # alignment/tile can't roll; keep the carry path
        else:
            check_steady(*outs)
            body, carry = chain_body_roll, carry_r

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_k(st, x_re, x_im, k):
        def sbody(s, _):
            s2, (m, f, p, o, n) = body(s, x_re, x_im)
            return s2, (m.astype(jnp.int32).sum() + f.sum() + o.sum()
                        + n.sum())
        st, chks = jax.lax.scan(sbody, st, None, length=k)
        return st, jnp.sum(chks)

    carry, _ = run_k(carry, x_re, x_im, args.warmup or 1)
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        carry, chk = run_k(carry, x_re, x_im, args.iters)
        float(chk)   # fetch forces completion of the whole chain
        best = min(best, time.perf_counter() - t0)
    info_rate = C * k_frames * n_info * args.iters / best
    sample_rate = C * S * sps * args.iters / best
    tag = " i16-ingest" if getattr(args, "ingest", "f32") == "i16" else ""
    print(json.dumps({
        "metric": f"{C}-channel receive-chain throughput (demod+seam "
                  f"sync+Viterbi+CRC one-program{tag}, {k_frames} frames/"
                  f"block/ch unaligned cadence, "
                  f"{jax.devices()[0].device_kind})",
        "value": info_rate,
        "unit": "infobits/s",
        "vs_baseline": sample_rate / PER_CHIP_BASELINE,
    }))
    return 0


def _chain_after_default(args, rc):
    """Default invocation emits BOTH headline metrics: the demod line just
    printed and the receive-chain infobits/s line (VERDICT r4 item 7 --
    the driver-benched artifact must regression-test the chain too).
    Chain failure downgrades to a warning so the demod point survives."""
    ch = copy.copy(args)
    ch.profile = "chain"
    ch.iters = max(20, args.iters // 2)
    try:
        run_chain(ch)
    except Exception as e:  # pragma: no cover - platform-specific
        print(f"chain profile failed ({type(e).__name__}: {e}); demod "
              f"metric only", file=sys.stderr)
    return rc


def run_mesh(args):
    """Scaling-efficiency reports (eval/scaling.py), one JSON line each."""
    import jax
    from psk_soft_tpu import DemodConfig
    from psk_soft_tpu.eval.scaling import (chain_scaling_report,
                                           channel_scaling_report,
                                           time_shard_report)

    if args.profile == "config3":
        cfg = DemodConfig(sps=args.sps, num_avg=100, constellation_size=8,
                          phase_avg=50, matched_filter="rrc", rrc_beta=0.35,
                          rrc_span=8, timing_interp=True)
    else:
        cfg = DemodConfig(sps=args.sps, num_avg=100, constellation_size=4,
                          phase_avg=50)
    on_cpu = jax.devices()[0].platform == "cpu"
    rep = channel_scaling_report(
        cfg, channels_per_device=min(args.channels, 256),
        symbols=min(args.symbols, 256), iters=max(2, args.iters // 50),
        reps=args.reps, pipeline="ff" if on_cpu else "full",
        interpret=False)
    print(json.dumps(rep))
    if args.profile == "chain":
        rep_c = chain_scaling_report(
            cfg, channels_per_device=128, symbols=512,
            iters=max(2, args.iters // 100), reps=args.reps,
            interpret=on_cpu)
        print(json.dumps(rep_c))
    if len(jax.devices()) > 1:
        rep_t = time_shard_report(
            cfg, channels=128, total_symbols=4096,
            iters=max(2, args.iters // 100), reps=args.reps,
            interpret=on_cpu)
        print(json.dumps(rep_t))
    return 0


def run_profile(args):
    """Non-default BASELINE configs on the flagship kernel."""
    import jax
    import jax.numpy as jnp
    from psk_soft_tpu import DemodConfig

    C = args.channels
    if args.profile == "config3":
        cfg = DemodConfig(sps=args.sps, num_avg=100, constellation_size=8,
                          phase_avg=50, matched_filter="rrc", rrc_beta=0.35,
                          rrc_span=8, timing_interp=True)
        rng = np.random.default_rng(0)
        sym = rng.integers(0, 8, size=(C, args.symbols))
        pts = np.exp(1j * (2 * np.pi * sym / 8 + 2 * np.pi * 1e-4
                           * np.arange(args.symbols)))
        up = np.zeros((C, args.symbols * args.sps), np.complex64)
        up[:, :: args.sps] = pts
        from psk_soft_tpu.ops.matched_filter import rrc_taps
        taps = rrc_taps(args.sps, 0.35, 8)
        x_np = np.stack([np.convolve(u, taps, mode="same") for u in up])
        x_np = x_np.astype(np.complex64)
        x_np += (0.01 * rng.standard_normal(x_np.shape)).astype(np.complex64)
        rate = run_full(args, cfg, C, x_np.shape[1], x_np,
                        raw_tail=True)
        return emit(C, "config3 8PSK+RRC+interp full-kernel", rate)
    # mixed: per-channel constellations/diff on the kernel's mode planes
    cfg = DemodConfig(sps=args.sps, num_avg=100, constellation_size=4,
                      phase_avg=50)
    rng = np.random.default_rng(0)
    ms = rng.choice([2, 4, 8], C)
    diffs = rng.random(C) < 0.5
    xs = []
    for i in range(C):
        r = np.random.default_rng(i)
        m = int(ms[i])
        j = r.integers(0, m, args.symbols)
        pts = np.exp(2j * np.pi * j / m)
        if diffs[i]:
            pts = np.cumprod(pts)
        x = np.repeat(pts * np.exp(2j * np.pi * 1e-4
                                   * np.arange(args.symbols)),
                      args.sps).astype(np.complex64)
        x += (0.01 * r.standard_normal(x.size)).astype(np.complex64)
        xs.append(x)
    x_np = np.stack(xs)
    rate = run_full(args, cfg, C, x_np.shape[1], x_np, mixed=(ms, diffs))
    return emit(C, "mixed-mode full-kernel", rate)


def run_engine(args):
    """End-to-end PRODUCTION-path throughput: native bank deframe ->
    engine device step -> four-port packet assembly (device->host fetch of
    every output block), at pipeline depths 0 and `--engine-depth`.

    Unlike the kernel benches, this includes all host-side work a deployed
    service does per block; every block's outputs are fetched, so deferred
    execution cannot inflate the number.
    """
    import jax
    from psk_soft_tpu import DemodConfig
    from psk_soft_tpu.runtime.engine import BatchEngine, FullKernelBatchEngine
    from psk_soft_tpu.runtime.native_bank import (NativeChannelBank,
                                                  NativePlaneBank)
    from psk_soft_tpu.runtime.streams import SRI

    cfg = DemodConfig(sps=args.sps, num_avg=100, constellation_size=4,
                      phase_avg=50)
    C, S = args.channels, args.symbols
    need = S * cfg.sps
    on_tpu = jax.devices()[0].platform != "cpu"

    # One block of sample-interleaved frames, pushed repeatedly (the
    # deframe cost per block is identical for any content).
    rng = np.random.default_rng(0)
    pts = np.exp(1j * (2 * np.pi * rng.integers(0, 4, (C, S)) / 4
                       + 2 * np.pi * 1e-4 * np.arange(S)))
    blk = np.repeat(pts, cfg.sps, axis=1).astype(np.complex64)
    blk += (0.01 * rng.standard_normal(blk.shape)).astype(np.complex64)
    frames32 = np.ascontiguousarray(blk.T).view(np.float32).ravel()
    scale = float(np.abs(frames32).max()) / 32000.0
    frames16 = np.round(frames32 / scale).astype(np.int16)

    nblocks = max(10, min(50, args.iters // 10))
    sri = SRI(stream_id="bench", xdelta=1e-6)
    for depth in sorted({0, max(0, args.engine_depth)}):
        i16 = args.ingest == "i16"
        if on_tpu and C % 128 == 0 and args.profile == "mixed":
            # Heterogeneous bank through the production mixed engine
            # (BASELINE config 4): one fused kernel launch per block.
            from psk_soft_tpu.models.mixed import MixedParams
            from psk_soft_tpu.runtime.engine import MixedKernelBatchEngine
            ms = rng.choice([2, 4, 8], C)
            eng = MixedKernelBatchEngine(
                MixedParams.make(ms, rng.random(C) < 0.5), cfg, C,
                block_symbols=S, pipeline_depth=depth,
                ingest_scale=scale if i16 else None,
                soft_i8=args.soft == "i8")
            label = "mixed-bank engine"
            if i16:
                label += " i16-ingest"
            if args.soft == "i8":
                label += " soft-i8"
            bank = NativePlaneBank(C, capacity_samples=4 * need,
                                   dtype="i16" if i16 else "f32")
            frames = frames16 if i16 else frames32

            def feed_one():
                bank.push_interleaved(frames)
                re, im, _ = bank.pop_planes(need, timeout=0)
                eng.push_planes(re, im)
                return eng.step_packets()
        elif on_tpu and C % 128 == 0:
            # Production path: native plane bank deframes interleaved
            # frames straight to the kernel's (T, C) layout -- no host
            # transposes; i16 additionally halves wire + upload bytes.
            eng = FullKernelBatchEngine(
                cfg, C, block_symbols=S, pipeline_depth=depth,
                ingest_scale=scale if i16 else None,
                soft_i8=args.soft == "i8")
            label = ("full-kernel engine i16-ingest" if i16
                     else "full-kernel engine")
            if args.soft == "i8":
                label += " soft-i8"
            bank = NativePlaneBank(C, capacity_samples=4 * need,
                                   dtype="i16" if i16 else "f32")
            frames = frames16 if i16 else frames32

            def feed_one():
                bank.push_interleaved(frames)
                re, im, _ = bank.pop_planes(need, timeout=0)
                eng.push_planes(re, im)
                return eng.step_packets()
        else:
            eng = BatchEngine(cfg, C, block_symbols=S, pipeline_depth=depth)
            label = "ff engine"
            bank = NativeChannelBank(C, capacity_samples=4 * need)

            def feed_one():
                bank.push_interleaved(frames32)
                r = bank.pop_block(need, timeout=0)
                eng.push_block(r[0])
                return eng.step_packets()
        eng.set_input_sri(sri)

        # Warm-up: compile both stages and reach the steady kernel.
        for _ in range(max(3, (cfg.num_avg + cfg.phase_avg) // S + 2)):
            feed_one()
        emitted = 0
        t0 = time.perf_counter()
        fed = 0
        while emitted < nblocks:
            p = feed_one()
            fed += 1
            if p:
                emitted += 1
            if fed > 4 * nblocks:
                raise RuntimeError("engine starved")
        dt = time.perf_counter() - t0
        rate = emitted * C * need / dt
        print(json.dumps({
            "metric": f"{C}-channel QPSK end-to-end {label} throughput "
                      f"(pipeline_depth={depth}, "
                      f"{jax.devices()[0].device_kind})",
            "value": rate,
            "unit": "samples/s",
            "vs_baseline": rate / PER_CHIP_BASELINE,
        }))
    return 0


def run_receiver(args):
    """End-to-end PRODUCTION STREAMING RECEIVER benchmark (VERDICT r4
    item 2): native plane deframe -> FullKernelBatchEngine (device-tap) ->
    FrameSyncer -> FecFrameDecoder -> FrameCrcChecker -> pop_frames.

    This is the deployed service path -- the analog of the reference's
    complete serviceFunction + ports loop
    (/root/reference/cpp/psk_soft.cpp:346-618) -- with ALL host work a
    deployed receiver does per block: wire-format deframe, packet
    assembly, sparse sync candidate fetches, Viterbi drain, CRC strip,
    and per-frame Python object assembly.  Every popped frame is
    validated (CRC green + exact planted info bits).  Emits infobits/s
    with the input-samples/s ratio in vs_baseline, plus the gap to the
    one-launch chain quantified by running both is left to the caller
    (BENCH artifacts carry both lines).
    """
    import jax
    from psk_soft_tpu import DemodConfig
    from psk_soft_tpu.ops.crc import CRC16_CCITT
    from psk_soft_tpu.ops.fec import CODE_K7
    from psk_soft_tpu.ops.framesync import FrameFormat
    from psk_soft_tpu.runtime.receiver import build_receiver
    from psk_soft_tpu.runtime.streams import SRI

    import jax.numpy as jnp

    C, sps, S = args.channels, args.sps, args.symbols
    cfg = DemodConfig(sps=sps, num_avg=100, constellation_size=4,
                      phase_avg=50)
    code, crc = CODE_K7, CRC16_CCITT
    rng = np.random.default_rng(12)
    fmt = FrameFormat(uw=tuple(rng.integers(0, 4, args.uw_len)),
                      payload=args.payload, m=4, threshold=0.7)
    # Same content scheme as run_chain (shared helper): unaligned
    # cadence, wraparound plants -- seam-straddling frames are the
    # streaming FrameSyncer's home turf.
    starts, k_frames, infos, x_np, n_info, n_msg = \
        _plant_unaligned_frames(C, S, sps, fmt, code, crc, rng)
    # Planted info bits by detection offset (start mod S): the engine's
    # packet stream is aligned to input symbol indices (warm-up rows are
    # valid-masked, not dropped from the index space), so a frame at
    # input position p + iter*S syncs at start % S == p.
    by_off = {p % S: j for j, p in enumerate(starts)}

    need = S * sps
    on_tpu = jax.devices()[0].platform != "cpu"
    frames32 = np.ascontiguousarray(x_np.T).view(np.float32).ravel()

    use_full = on_tpu and C % 128 == 0
    if getattr(args, "fused_receiver", False):
        # One-launch ChainEngine behind the receiver surface: per block
        # only the decoded-frame table crosses to the host (the
        # per-stage stack fetches planes/candidates/payload rows).
        if C % 128:
            raise SystemExit("--receiver-fused needs channels % 128 == 0")
        from psk_soft_tpu.runtime.receiver import build_receiver as _br
        rx = _br(cfg, C, engine="chain", block_symbols=S, uw=fmt.uw,
                 frame_payload=fmt.payload, uw_threshold=0.7, fec=code,
                 fec_labeling="gray", crc=crc,
                 engine_kwargs={"pipeline_depth": 1})
        pre = np.ascontiguousarray(x_np.real.T)
        pim = np.ascontiguousarray(x_np.imag.T)

        def feed_fused():
            # Kernel-native plane ingest + depth-1 deferred commit: the
            # device step overlaps the next block's staging/upload.
            rx.engine.push_planes(pre, pim)
            got = rx.engine.step() or []
            rx.engine.pop_frames()
            return got

        def validate_fused(frames):
            for f in frames:
                j = by_off.get(f.start % S)
                assert j is not None, f"unplanted offset {f.start % S}"
                assert f.crc_ok
                assert np.array_equal(f.info_bits,
                                      infos[f.channel, j][:rx.engine.n_msg])

        warm_blocks = max(4, (cfg.num_avg + cfg.phase_avg) // S + 3)
        for _ in range(warm_blocks):
            validate_fused(feed_fused())
        nblocks = max(10, min(50, args.iters // 10))
        n_frames = 0
        t0 = time.perf_counter()
        for _ in range(nblocks):
            got = feed_fused()
            validate_fused(got)
            n_frames += len(got)
        dt = time.perf_counter() - t0
        assert n_frames >= (nblocks - 2) * k_frames * C, \
            f"fused receiver starved: {n_frames}"
        print(json.dumps({
            "metric": f"{C}-channel FUSED receiver throughput "
                      f"(ChainEngine: one-launch demod+sync+Viterbi+CRC, "
                      f"frame-table-only fetch, {k_frames} frames/block/"
                      f"ch, {jax.devices()[0].device_kind})",
            "value": n_frames * n_info / dt,
            "unit": "infobits/s",
            "vs_baseline": nblocks * C * need / dt / PER_CHIP_BASELINE,
        }))
        return 0
    ekw = {"pipeline_depth": max(0, args.engine_depth)}
    if use_full and getattr(args, "frames_only", False):
        # Frames-only consumer: soft/bits ports unconnected, so packet
        # assembly fetches no planes (the reference's connected-port
        # guard, cpp/psk_soft.cpp:605-615); frames flow via the device
        # tap.  Drops the ~6 MB/block output fetch.
        ekw["data_ports"] = False
    rx = build_receiver(cfg, C, engine="full" if use_full else "batch",
                        block_symbols=S, uw=fmt.uw,
                        frame_payload=fmt.payload, uw_threshold=0.7,
                        fec=code, fec_labeling="gray", crc=crc,
                        engine_kwargs=ekw)
    rx.engine.set_input_sri(SRI(stream_id="bench", xdelta=1e-6))
    if use_full:
        from psk_soft_tpu.runtime.native_bank import NativePlaneBank
        bank = NativePlaneBank(C, capacity_samples=4 * need)

        def feed_one():
            bank.push_interleaved(frames32)
            re, im, _ = bank.pop_planes(need, timeout=0)
            rx.engine.push_planes(re, im)
            rx.engine.step_packets()
            return rx.pop_frames()
    else:
        from psk_soft_tpu.runtime.native_bank import NativeChannelBank
        bank = NativeChannelBank(C, capacity_samples=4 * need)

        def feed_one():
            bank.push_interleaved(frames32)
            r = bank.pop_block(need, timeout=0)
            rx.engine.push_block(r[0])
            rx.engine.step_packets()
            return rx.pop_frames()

    def validate(frames):
        for f in frames:
            j = by_off.get(f.start % S)
            assert j is not None, f"frame at unplanted offset {f.start % S}"
            assert f.crc_ok, f"CRC failed at ch{f.channel} start {f.start}"
            assert np.array_equal(f.info_bits[:n_msg],
                                  infos[f.channel, j]), "info bits wrong"

    # Warm-up: compile, converge, and reach frame steady state.
    warm_blocks = max(4, (cfg.num_avg + cfg.phase_avg) // S + 3)
    for _ in range(warm_blocks):
        validate(feed_one())
    nblocks = max(10, min(50, args.iters // 10))
    n_frames = 0
    t0 = time.perf_counter()
    for _ in range(nblocks):
        got = feed_one()
        validate(got)
        n_frames += len(got)
    dt = time.perf_counter() - t0
    assert n_frames >= (nblocks - 2) * k_frames * C, \
        f"receiver starved: {n_frames} frames in {nblocks} blocks"
    info_rate = n_frames * n_info / dt
    sample_rate = nblocks * C * need / dt
    print(json.dumps({
        "metric": f"{C}-channel production streaming receiver throughput "
                  f"(deframe->engine->FrameSyncer->Viterbi->CRC->"
                  f"pop_frames{' frames-only' if getattr(args, 'frames_only', False) and use_full else ''}, "
                  f"{k_frames} frames/block/ch, depth="
                  f"{max(0, args.engine_depth)}, "
                  f"{jax.devices()[0].device_kind})",
        "value": info_rate,
        "unit": "infobits/s",
        "vs_baseline": sample_rate / PER_CHIP_BASELINE,
    }))
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=1024)
    ap.add_argument("--symbols", type=int, default=512, help="symbols per block")
    ap.add_argument("--sps", type=int, default=8)
    ap.add_argument("--payload", type=int, default=64,
                    help="chain profile: payload symbols per frame "
                         "(longer frames amortize the 32-symbol UW; the "
                         "default matches rounds <= 4 for comparability)")
    ap.add_argument("--uw-len", type=int, default=32,
                    help="chain profile: unique-word length in symbols")
    ap.add_argument("--iters", type=int, default=500,
                    help="block steps per timed dispatch; large enough to "
                         "amortize the ~tens-of-ms fixed dispatch cost of "
                         "the tunneled device")
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--reps", type=int, default=5,
                    help="timing repetitions; best rep is reported "
                         "(tunneled-device variance is large)")
    ap.add_argument("--pipeline",
                    choices=["auto", "ff", "exact", "fused", "full"],
                    default="auto",
                    help="auto = measure both the fused-kernel flagship and "
                         "the XLA feed-forward pipeline, report the faster "
                         "(the tunneled device's throughput varies widely "
                         "between windows and the two degrade differently)")
    ap.add_argument("--no-debug-ports", action="store_true",
                    help="compile the phase/sampleIndex output planes away "
                         "(unconnected-debug-port production profile); "
                         "fused-kernel pipelines only")
    ap.add_argument("--soft", choices=["f32", "i8"], default="f32",
                    help="i8 = int8-quantized soft-decision planes "
                         "(round(s*100), the SDR soft-bit wire format): the "
                         "dominant output plane at 2 instead of 8 bytes/"
                         "symbol/channel; applies to the fused-kernel "
                         "pipelines and --engine")
    ap.add_argument("--ingest", choices=["f32", "i16"], default="f32",
                    help="i16 = int16 I/Q wire-format planes dequantized in "
                         "VMEM (half the f32 HBM input read); applies to "
                         "the fused-kernel pipelines")
    ap.add_argument("--profile",
                    choices=["default", "config3", "mixed", "chain"],
                    default="default",
                    help="config3 = 8-PSK + RRC + fractional timing "
                         "(BASELINE config 3) on the fused kernel; mixed = "
                         "per-channel modes (BASELINE config 4); chain = "
                         "capture->demod->frame sync->Viterbi->CRC as one "
                         "device program, reported in info-bits/s")
    ap.add_argument("--engine", action="store_true",
                    help="end-to-end production-path bench (native deframe "
                         "-> engine step -> packet assembly), at "
                         "pipeline_depth 0 and --engine-depth")
    ap.add_argument("--engine-depth", type=int, default=1,
                    help="pipeline depth compared against 0 in --engine")
    ap.add_argument("--receiver-fused", dest="fused_receiver",
                    action="store_true",
                    help="--receiver through the one-launch ChainEngine "
                         "(runtime/chain_engine.py): only the decoded "
                         "frame table crosses to the host per block")
    ap.add_argument("--receiver-frames-only", dest="frames_only",
                    action="store_true",
                    help="--receiver with soft/bits ports unconnected "
                         "(frames-only consumer; no plane fetch per "
                         "block, the reference's connected-port guard)")
    ap.add_argument("--receiver", action="store_true",
                    help="production STREAMING receiver bench (native "
                         "deframe -> engine -> FrameSyncer -> Viterbi -> "
                         "CRC -> pop_frames), every frame validated, "
                         "reported in info-bits/s; at --engine-depth")
    ap.add_argument("--mesh", action="store_true",
                    help="scaling-efficiency report over the device mesh "
                         "(eval/scaling.py): one JSON line per report; on a "
                         "1-chip host this is a single point, on the "
                         "virtual CPU mesh (xla_force_host_platform_"
                         "device_count) the full curve")
    args = ap.parse_args()
    _await_backend()

    if args.receiver:
        return run_receiver(args)
    if args.engine:
        return run_engine(args)
    if args.mesh:
        return run_mesh(args)
    if args.profile == "chain":
        return run_chain(args)
    if args.profile != "default":
        return run_profile(args)

    import jax
    import jax.numpy as jnp
    from psk_soft_tpu import DemodConfig
    from psk_soft_tpu.models.blockpsk import demod_block_ff, ff_init
    from psk_soft_tpu.models.psk import demod_block, demod_init

    cfg = DemodConfig(sps=args.sps, num_avg=100, constellation_size=4,
                      phase_avg=50)
    C, T = args.channels, args.symbols * args.sps
    x_np = _qpsk_block(C, args.symbols, args.sps)

    if args.pipeline in ("full", "auto"):
        rate_full = None
        try:
            rate_full = run_full(args, cfg, C, T, x_np)
        except Exception as e:  # pragma: no cover - platform-specific
            print(f"full-kernel pipeline failed ({type(e).__name__}); "
                  f"falling back to ff", file=sys.stderr)
        label = ("full-kernel" if args.ingest == "f32"
                 else "full-kernel i16-ingest")
        if args.soft == "i8":
            label += " soft-i8"
        if args.no_debug_ports:
            label += " no-debug-ports"
        if (args.pipeline == "auto" and rate_full is not None
                and not args.no_debug_ports):
            # Production profile with the phase/sampleIndex debug ports
            # unconnected (the reference likewise skips output work for
            # unconnected ports): the planes compile away, cutting output
            # HBM writes.  Measured too, and the faster variant wins.
            args_ndp = copy.copy(args)
            args_ndp.no_debug_ports = True
            try:
                rate_ndp = run_full(args_ndp, cfg, C, T, x_np)
            except Exception as e:  # pragma: no cover - platform-specific
                print(f"no-debug-ports variant failed "
                      f"({type(e).__name__}); keeping default profile",
                      file=sys.stderr)
            else:
                if rate_ndp > rate_full:
                    rate_full = rate_ndp
                    label += " no-debug-ports"
        if rate_full is not None and rate_full < DEGRADED_RATE \
                and args.symbols < 4096:
            # Floor-dominated window: re-measure the winning profile at an
            # 8x bigger block so the per-step floor is split over 8x the
            # samples.  Pure win if the floor is per-step (the blocksize
            # sweep's hypothesis); harmless pick-best if it is not.
            big = copy.copy(args)
            big.symbols = min(4096, args.symbols * 8)
            big.iters = max(20, args.iters // 8)
            big.no_debug_ports = "no-debug-ports" in label
            x_big = _qpsk_block(C, big.symbols, args.sps)
            try:
                rate_big = run_full(big, cfg, C, big.symbols * args.sps,
                                    x_big)
            except Exception as e:  # pragma: no cover - platform-specific
                print(f"big-block variant failed ({type(e).__name__}); "
                      f"keeping {args.symbols}-symbol block",
                      file=sys.stderr)
            else:
                if rate_big > rate_full:
                    rate_full = rate_big
                    label += f" block={big.symbols}sym"
        if args.pipeline == "full" and rate_full is not None:
            return _chain_after_default(args, emit(C, label, rate_full))
        if args.pipeline == "auto":
            try:
                rate_ff = run_ff(args, cfg, C, T, x_np)
            except Exception as e:  # pragma: no cover - platform-specific
                if rate_full is not None:
                    return _chain_after_default(
                        args, emit(C, label, rate_full))
                # Every device pipeline failed (observed axon outages last
                # >1h: init raises/hangs for every program).  Emit a real
                # CPU measurement rather than NO data point -- the label
                # says exactly what happened.
                print(f"ff pipeline failed too ({type(e).__name__}); "
                      f"re-measuring on the CPU backend", file=sys.stderr)
                return _cpu_fallback(args)
            if rate_full is not None and rate_full >= rate_ff:
                return _chain_after_default(args, emit(C, label, rate_full))
            return _chain_after_default(args, emit(C, "ff", rate_ff))
        args.pipeline = "ff"

    if args.pipeline == "fused":
        from psk_soft_tpu.models.fused import demod_block_fused, fused_init
        state = fused_init(cfg, C)
        x_re = jnp.asarray(np.ascontiguousarray(x_np.real.T))
        x_im = jnp.asarray(np.ascontiguousarray(x_np.imag.T))

        @jax.jit
        def step_warm(state, x_re, x_im):
            return demod_block_fused(cfg, state, x_re, x_im)

        @jax.jit
        def step(state, x_re, x_im):
            # Converged fast path: no warm-up machinery in the program.
            return demod_block_fused(cfg, state, x_re, x_im,
                                     assume_steady=True)

        for _ in range(max(args.warmup, 1)):
            state, out = step_warm(state, x_re, x_im)
        state, out = step(state, x_re, x_im)  # compile steady
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, out = step(state, x_re, x_im)
            jax.block_until_ready(out)
            float(out.phase[0, 0])  # force true completion
            best = min(best, time.perf_counter() - t0)
        return emit(C, "fused", C * T * args.iters / best)

    from psk_soft_tpu.utils.transfer import to_device
    x = to_device(x_np)
    if args.pipeline == "ff":
        state = ff_init(cfg, (C,))
        block = demod_block_ff
    else:
        state = demod_init(cfg, C)
        block = demod_block

    @jax.jit
    def step(state, x):
        return jax.vmap(lambda s, b: block(cfg, s, b))(state, x)

    # Warm-up (compile included here, excluded from timing).
    for _ in range(max(args.warmup, 1)):
        state, out = step(state, x)
    jax.block_until_ready(out)

    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, out = step(state, x)
        jax.block_until_ready(out)
        float(out.phase[0, 0])  # force true completion
        best = min(best, time.perf_counter() - t0)

    return emit(C, args.pipeline, C * T * args.iters / best)


if __name__ == "__main__":
    sys.exit(main())
