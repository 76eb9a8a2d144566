"""Fully-fused steady-state demod kernel: the speed-of-light pipeline.

One Pallas kernel runs the ENTIRE demod -- energy windowing, timing argmax,
decision gather, M-th-power phase, trend-robust unwrap, FIR phase tracking,
derotation/differential decode, and bit slicing -- so the only HBM traffic is
one read of the sample stream and the symbol-rate outputs (~9 bytes/sample
total vs the multi-pass XLA pipelines' ~25+).  Measured motivation: on a
(1024ch, 512sym) block every *materialized* symbol-rate intermediate costs
~5-12us of HBM; the XLA backend spends ~58us there while all its math fits
in VMEM.

Sequential carries (trend window, unwrap offset, fit history, previous
decision sample) live in VMEM scratch persisted across the time-tile grid
axis (TPU Pallas grids execute sequentially, channel-group outer, time
inner); the carry is loaded from the state planes at the first tile and the
updated planes are written back every tile (last write wins).

Steady-state only: the warm-up path (stream head) runs in models/blockpsk;
engines switch to this kernel once converged (models/full.py).

Mosaic notes: no atan2 lowering -> octant-reduced polynomial (max err 2e-6
rad, far inside the 1e-3 demod tolerance); no cumsum -> log-step shift-adds;
complex math as explicit re/im planes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...ops.phase import UNWRAP_TREND_LEN

LANES = 128
TWO_PI = 6.2831853071795865


def state_rows(phase_avg: int, k: int = UNWRAP_TREND_LEN) -> int:
    """Rows of the carry plane: u_hist | c_re hist | c_im hist | misc(8),
    padded up to a multiple of 8 (float32 sublane tiling -- Mosaic requires
    aligned block shapes).  misc = [ang_prev, unwrap_acc, last_any_re,
    last_any_im, interp_prev_re, interp_prev_im, mixed_m, mixed_diff]:
    rows 4-5 are intra-call scratch for the fractional-timing path (the
    previous tile's final sample, never meaningful across calls); rows 6-7
    hold the per-channel constellation size and differential flag for
    mixed-mode banks (constant, carried through)."""
    raw = (phase_avg - 1) + 2 * (k - 1) + 8
    return -(-raw // 8) * 8


def atan2_poly(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Octant-reduced minimax atan2, ~2e-6 rad max error (Mosaic-safe)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mn = jnp.minimum(ax, ay)
    mx = jnp.maximum(ax, ay)
    r = mn / jnp.where(mx == 0, 1.0, mx)
    s = r * r
    p = r * (0.99997726 + s * (-0.33262347 + s * (0.19354346 + s * (
        -0.11643287 + s * (0.05265332 + s * -0.01172120)))))
    p = jnp.where(ay > ax, 1.5707963267948966 - p, p)
    p = jnp.where(x < 0, jnp.pi - p, p)
    return jnp.where(y < 0, -p, p)


def _cumsum0(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along axis 0 (log-step shift-add)."""
    n = x.shape[0]
    d = 1
    while d < n:
        pad = jnp.zeros((d,) + x.shape[1:], x.dtype)
        x = x + jnp.concatenate([pad, x[:-d]], axis=0)
        d *= 2
    return x


def _window_sums(re, im, s_tile: int, sps: int, num_avg: int):
    """Windowed per-bin energy sums W[o, j] on VMEM values."""
    e = re * re + im * im
    e3 = e.reshape(s_tile + num_avg - 1, sps, LANES)
    cs = _cumsum0(e3)
    upper = cs[num_avg - 1:]
    lower = jnp.concatenate(
        [jnp.zeros((1, sps, LANES), jnp.float32), cs[:s_tile - 1]], axis=0)
    return upper - lower


def _frontend(re, im, s_tile: int, sps: int, num_avg: int):
    """Energy window + argmax + gather on VMEM values (time-major planes)."""
    w = _window_sums(re, im, s_tile, sps, num_avg)
    b = jnp.argmax(w, axis=1).astype(jnp.int32)             # (s_tile, 128)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (s_tile, sps, LANES), 1)
              == b[:, None, :])
    x3r = re[: s_tile * sps].reshape(s_tile, sps, LANES)
    x3i = im[: s_tile * sps].reshape(s_tile, sps, LANES)
    sel_re = jnp.sum(jnp.where(onehot, x3r, 0.0), axis=1)
    sel_im = jnp.sum(jnp.where(onehot, x3i, 0.0), axis=1)
    return b, sel_re, sel_im


def _frontend_interp(re, im, s_tile: int, sps: int, num_avg: int,
                     prev_re, prev_im, first_tile):
    """Fractional-timing frontend: circular-centroid estimate over the bin
    energies, decision linearly interpolated between the two nearest samples
    in time (ops/timing.select_decision_samples_interp semantics, including
    the block-head fallback -- here applied only on the first tile, because
    interior tiles see their predecessor's final sample via the
    ``prev_re/prev_im`` carry).

    Returns (b, sel_re, sel_im, carry_re, carry_im) where carry_* is this
    tile's final decision-region sample for the next tile.
    """
    w = _window_sums(re, im, s_tile, sps, num_avg)
    jj = jax.lax.broadcasted_iota(jnp.int32, (s_tile, sps, LANES), 1)
    angj = jj.astype(jnp.float32) * (TWO_PI / sps)
    zr = jnp.sum(w * jnp.cos(angj), axis=1)                 # (s_tile, 128)
    zi = jnp.sum(w * jnp.sin(angj), axis=1)
    p = atan2_poly(zi, zr) * (sps / TWO_PI)
    p = jnp.where(p < -0.5, p + sps, p)                     # [-0.5, sps-0.5)
    p = jnp.where(p > sps - 0.5, p - sps, p)
    b = jnp.round(p).astype(jnp.int32) % sps
    i0f = jnp.floor(p)
    frac = p - i0f
    # Block-head fallback: row 0 of the whole call has no predecessor
    # sample; pin to the on-sample decision (frac=0, index 0) exactly like
    # the XLA path's raw_base<0 clamp.
    row0 = jax.lax.broadcasted_iota(jnp.int32, (s_tile, LANES), 0) == 0
    oob = (i0f < 0) & row0 & first_tile
    i0f = jnp.where(oob, 0.0, i0f)
    frac = jnp.where(oob, 0.0, frac)
    i0 = i0f.astype(jnp.int32)

    x3f_r = re[: (s_tile + 1) * sps].reshape(s_tile + 1, sps, LANES)
    x3f_i = im[: (s_tile + 1) * sps].reshape(s_tile + 1, sps, LANES)
    x3r, x3i = x3f_r[:s_tile], x3f_i[:s_tile]
    on0 = jj == i0[:, None, :]
    s0r_in = jnp.sum(jnp.where(on0, x3r, 0.0), axis=1)
    s0i_in = jnp.sum(jnp.where(on0, x3i, 0.0), axis=1)
    # Row o's own last sample; shifted down one symbol it is row o-1's.
    lastj = jj == sps - 1
    own_last_r = jnp.sum(jnp.where(lastj, x3r, 0.0), axis=1)
    own_last_i = jnp.sum(jnp.where(lastj, x3i, 0.0), axis=1)
    prev_last_r = jnp.concatenate([prev_re[None], own_last_r[:-1]], axis=0)
    prev_last_i = jnp.concatenate([prev_im[None], own_last_i[:-1]], axis=0)
    inb0 = i0 >= 0
    s0r = jnp.where(inb0, s0r_in, prev_last_r)
    s0i = jnp.where(inb0, s0i_in, prev_last_i)

    i1 = i0 + 1
    on1 = jj == i1[:, None, :]
    s1r_in = jnp.sum(jnp.where(on1, x3r, 0.0), axis=1)
    s1i_in = jnp.sum(jnp.where(on1, x3i, 0.0), axis=1)
    # Row o+1's first sample (row s_tile exists: num_avg >= 2).
    firstj = jj == 0
    next_first_r = jnp.sum(jnp.where(firstj, x3f_r[1:], 0.0), axis=1)
    next_first_i = jnp.sum(jnp.where(firstj, x3f_i[1:], 0.0), axis=1)
    inb1 = i1 <= sps - 1
    s1r = jnp.where(inb1, s1r_in, next_first_r)
    s1i = jnp.where(inb1, s1i_in, next_first_i)

    sel_re = s0r * (1.0 - frac) + s1r * frac
    sel_im = s0i * (1.0 - frac) + s1i * frac
    rowlast = (jax.lax.broadcasted_iota(jnp.int32, (s_tile, LANES), 0)
               == s_tile - 1)
    carry_re = jnp.sum(jnp.where(rowlast, own_last_r, 0.0), axis=0)
    carry_im = jnp.sum(jnp.where(rowlast, own_last_i, 0.0), axis=0)
    return b, sel_re, sel_im, carry_re, carry_im


def _band_ones(rows: int, cols: int, width: int) -> jnp.ndarray:
    """Banded ones matrix B with B[r, c] = 1 iff 0 <= c - r < width; a
    matmul with it is a sliding-window sum -- MXU-aligned, replacing
    misaligned sublane shift-adds (which Mosaic lowers as expensive
    relayouts)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    d = c - r
    return ((d >= 0) & (d < width)).astype(jnp.float32)


def _lower_tri(rows: int) -> jnp.ndarray:
    """Inclusive-prefix-sum matrix (lower triangular ones)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    return (c <= r).astype(jnp.float32)


def _kernel(s_tile: int, sps: int, num_avg: int, n: int, m: int, diff: bool,
            k: int, n_time_tiles: int, split_dma: bool, tile_pad: int,
            double_buffer: bool, mf_extra: int, mf_chunk: int,
            timing_interp: bool, mixed: bool, grain: int, in_scale, pack_out,
            soft_scale, win_offset,
            win_re_hbm, win_im_hbm, re_hbm, im_hbm, state_in, fir_mat,
            band_mat,
            soft_re, soft_im, phase_out, bits_out, idx_out, state_out,
            sre, sim, st, sem):
    ci = pl.program_id(0)
    si = pl.program_id(1)
    n1 = n - 1
    k1 = k - 1
    misc = n1 + 2 * k1
    tile_len = (s_tile + num_avg - 1) * sps
    dma_len = tile_len + tile_pad  # 8-row-aligned DMA/scratch length
    wlen = (num_avg - 1) * sps

    def tile_copies(tile, slot):
        """Input DMA descriptors for time tile `tile` into scratch slot
        `slot` (slot is a static 0/1; tile may be a traced index >= 1).
        Re-creating the same descriptor later is the Pallas pattern for
        waiting on a copy issued in an earlier (sequential) grid step."""
        if split_dma:
            # (tile*s_tile*sps - wlen) is grain-aligned here: the caller
            # only selects split_dma when wlen % grain == 0 (and
            # s_tile % grain == 0), but Mosaic's prover can't see through
            # the subtraction.  grain is 8 rows for f32 (8, 128) tiling,
            # 16 for the int16 ingest path's (16, 128) tiling.
            start = pl.multiple_of(tile * s_tile * sps - wlen, grain)
        else:
            start = pl.multiple_of(tile * s_tile * sps, grain)
        off = slot * dma_len
        c_re = pltpu.make_async_copy(
            re_hbm.at[pl.ds(start, dma_len), pl.ds(ci * LANES, LANES)],
            sre.at[pl.ds(off, dma_len)], sem.at[5 if slot else 0])
        c_im = pltpu.make_async_copy(
            im_hbm.at[pl.ds(start, dma_len), pl.ds(ci * LANES, LANES)],
            sim.at[pl.ds(off, dma_len)], sem.at[6 if slot else 1])
        return c_re, c_im

    # --- load carries at the first time tile of this channel group ---
    @pl.when(si == 0)
    def _():
        cp = pltpu.make_async_copy(
            state_in.at[:, pl.ds(ci * LANES, LANES)], st, sem.at[2])
        cp.start()
        if split_dma:
            # Window and block DMA'd separately (no host-side concat).
            # Only valid when wlen is 8-row aligned (sublane tiling).
            cw_re = pltpu.make_async_copy(
                win_re_hbm.at[pl.ds(win_offset, wlen),
                              pl.ds(ci * LANES, LANES)],
                sre.at[pl.ds(0, wlen)], sem.at[0])
            cw_im = pltpu.make_async_copy(
                win_im_hbm.at[pl.ds(win_offset, wlen),
                              pl.ds(ci * LANES, LANES)],
                sim.at[pl.ds(0, wlen)], sem.at[1])
            cx_re = pltpu.make_async_copy(
                re_hbm.at[pl.ds(0, tile_len - wlen),
                          pl.ds(ci * LANES, LANES)],
                sre.at[pl.ds(wlen, tile_len - wlen)], sem.at[3])
            cx_im = pltpu.make_async_copy(
                im_hbm.at[pl.ds(0, tile_len - wlen),
                          pl.ds(ci * LANES, LANES)],
                sim.at[pl.ds(wlen, tile_len - wlen)], sem.at[4])
            cw_re.start()
            cw_im.start()
            cx_re.start()
            cx_im.start()
            if double_buffer and n_time_tiles > 1:
                p_re, p_im = tile_copies(1, 1)  # prefetch tile 1 -> slot 1
                p_re.start()
                p_im.start()
            cw_re.wait()
            cw_im.wait()
            cx_re.wait()
            cx_im.wait()
        else:
            # re_hbm/im_hbm hold the concatenated [window | block] planes
            # (padded by the caller so dma_len rows always exist).
            c0_re = pltpu.make_async_copy(
                re_hbm.at[pl.ds(0, dma_len), pl.ds(ci * LANES, LANES)],
                sre.at[pl.ds(0, dma_len)], sem.at[0])
            c0_im = pltpu.make_async_copy(
                im_hbm.at[pl.ds(0, dma_len), pl.ds(ci * LANES, LANES)],
                sim.at[pl.ds(0, dma_len)], sem.at[1])
            c0_re.start()
            c0_im.start()
            if double_buffer and n_time_tiles > 1:
                p_re, p_im = tile_copies(1, 1)  # prefetch tile 1 -> slot 1
                p_re.start()
                p_im.start()
            c0_re.wait()
            c0_im.wait()
        cp.wait()

    if n_time_tiles > 1:  # single-tile blocks never take this branch
        @pl.when(si != 0)
        def _():
            if double_buffer:
                # Prefetch tile si+1 into the opposite slot (owned by tile
                # si-1, whose compute finished last grid step), then wait the
                # copy issued for THIS tile one step ago.  Slot parity ==
                # tile parity, kept static via two pl.when branches.
                nxt = si + 1
                @pl.when((nxt < n_time_tiles) & (nxt % 2 == 0))
                def _():
                    a, b_ = tile_copies(nxt, 0)
                    a.start()
                    b_.start()
                @pl.when((nxt < n_time_tiles) & (nxt % 2 == 1))
                def _():
                    a, b_ = tile_copies(nxt, 1)
                    a.start()
                    b_.start()
                @pl.when(si % 2 == 0)
                def _():
                    a, b_ = tile_copies(si, 0)
                    a.wait()
                    b_.wait()
                @pl.when(si % 2 == 1)
                def _():
                    a, b_ = tile_copies(si, 1)
                    a.wait()
                    b_.wait()
            else:
                cp_re, cp_im = tile_copies(si, 0)
                cp_re.start()
                cp_im.start()
                cp_re.wait()
                cp_im.wait()

    # --- slot select (raw rows incl. the matched-filter halo, if any) ---
    sel_len = tile_len if not mf_extra else dma_len
    if double_buffer:
        # Select this tile's slot with static slices + an elementwise pick
        # (dynamic-start sublane reads can lower as relayouts; reading both
        # slots from VMEM is cheap).
        even = (si % 2 == 0)
        re_t = jnp.where(even, sre[0:sel_len], sre[dma_len:dma_len + sel_len])
        im_t = jnp.where(even, sim[0:sel_len], sim[dma_len:dma_len + sel_len])
    else:
        re_t = sre[0:sel_len]
        im_t = sim[0:sel_len]
    if in_scale is not None:
        # int16 ingest: samples travelled HBM->VMEM at 2 bytes (half the
        # critical-path bandwidth of f32 planes); dequantize once in VMEM.
        re_t = re_t.astype(jnp.float32) * in_scale
        im_t = im_t.astype(jnp.float32) * in_scale

    # --- matched filter: chunked banded matmuls on the MXU ---
    # f[r] = sum_j taps[j] * raw[r + j]; the band matrix B[r, r+j] = taps[j]
    # turns the FIR into (chunk x chunk+L-1) @ (chunk+L-1 x 128) products --
    # the same trick as the FIR phase tracker (sublane shift-adds would
    # lower as relayout copies).  Chunking keeps the zero fraction of the
    # band small (L / (chunk + L - 1)).
    if mf_extra:
        flen = -(-tile_len // mf_chunk) * mf_chunk
        fr, fi = [], []
        for c0 in range(0, flen, mf_chunk):
            seg_r = re_t[c0:c0 + mf_chunk + mf_extra]
            seg_i = im_t[c0:c0 + mf_chunk + mf_extra]
            fr.append(jnp.dot(band_mat[:], seg_r,
                              preferred_element_type=jnp.float32))
            fi.append(jnp.dot(band_mat[:], seg_i,
                              preferred_element_type=jnp.float32))
        re_t = jnp.concatenate(fr, axis=0)[:tile_len]
        im_t = jnp.concatenate(fi, axis=0)[:tile_len]

    # --- C2: timing frontend ---
    if timing_interp:
        b, sel_re_v, sel_im_v, car_r, car_i = _frontend_interp(
            re_t, im_t, s_tile, sps, num_avg,
            st[misc + 4], st[misc + 5], si == 0)
    else:
        b, sel_re_v, sel_im_v = _frontend(re_t, im_t, s_tile, sps, num_avg)

    # --- C3: M-th power phase (plane squarings) + poly atan2 ---
    if mixed:
        # Per-lane constellation: compute all three powers (two extra
        # squarings on VMEM values) and select branch-free (the same
        # recipe as models/mixed.py, at kernel speed).
        mvec = st[misc + 6]                                  # (128,) float
        dvec = st[misc + 7]                                  # (128,) 0/1
        is2 = (mvec == 2.0)[None]
        is4 = (mvec == 4.0)[None]
        is8 = (mvec == 8.0)[None]
        is16 = (mvec == 16.0)[None]
        z2r = sel_re_v * sel_re_v - sel_im_v * sel_im_v
        z2i = 2.0 * sel_re_v * sel_im_v
        z4r, z4i = z2r * z2r - z2i * z2i, 2.0 * z2r * z2i
        z8r, z8i = z4r * z4r - z4i * z4i, 2.0 * z4r * z4i
        z16r, z16i = z8r * z8r - z8i * z8i, 2.0 * z8r * z8i
        z32r, z32i = z16r * z16r - z16i * z16i, 2.0 * z16r * z16i
        zr = jnp.where(is2, z2r, jnp.where(is4, z4r, jnp.where(
            is8, z8r, jnp.where(is16, z16r, z32r))))
        zi = jnp.where(is2, z2i, jnp.where(is4, z4i, jnp.where(
            is8, z8i, jnp.where(is16, z16i, z32i))))
    else:
        zr, zi = sel_re_v, sel_im_v
        for _ in range(m.bit_length() - 1):                  # log2(m) squarings
            zr, zi = zr * zr - zi * zi, 2.0 * zr * zi
    raw = atan2_poly(zi, zr)                                 # (s_tile, 128)

    # --- trend MA over the last k raw phases (carry: c hists) ---
    # Sliding sums as banded-matrix matmuls on the MXU: Mosaic lowers
    # misaligned sublane shifts as relayout copies (measured ~40x slowdown
    # with shifted-add loops here).
    c_re = jnp.cos(raw)
    c_im = jnp.sin(raw)
    ext_cre = jnp.concatenate([st[n1:n1 + k1], c_re], axis=0)
    ext_cim = jnp.concatenate([st[n1 + k1:n1 + 2 * k1], c_im], axis=0)
    tband = _band_ones(s_tile, s_tile + k1, k)
    t_re = jnp.dot(tband, ext_cre, preferred_element_type=jnp.float32)
    t_im = jnp.dot(tband, ext_cim, preferred_element_type=jnp.float32)
    ang_t = atan2_poly(t_im, t_re)

    # --- prefix unwrap of the trend + residual re-attachment ---
    ang_prev = st[misc]                                      # (128,)
    acc = st[misc + 1]
    ang_shift = jnp.concatenate([ang_prev[None], ang_t[:-1]], axis=0)
    d = ang_t - ang_shift
    cum = jnp.dot(_lower_tri(s_tile), jnp.round(d / TWO_PI),
                  preferred_element_type=jnp.float32)
    t_unw = ang_t + acc[None] - TWO_PI * cum
    resid = raw - ang_t
    u = t_unw + (resid - TWO_PI * jnp.round(resid / TWO_PI))

    # --- C1: endpoint-FIR linear-fit tracker (carry: u history) ---
    ext_u = jnp.concatenate([st[:n1], u], axis=0)            # (n1+s_tile, 128)
    est = jnp.dot(fir_mat[:], ext_u, preferred_element_type=jnp.float32)

    # --- C5: correction / differential decode ---
    if mixed or diff:
        pr = jnp.concatenate([st[misc + 2][None], sel_re_v[:-1]], axis=0)
        pi_ = jnp.concatenate([st[misc + 3][None], sel_im_v[:-1]], axis=0)
        pp = pr * pr + pi_ * pi_
        inv = 1.0 / jnp.where(pp == 0, 1.0, pp)
        base_r_d = (sel_re_v * pr + sel_im_v * pi_) * inv
        base_i_d = (sel_im_v * pr - sel_re_v * pi_) * inv
    if mixed:
        dsel = (dvec > 0.5)[None]
        base_r = jnp.where(dsel, base_r_d, sel_re_v)
        base_i = jnp.where(dsel, base_i_d, sel_im_v)
        corr = jnp.where(dsel, 0.0, -est / mvec[None])
        corr = corr + jnp.where(is4, 0.7853981633974483, 0.0)
    else:
        if diff:
            base_r, base_i = base_r_d, base_i_d
            corr = jnp.zeros_like(est)
        else:
            base_r, base_i = sel_re_v, sel_im_v
            corr = -est / float(m)
        if m == 4:
            corr = corr + 0.7853981633974483                 # +pi/4
    cph_r = jnp.cos(corr)
    cph_i = jnp.sin(corr)
    s_r = base_r * cph_r - base_i * cph_i
    s_i = base_r * cph_i + base_i * cph_r

    # --- C6: slicing (documented mapping), packed LSB-first ---
    if mixed:
        bits2 = (s_r < 0).astype(jnp.int32)
        sgn_r = (s_r < 0).astype(jnp.int32)
        sgn_i = (s_i < 0).astype(jnp.int32)
        bits4 = (sgn_r ^ sgn_i) + 2 * sgn_i
        # Generalized m >= 8 code with the per-lane m: theta*m/(2pi), wrap
        # below -0.5 up by +m, round, alias m -> 0 (cpp/psk_soft.cpp:528-564
        # with 8 replaced by m; 16/32-PSK are an extension).
        th = atan2_poly(s_i, s_r)
        ss = th * (mvec[None] * (0.5 / jnp.pi))
        ss = jnp.where(ss < -0.5, ss + mvec[None], ss)
        bitsm = jnp.floor(ss + 0.5).astype(jnp.int32)
        mi = mvec[None].astype(jnp.int32)
        bitsm = jnp.where(bitsm >= mi, bitsm - mi, bitsm)
        bits = jnp.where(is2, bits2, jnp.where(is4, bits4, bitsm))
    elif m == 2:
        bits = (s_r < 0).astype(jnp.int32)
    elif m == 4:
        sgn_r = (s_r < 0).astype(jnp.int32)
        sgn_i = (s_i < 0).astype(jnp.int32)
        bits = (sgn_r ^ sgn_i) + 2 * sgn_i
    else:
        th = atan2_poly(s_i, s_r)
        ss = th * (m / (2.0 * jnp.pi))
        ss = jnp.where(ss < -0.5, ss + float(m), ss)
        bits = jnp.floor(ss + 0.5).astype(jnp.int32) & (m - 1)

    if soft_scale is not None:
        # int8 soft decisions (the SDR soft-bit wire format, e.g. 8-bit
        # LLR-style symbols for a downstream FEC): round(s * scale) clipped
        # to the int8 range.  The dominant output plane drops from 8 to 2
        # bytes/symbol/channel on both the HBM write here and the
        # device->host fetch; bits/phase are computed from the full-precision
        # values above and are unchanged.
        soft_re[:] = jnp.clip(jnp.round(s_r * soft_scale),
                              -127.0, 127.0).astype(jnp.int8)
        soft_im[:] = jnp.clip(jnp.round(s_i * soft_scale),
                              -127.0, 127.0).astype(jnp.int8)
    else:
        soft_re[:] = s_r
        soft_im[:] = s_i
    phase_out[:] = est          # no-op _NullRef when debug ports are off
    if pack_out:
        # int8 symbol-rate planes: bits are 0..7, sample indices 0..sps-1,
        # so 1 byte each cuts 6 of the 20 output bytes/symbol/channel off
        # the HBM write path (i8 tiles as (32, 128); the caller gates on
        # s_tile % 32 == 0).
        bits_out[:] = bits.astype(jnp.int8)
        idx_out[:] = b.astype(jnp.int8)
    else:
        bits_out[:] = bits
        idx_out[:] = b

    # --- carry updates (+ end-of-tile M*2pi re-wrap, cpp/psk_soft.cpp:592) ---
    wrapv = TWO_PI * mvec if mixed else TWO_PI * m           # per-lane / scalar
    u_last = u[s_tile - 1]
    wraps = jnp.round(u_last / wrapv)
    off = jnp.where(jnp.abs(u_last) > wrapv, wraps * wrapv, 0.0)  # (128,)
    st[:n1] = ext_u[s_tile:] - off[None]
    st[n1:n1 + k1] = ext_cre[s_tile:]
    st[n1 + k1:n1 + 2 * k1] = ext_cim[s_tile:]
    st[misc] = ang_t[s_tile - 1]
    st[misc + 1] = acc - TWO_PI * cum[s_tile - 1] - off
    st[misc + 2] = sel_re_v[s_tile - 1]
    st[misc + 3] = sel_im_v[s_tile - 1]
    if timing_interp:
        st[misc + 4] = car_r
        st[misc + 5] = car_i
    state_out[:] = st[:]


MF_CHUNK = 128  # FIR band-matmul chunk rows (multiple of 8)


class _NullRef:
    """Write sink for disabled output planes (debug_ports=False): the
    phase/sampleIndex stores vanish from the compiled kernel, so those
    symbol-rate planes never cross HBM -- the TPU analogue of the
    reference only pushing to CONNECTED ports (bulkio skips the push when
    a port has no consumers)."""

    def __setitem__(self, idx, val):
        pass


@functools.partial(jax.jit, static_argnames=("sps", "num_avg", "phase_avg",
                                             "m", "diff", "s_tile",
                                             "double_buffer", "mf_taps",
                                             "timing_interp", "mixed",
                                             "in_scale", "pack_out",
                                             "soft_i8_scale",
                                             "win_offset", "debug_ports",
                                             "interpret"))
def demod_full_tm(win_re, win_im, x_re, x_im, state_planes, *, sps: int,
                  num_avg: int, phase_avg: int, m: int, diff: bool,
                  s_tile: int = 256, double_buffer: bool | None = None,
                  mf_taps: tuple | None = None, timing_interp: bool = False,
                  mixed: bool = False, in_scale: float = 1.0,
                  pack_out: bool | None = None,
                  soft_i8_scale: float | None = None, win_offset: int = 0,
                  debug_ports: bool = True,
                  interpret: bool = False):
    """Run the fully-fused kernel over time-major planes.

    Args:
      win_re/win_im: ((num_avg-1)*sps + mf_ntaps-1, C) float32 carry window
        planes -- RAW samples when ``mf_taps`` is set (the kernel filters
        them itself), filtered/plain samples otherwise.
      x_re/x_im: (S*sps, C) float32 block planes (always raw input).
      state_planes: (state_rows(phase_avg), C) float32 carry.
      mf_taps: matched-filter taps as a static tuple (None = no filter);
        the FIR runs inside the kernel as chunked banded matmuls.
      timing_interp: fractional (circular-centroid) timing refinement.
      mixed: per-channel (M, differential) bank -- modes are read from
        state rows misc+6/7 (see state_rows) and the static m/diff are
        ignored; all mode-dependent stages become branch-free selects.
      in_scale: dequantization step for int16 ingest.  When win/x planes are
        int16 (the SDR wire format, REDHAWK dataShort), samples cross HBM at
        2 bytes and become ``i16 * in_scale`` float32 in VMEM -- half the
        f32 path's critical HBM read.  Ignored for float32 planes.
      pack_out: emit bits/sampleIndex as int8 planes (values are 0..7 and
        0..sps-1), cutting 6 of the 20 output bytes/symbol/channel.  None
        (default) packs automatically when the picked s_tile is 32-row
        aligned (int8 VMEM tiling); True raises if it is not.
      soft_i8_scale: emit the soft-decision planes as int8,
        ``clip(round(s * scale), -127, 127)`` -- the SDR soft-bit wire
        format for downstream FEC.  The dominant output plane drops 8 -> 2
        bytes/symbol/channel on the HBM write and the host fetch;
        quantization error is <= 0.5/scale per component (outside the
        golden 1e-3 tolerance at the default scale 100, hence explicit
        opt-in, like int16 ingest).  Requires a 32-row-aligned s_tile.
        bits/phase are computed pre-quantization and unchanged.
      debug_ports: False drops the phase and sampleIndex output planes
        entirely (returned as None) -- their stores vanish from the
        compiled kernel, like the reference not pushing to unconnected
        ports.
    Returns:
      (soft_re, soft_im, phase, bits_packed, sample_index, new_state_planes)
      -- symbol-rate planes are (S, C); bits/sample_index are int8 when
      packed (see pack_out), int32 otherwise; phase/sample_index are None
      when debug_ports=False.
    """
    import numpy as np
    from ...ops.linear_fit import endpoint_fir_weights

    extra = (len(mf_taps) - 1) if mf_taps else 0
    T, C = x_re.shape
    if C % LANES:
        raise ValueError(f"channels ({C}) must be a multiple of {LANES}")
    wrows = (num_avg - 1) * sps + extra
    if win_offset:
        # Rolling-window mode: win planes are the PREVIOUS block's full
        # input planes and the window is their last wrows rows, read in
        # place by the window DMA -- no separate window-carry buffer is
        # ever written or re-read (saves 2*wrows*C*4 bytes of HBM traffic
        # per block).  Only valid on the split-DMA path (the concat path
        # stages [window | block] through a host-side concatenation).
        if win_re.shape != (win_offset + wrows, C):
            raise ValueError(
                f"rolling win planes must be {(win_offset + wrows, C)} "
                f"(win_offset + window rows), got {win_re.shape}")
    elif win_re.shape != (wrows, C):
        raise ValueError(f"win planes must be {(wrows, C)}")
    # int16 ingest (the SDR wire format): samples cross HBM at 2 bytes and
    # dequantize in VMEM as i16 * in_scale -- half the f32 path's critical
    # HBM traffic.  i16 tiles as (16, 128), so every DMA row start/length
    # constraint doubles from 8 to 16.
    in_i16 = x_re.dtype == jnp.int16
    grain = 16 if in_i16 else 8
    if in_i16 and win_re.dtype != jnp.int16:
        raise ValueError("int16 ingest needs int16 window carry planes "
                         "(quantize with models.full.quantize_full_state)")
    k = UNWRAP_TREND_LEN
    if phase_avg < k + 1:
        raise ValueError(f"full kernel requires phase_avg >= {k + 1}")
    if num_avg < 2:
        raise ValueError("full kernel requires num_avg >= 2")
    s_out = T // sps
    # VMEM budget: the tile buffers plus the frontend intermediates all
    # scale with tile_len = (s_tile + num_avg - 1) * sps; empirically the
    # compiler's scoped stack fits ~2900 rows at 128 lanes f32 inside the
    # 16 MB VMEM (single-buffered); the matched filter adds a raw + filtered
    # copy, so its caps are lower.  Pick the largest divisor of S that fits.
    # Tile floor: s_tile >= num_avg-1 keeps the split-DMA tile start
    # (si*s_tile*sps - wlen) non-negative.  When wlen is not 8-row aligned
    # the kernel always takes the concat path, whose tile start is
    # si*s_tile*sps -- any s_tile with (s_tile*sps) % 8 == 0 is valid, so
    # the floor drops (this is what lets the sps=10 default config
    # double-buffer).
    wlen_aligned = ((num_avg - 1) * sps) % grain == 0 and not extra
    def pick_tile(max_rows):
        cap = max((max_rows - extra) // sps - (num_avg - 1), num_avg - 1)
        want = min(s_tile, s_out, cap)
        lo = num_avg - 2 if wlen_aligned else 0
        for cand in range(want, lo, -1):
            if s_out % cand == 0 and (wlen_aligned
                                      or (cand * sps) % grain == 0):
                return cand
        return None

    cap_single, cap_db = (2100, 1500) if extra else (2900, 2100)
    pick = pick_tile(cap_single)
    if pick is None:
        raise ValueError(
            f"no viable s_tile for S={s_out}, sps={sps}, num_avg={num_avg} "
            f"(need a divisor of S)")
    auto = double_buffer is None
    if auto:
        double_buffer = s_out // pick > 1
    if double_buffer:
        # Two input slots double the scratch; shrink the tile so the total
        # stays inside VMEM.  Prefetching tile si+1 while computing tile si
        # overlaps the input DMA with compute (the output side is already
        # pipelined by the BlockSpec machinery).
        pick_db = pick_tile(cap_db)
        if pick_db is not None and s_out // pick_db > 1 and not (
                auto and pick_db < min(96, pick)):
            # Auto mode declines tiles under 96 symbols: per-grid-step
            # overheads (carry load/store, FIR matmul ramp) then outweigh
            # the DMA overlap (measured: sps=10 tile 64 was ~17% slower
            # than single-buffered tile 128; sps=8 tile 128 ~16% faster
            # than single-buffered tile 256).
            pick = pick_db
        else:
            double_buffer = False
    s_tile = pick
    # int8 bits/sampleIndex planes (pack_out): i8 tiles as (32, 128), so
    # the symbol-tile height must be 32-row aligned, and sample indices
    # (0..sps-1) must fit int8 -- sps > 128 would wrap silently.
    if pack_out is None:
        pack_out = s_tile % 32 == 0 and sps <= 128
    elif pack_out and (s_tile % 32 or sps > 128):
        raise ValueError(f"pack_out requires s_tile % 32 == 0 (i8 tiling) "
                         f"and sps <= 128 (int8 index range); picked "
                         f"s_tile={s_tile}, sps={sps}")
    odt = jnp.int8 if pack_out else jnp.int32
    if soft_i8_scale is not None and s_tile % 32:
        raise ValueError(f"soft_i8_scale requires s_tile % 32 == 0 (i8 "
                         f"tiling); picked s_tile={s_tile}")
    sdt = jnp.float32 if soft_i8_scale is None else jnp.int8
    rs = state_rows(phase_avg, k)
    if state_planes.shape != (rs, C):
        raise ValueError(f"state_planes must be {(rs, C)}, got "
                         f"{state_planes.shape}")
    tile_len = (s_tile + num_avg - 1) * sps
    wlen = (num_avg - 1) * sps
    # Split window/block DMA (saves a concat pass through HBM) requires
    # 8-row-aligned slice starts AND lengths; otherwise fall back to
    # concatenating on the host side, with the input padded so every tile's
    # 8-aligned DMA length stays in bounds (e.g. the default sps=10,
    # num_avg=100 has wlen=990, tile_len 2270 -- neither 8-aligned; an
    # unaligned DMA faults the TPU worker).  The matched filter always takes
    # the concat path (its halo changes every tile's span).
    split_dma = (not extra and wlen % grain == 0 and s_tile % grain == 0
                 and tile_len % grain == 0)
    if win_offset and not (split_dma and win_offset % grain == 0):
        raise ValueError(
            f"rolling-window mode (win_offset={win_offset}) requires the "
            f"split-DMA path with a {grain}-row-aligned offset: need "
            f"win_offset % {grain} == 0, (num_avg-1)*sps % {grain} == 0, "
            f"no matched filter, and an aligned tile "
            f"(got wlen={wlen}, s_tile={s_tile}, mf_extra={extra})")
    if extra:
        # Raw rows a tile needs: ceil(tile_len/chunk) whole FIR chunks plus
        # the L-1 halo, rounded up to the DMA row granule.
        flen = -(-tile_len // MF_CHUNK) * MF_CHUNK
        dma_len = -(-(flen + extra) // grain) * grain
        tile_pad = dma_len - tile_len
    else:
        tile_pad = 0 if split_dma else (-tile_len) % grain
        dma_len = tile_len + tile_pad
    in_dtype = jnp.int16 if in_i16 else jnp.float32
    if not split_dma:
        if (s_tile * sps) % grain:
            raise ValueError(f"s_tile*sps ({s_tile * sps}) must be a "
                             f"multiple of {grain}")
        # Host-side pad so the last tile's [start, start+dma_len) DMA span
        # stays in bounds of the concatenated [window | block] planes.
        n_tiles = s_out // s_tile
        pad_rows = max(0, (n_tiles - 1) * s_tile * sps + dma_len
                       - (wrows + T))
        parts_re = [win_re, x_re]
        parts_im = [win_im, x_im]
        if pad_rows:
            zpad = jnp.zeros((pad_rows, C), in_dtype)
            parts_re.append(zpad)
            parts_im.append(zpad)
        x_re = jnp.concatenate(parts_re, axis=0)
        x_im = jnp.concatenate(parts_im, axis=0)
        win_re = jnp.zeros((grain, C), in_dtype)  # unused dummy
        win_im = win_re
    # FIR as a banded matrix (est = F @ ext_u on the MXU): F[o, o+i] = w[i].
    w = endpoint_fir_weights(phase_avg, dtype=np.float64)
    n1 = phase_avg - 1
    fir_np = np.zeros((s_tile, s_tile + n1), np.float32)
    for o in range(s_tile):
        fir_np[o, o:o + phase_avg] = w
    fir_mat = jnp.asarray(fir_np)
    # Matched-filter band: B[r, r+j] = taps[j] (dummy when disabled).
    if extra:
        band_np = np.zeros((MF_CHUNK, MF_CHUNK + extra), np.float32)
        taps_np = np.asarray(mf_taps, np.float32)
        for r in range(MF_CHUNK):
            band_np[r, r:r + extra + 1] = taps_np
        band_shape = band_np.shape
    else:
        band_np = np.zeros((8, 8), np.float32)
        band_shape = (8, 8)
    band_mat = jnp.asarray(band_np)

    kernel = functools.partial(_kernel, s_tile, sps, num_avg, phase_avg, m,
                               diff, k, s_out // s_tile, split_dma, tile_pad,
                               double_buffer, extra, MF_CHUNK, timing_interp,
                               mixed, grain,
                               float(in_scale) if in_i16 else None, pack_out,
                               (None if soft_i8_scale is None
                                else float(soft_i8_scale)),
                               win_offset)
    grid = (C // LANES, s_out // s_tile)

    def sym_spec(dtype):
        return pl.BlockSpec((s_tile, LANES), lambda ci, si: (si, ci),
                            memory_space=pltpu.VMEM)

    state_spec = pl.BlockSpec((rs, LANES), lambda ci, si: (0, ci),
                              memory_space=pltpu.VMEM)
    if debug_ports:
        out_shape = [
            jax.ShapeDtypeStruct((s_out, C), sdt),
            jax.ShapeDtypeStruct((s_out, C), sdt),
            jax.ShapeDtypeStruct((s_out, C), jnp.float32),
            jax.ShapeDtypeStruct((s_out, C), odt),
            jax.ShapeDtypeStruct((s_out, C), odt),
            jax.ShapeDtypeStruct((rs, C), jnp.float32),
        ]
        out_specs = [sym_spec(sdt), sym_spec(sdt), sym_spec(jnp.float32),
                     sym_spec(odt), sym_spec(odt), state_spec]
    else:
        # Debug ports off: no phase/sampleIndex planes exist at all --
        # their stores go to _NullRef sinks and those symbol-rate bytes
        # never cross HBM (reference analogue: bulkio only pushes to
        # connected ports).
        out_shape = [
            jax.ShapeDtypeStruct((s_out, C), sdt),
            jax.ShapeDtypeStruct((s_out, C), sdt),
            jax.ShapeDtypeStruct((s_out, C), odt),
            jax.ShapeDtypeStruct((rs, C), jnp.float32),
        ]
        out_specs = [sym_spec(sdt), sym_spec(sdt),
                     sym_spec(odt), state_spec]
        inner = kernel

        def kernel(win_re_hbm, win_im_hbm, re_hbm, im_hbm, state_in,
                   fir_mat_r, band_mat_r, o_sre, o_sim, o_bits, o_state,
                   sre, sim, st, sem):
            inner(win_re_hbm, win_im_hbm, re_hbm, im_hbm, state_in,
                  fir_mat_r, band_mat_r, o_sre, o_sim, _NullRef(), o_bits,
                  _NullRef(), o_state, sre, sim, st, sem)

    res = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5 + [
            pl.BlockSpec((s_tile, s_tile + n1), lambda ci, si: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(band_shape, lambda ci, si: (0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM(((2 if double_buffer else 1) * dma_len,
                        LANES), in_dtype),
            pltpu.VMEM(((2 if double_buffer else 1) * dma_len,
                        LANES), in_dtype),
            pltpu.VMEM((rs, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((7,)),
        ],
        interpret=interpret,
    )(win_re, win_im, x_re, x_im, state_planes, fir_mat, band_mat)
    if debug_ports:
        return tuple(res)
    s_r, s_i, bits, planes = res
    return (s_r, s_i, None, bits, None, planes)
