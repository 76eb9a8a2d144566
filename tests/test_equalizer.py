"""Blind CMA equalizer (ops/equalizer.py, runtime/equalizer.py).

Gates: identity init is an exact passthrough, frozen-weight streaming over
any block split equals one-shot filtering (the history carry), block CMA
inverts a multipath channel (symbols recovered modulo the CMA phase
ambiguity; unequalized fails), power normalization makes mu transfer across
input scales, and the EqFrontEnd restores demod quality through a live
engine on a channel that breaks the un-equalized demod."""

import numpy as np
import jax.numpy as jnp
import pytest

from psk_soft_tpu import DemodConfig
from psk_soft_tpu.ops.equalizer import (EqConfig, eq_block, eq_init,
                                        make_eq_fn, multipath)
from psk_soft_tpu.runtime.equalizer import EqFrontEnd


def _qpsk(c, syms, sps, seed=0, snr_db=30.0):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, 4, (c, syms))
    x = np.repeat(np.exp(2j * np.pi * idx / 4), sps, axis=1)
    sigma = 10.0 ** (-snr_db / 20.0)
    x = x + sigma / np.sqrt(2) * (rng.standard_normal(x.shape)
                                  + 1j * rng.standard_normal(x.shape))
    return x.astype(np.complex64), idx


def _sym_err(y, idx, sps, max_delay=8):
    """Residual symbol error modulo the CMA phase ambiguity, minimized
    over integer delays (the equalizer's group delay)."""
    best = np.inf
    pts = np.exp(2j * np.pi * idx / 4)
    for d in range(max_delay):
        dec = y[d + sps // 2::sps][: idx.size - 2]
        sent = pts[: dec.size]
        if dec.size < 16:
            continue
        rot = np.sum(dec * np.conj(sent))
        rot = rot / max(abs(rot), 1e-12)
        err = np.max(np.abs(dec - rot * sent))
        best = min(best, err)
    return best


def test_identity_init_is_passthrough():
    cfg = EqConfig(taps=9, mu=0.0)
    x, _ = _qpsk(3, 64, 4, seed=1)
    st = eq_init(cfg, (3,))
    st, y, info = eq_block(cfg, st, jnp.asarray(x))
    d = cfg.center_tap
    # Output is the input delayed by the center tap (zero history start).
    np.testing.assert_allclose(np.asarray(y)[:, d:], x[:, :x.shape[1] - d],
                               atol=1e-6)
    assert float(np.asarray(info["grad_norm"]).max()) == 0.0


def test_frozen_streaming_equals_oneshot_any_split():
    cfg = EqConfig(taps=11, mu=0.0)
    rng = np.random.default_rng(2)
    w = (rng.standard_normal((2, 11)) + 1j * rng.standard_normal((2, 11))
         ).astype(np.complex64) * 0.3
    x, _ = _qpsk(2, 200, 4, seed=3)
    fn = make_eq_fn(cfg)

    st = eq_init(cfg, (2,))._replace(w=jnp.asarray(w))
    _, y_once, _ = fn(st, jnp.asarray(x))

    for splits in ([100], [17, 200, 555], list(range(40, 800, 40))):
        st2 = eq_init(cfg, (2,))._replace(w=jnp.asarray(w))
        outs = []
        for blk in np.split(x, splits, axis=1):
            st2, y, _ = fn(st2, jnp.asarray(blk))
            outs.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(outs, axis=1),
                                   np.asarray(y_once), atol=1e-5)


def test_cma_inverts_multipath():
    sps = 4
    chan = [1.0, 0.0, 0.45 * np.exp(1j * 2.1), 0.2 * np.exp(-1j * 0.7)]
    x, idx = _qpsk(1, 6000, sps, seed=4)
    rx = multipath(x, chan)

    # Unequalized: severe ISI -- decisions far off the constellation.
    assert _sym_err(rx[0], idx[0, 10:], sps) > 0.3

    cfg = EqConfig(taps=15, mu=5e-4)
    fn = make_eq_fn(cfg)
    st = eq_init(cfg, (1,))
    blocks = np.split(rx[:, :24000], 24000 // 400, axis=1)
    errs = []
    for blk in blocks:
        st, y, info = fn(st, jnp.asarray(blk))
        errs.append(float(info["cm_err"][0]))
    # CMA cost collapses and stays down.
    assert errs[-1] < errs[0] / 15.0, (errs[0], errs[-1])
    # Converged weights: re-filter the tail and check symbol recovery
    # modulo the CMA phase ambiguity.
    frozen = EqConfig(taps=15, mu=0.0)
    st_f = eq_init(frozen, (1,))._replace(w=st.w)
    _, y, _ = make_eq_fn(frozen)(st_f, jnp.asarray(rx[:, -8000:]))
    tail_idx = idx[0, -(8000 // sps):]
    assert _sym_err(np.asarray(y)[0], tail_idx, sps, max_delay=15) < 0.15


def test_power_normalization_mu_transfers_across_scales():
    sps = 4
    chan = [1.0, 0.4j]
    x, _ = _qpsk(1, 3000, sps, seed=5)
    cfg = EqConfig(taps=9, mu=3e-4)
    fn = make_eq_fn(cfg)

    def converge(scale):
        rx = multipath(x, chan) * scale
        st = eq_init(cfg, (1,))
        for blk in np.split(rx, 30, axis=1):
            st, _, info = fn(st, jnp.asarray(blk))
        return float(info["cm_err"][0]) / scale ** 4

    # Relative CMA cost lands in the same place at 40x input scale.
    a, b = converge(1.0), converge(40.0)
    assert b < 5 * a + 1e-3, (a, b)


def test_validation():
    with pytest.raises(ValueError):
        EqConfig(taps=0)
    with pytest.raises(ValueError):
        EqConfig(stride=0)
    with pytest.raises(ValueError):
        EqConfig(taps=5, center=5)
    with pytest.raises(ValueError):
        EqConfig(mu=-1.0)
    cfg = EqConfig(taps=9, stride=4)
    with pytest.raises(ValueError):
        eq_block(cfg, eq_init(cfg, (1,)),
                 jnp.zeros((1, 30), jnp.complex64))   # not stride-aligned
    with pytest.raises(ValueError):
        eq_block(EqConfig(taps=9), eq_init(EqConfig(taps=9), (1,)),
                 jnp.zeros((1, 4), jnp.complex64))    # shorter than taps-1


def test_front_end_restores_demod_through_live_engine():
    from psk_soft_tpu.runtime.engine import BatchEngine
    from psk_soft_tpu.runtime.quality import QualityMonitor
    from psk_soft_tpu.runtime.streams import SRI

    sps = 8
    cfg = DemodConfig(sps=sps, num_avg=50, constellation_size=4,
                      phase_avg=50)
    # Echo at exactly one symbol delay: every sample carries ISI, which
    # defeats the demod's clean-sample timing selection (a shorter echo
    # is dodged by the energy argmax -- itself worth knowing).
    chan = [1.0] + [0.0] * 7 + [0.5j]
    x, _ = _qpsk(2, 8192, sps, seed=6, snr_db=35.0)
    rx = multipath(x, chan)
    blocks = np.split(rx, rx.shape[1] // (256 * sps), axis=1)

    def run(equalized):
        eng = QualityMonitor(BatchEngine(cfg, 2, block_symbols=256),
                             alpha=0.05)
        eng.set_input_sri(SRI(stream_id="eq"))
        fe = EqFrontEnd(eng, EqConfig(taps=33, mu=5e-5)) if equalized \
            else eng
        for blk in blocks:
            if equalized:
                fe.push_block(blk)
            else:
                for c in range(2):
                    eng.push(c, blk[c])
            fe.step_packets() if equalized else eng.step_packets()
        return eng.snapshot()

    raw = run(False)
    eq = run(True)
    # The multipath channel wrecks the un-equalized constellation; the
    # front-end restores it.
    assert (eq["evm_pct"] < raw["evm_pct"] / 2).all(), (raw, eq)
    assert (eq["lock"] > 0.8).all()
    assert (eq["snr_db"] > raw["snr_db"] + 6).all()


def test_front_end_surface():
    from psk_soft_tpu.runtime.engine import BatchEngine

    cfg = DemodConfig(sps=4, num_avg=20, constellation_size=4, phase_avg=10)
    fe = EqFrontEnd(BatchEngine(cfg, 2, block_symbols=32))
    x, _ = _qpsk(2, 64, 4, seed=7)
    # Ragged per-channel pushes stage to the lockstep grid: nothing runs
    # until every channel has data, then one lockstep step fires.
    fe.push(0, x[0])
    assert fe.updates == 0
    fe.push(1, x[1])
    assert fe.updates == 1
    # ...and produce the same weights as one lockstep push_block.
    fe2 = EqFrontEnd(BatchEngine(cfg, 2, block_symbols=32))
    fe2.push_block(x)
    np.testing.assert_array_equal(fe.weights, fe2.weights)
    with pytest.raises(ValueError):
        fe.push(0, x[0][:3]) or fe.push_block(x)  # ragged pending
    fe.reset_eq()
    fe.push_block(x)
    assert fe.updates == 1
    fe.freeze()
    fe.push_block(x)
    assert fe.updates == 1          # frozen: no more updates
    w0 = fe.weights.copy()
    fe.push_block(x)
    np.testing.assert_array_equal(fe.weights, w0)
    fe.adapt()
    fe.push_block(x)
    assert fe.updates == 2
    assert fe.cm_err.shape == (2,)
    fe.reset_eq()
    assert fe.updates == 0
    # planes path round-trips too
    fe.push_planes(np.ascontiguousarray(x.real.T),
                   np.ascontiguousarray(x.imag.T))


# -- decision-directed refinement (round 4) ---------------------------------

def _dd_scenario(seed=5, snr_db=40.0):
    """Under-modeled equalizer over a harsh channel with an arbitrary
    rotation: the regime where CMA's modulus-only cost leaves residual
    ISI that DD-LMS can still remove."""
    rng = np.random.default_rng(seed)
    c, syms, sps = 4, 20000, 4
    idx = rng.integers(0, 4, (c, syms))
    x = np.repeat(np.exp(2j * np.pi * idx / 4), sps, axis=1)
    sigma = 10.0 ** (-snr_db / 20.0) / np.sqrt(2)
    x = x + sigma * (rng.standard_normal(x.shape)
                     + 1j * rng.standard_normal(x.shape))
    chan = [1.0, 0.0, 0.45 + 0.3j, 0.0, -0.25j, 0.1]
    rx = multipath(x.astype(np.complex64), chan) * np.exp(1j * 0.77)
    return rx, idx, sps


def _dec_mse(y, idx, sps, k_base, skip):
    """Decision MSE vs the sent symbols, minimized over the equalizer's
    unknown (delay, rotation)."""
    tot = []
    for ch in range(y.shape[0]):
        best = np.inf
        for d in range(sps):
            dec = y[ch][skip + d::sps][:2000]
            base = (k_base + skip + d) // sps
            for ko in range(base - 6, base + 3):
                sent = np.exp(2j * np.pi * idx[ch, ko:ko + dec.size] / 4)
                dv = dec[:sent.size]
                rot = np.sum(dv * np.conj(sent))
                rot = rot / max(abs(rot), 1e-12)
                best = min(best, np.mean(np.abs(dv - rot * sent) ** 2))
        tot.append(best)
    return float(np.mean(tot))


def test_dd_refinement_beats_cma_floor():
    import copy

    rx, idx, sps = _dd_scenario()
    blk = 800
    nblocks = rx.shape[1] // blk
    half = nblocks // 2
    taps = 9
    warm_fn = make_eq_fn(EqConfig(taps=taps, mu=3e-4))
    st = eq_init(EqConfig(taps=taps, mu=3e-4), (rx.shape[0],))
    for i in range(half):
        st, _, _ = warm_fn(st, rx[:, i * blk:(i + 1) * blk])

    def steady(cfg, st0):
        fn = make_eq_fn(cfg)
        ys = []
        for i in range(half, nblocks):
            st0, y, _ = fn(st0, rx[:, i * blk:(i + 1) * blk])
            ys.append(np.asarray(y))
        return np.concatenate(ys, axis=1)

    skip = (nblocks - half - 3) * blk
    mse_cma = _dec_mse(steady(EqConfig(taps=taps, mu=1e-4),
                              copy.deepcopy(st)), idx, sps, half * blk, skip)
    mse_dd = _dec_mse(steady(EqConfig(taps=taps, mu=1e-4, mode="dd",
                                      dd_m=4), copy.deepcopy(st)),
                      idx, sps, half * blk, skip)
    # Gated DD removes ISI the modulus cost cannot see (~1.8x measured).
    assert mse_dd < 0.75 * mse_cma, (mse_cma, mse_dd)


def test_dd_streaming_equals_oneshot_frozen():
    cfg = EqConfig(taps=11, mu=0.0, mode="dd")
    x, _ = _qpsk(3, 200, 4, seed=3)
    st = eq_init(cfg, (3,))
    _, y_once, _ = eq_block(cfg, st, x)
    st2 = eq_init(cfg, (3,))
    parts = []
    for lo, hi in ((0, 180), (180, 400), (400, 800)):
        st2, y, _ = eq_block(cfg, st2, x[:, lo:hi])
        parts.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(parts, axis=1),
                               np.asarray(y_once), atol=1e-6)


def test_dd_validation():
    with pytest.raises(ValueError):
        EqConfig(mode="rls")
    with pytest.raises(ValueError):
        EqConfig(mode="dd", dd_m=3)
    with pytest.raises(ValueError):
        EqConfig(dd_gate=-0.1)


def test_front_end_auto_switch_and_reset():
    from psk_soft_tpu.runtime.engine import BatchEngine

    cfg = DemodConfig(sps=4, num_avg=20, constellation_size=4, phase_avg=10)
    chan = [1.0, 0.0, 0.3j]
    x, _ = _qpsk(2, 4096, 4, seed=11)
    rx = multipath(x, chan)
    fe = EqFrontEnd(BatchEngine(cfg, 2, block_symbols=64),
                    EqConfig(taps=15, mu=5e-4), dd_switch=0.05, dd_hold=2)
    assert fe.mode == "cma"
    blk = 512
    for pos in range(0, rx.shape[1] - blk + 1, blk):
        fe.push_block(rx[:, pos:pos + blk])
    assert fe.mode == "dd"             # locked, handed over
    assert fe.cm_err.mean() < 0.05     # DD MSE small after refinement
    fe.reset_eq()
    assert fe.mode == "cma"            # fresh weights re-acquire with CMA
