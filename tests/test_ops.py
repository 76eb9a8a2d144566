"""Unit tests for the demod ops the reference leaves dark (SURVEY.md section 4):
the linear-fit tracker in isolation, slicers against the documented mapping,
unwrap primitives, and timing recovery under an injected timing offset.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from psk_soft_tpu.ops import linear_fit, phase as phase_ops, slicers, timing
from psk_soft_tpu import DemodConfig, demod_init, make_demod_fn


# ---------------------------------------------------------------- LinearFit

def _reference_fit_next(history, n):
    """Reference semantics (cpp/psk_soft.cpp:48-87): fit of the last
    min(len, n) points evaluated at the newest, via numpy lstsq."""
    win = history[-n:]
    p = len(win)
    if p == 0:
        return 0.0
    if p == 1:
        return win[0]
    xs = np.arange(p, dtype=np.float64)
    m, b = np.polyfit(xs, np.asarray(win, np.float64), 1)
    return m * (p - 1) + b


def test_ring_fit_matches_polyfit():
    n = 7
    rng = np.random.default_rng(0)
    ys = rng.standard_normal(25).astype(np.float32) * 3
    ring = jnp.zeros((n,), jnp.float32)
    pos = jnp.int32(0)
    fill = jnp.int32(0)
    hist = []
    for y in ys:
        hist.append(float(y))
        ring = ring.at[pos].set(y)
        fill = jnp.minimum(fill + 1, n)
        pos = (pos + 1) % n
        got = float(linear_fit.ring_fit(ring, pos, fill, jnp.float32(y)))
        want = _reference_fit_next(hist, n)
        assert got == pytest.approx(want, abs=1e-4), (len(hist), got, want)


def test_endpoint_fir_weights_match_polyfit():
    for n in (2, 5, 50):
        w = linear_fit.endpoint_fir_weights(n)
        rng = np.random.default_rng(n)
        y = rng.standard_normal(n)
        want = _reference_fit_next(list(y), n)
        assert float(w @ y) == pytest.approx(want, abs=1e-4)


def test_warmup_weight_matrix():
    n = 6
    mat = linear_fit.warmup_fir_weight_matrix(n)
    rng = np.random.default_rng(1)
    y = rng.standard_normal(n)
    for p in range(1, n + 1):
        padded = np.zeros(n)
        padded[n - p:] = y[:p]
        want = _reference_fit_next(list(y[:p]), n)
        assert float(mat[p - 1] @ padded) == pytest.approx(want, abs=1e-4)


# ---------------------------------------------------------------- slicers

def _pt(theta):
    return np.complex64(np.exp(1j * theta))


def test_bpsk_mapping():
    # psk_soft.scd.xml:44-45: phase 0 -> 0, pi -> 1.
    out = np.asarray(slicers.slice_bpsk(jnp.array([_pt(0), _pt(np.pi)])))
    np.testing.assert_array_equal(out[:, 0], [0, 1])


def test_qpsk_mapping():
    # psk_soft.scd.xml:47-51: pi/4 -> 00, 3pi/4 -> 01, 5pi/4 -> 10, 7pi/4 -> 11
    # (value = b0 + 2*b1, LSB-first like cpp/psk_soft.cpp:525-526).
    pts = jnp.array([_pt(np.pi / 4), _pt(3 * np.pi / 4),
                     _pt(5 * np.pi / 4), _pt(7 * np.pi / 4)])
    out = np.asarray(slicers.slice_qpsk(pts))
    vals = out[:, 0] + 2 * out[:, 1]
    np.testing.assert_array_equal(vals, [0, 1, 2, 3])


def test_8psk_mapping():
    # psk_soft.scd.xml:53-61: phase k*pi/4 -> binary k.
    pts = jnp.array([_pt(k * np.pi / 4) for k in range(8)])
    out = np.asarray(slicers.slice_8psk(pts))
    vals = out[:, 0] + 2 * out[:, 1] + 4 * out[:, 2]
    np.testing.assert_array_equal(vals, np.arange(8))


def test_8psk_negative_wrap():
    # Phases just below 0 belong to cluster 7 or 0; -pi maps to 4 (100).
    pts = jnp.array([_pt(-np.pi / 4), _pt(-np.pi)])
    out = np.asarray(slicers.slice_8psk(pts))
    vals = out[:, 0] + 2 * out[:, 1] + 4 * out[:, 2]
    np.testing.assert_array_equal(vals, [7, 4])


def test_dynamic_slicer_matches_static():
    rng = np.random.default_rng(3)
    pts = jnp.asarray(np.exp(1j * rng.uniform(-np.pi, np.pi, 64)).astype(np.complex64))
    for m in (2, 4, 8):
        want = np.asarray(slicers.slice_bits(m, pts))
        got = np.asarray(slicers.slice_bits_dynamic(jnp.full(64, m), pts))
        np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------- phase ops

def test_block_unwrap_matches_numpy():
    rng = np.random.default_rng(5)
    true = np.cumsum(rng.uniform(-2.5, 2.5, 200))
    raw = np.angle(np.exp(1j * true)).astype(np.float32)
    got = np.asarray(phase_ops.block_unwrap(jnp.asarray(raw[1:]),
                                            jnp.float32(raw[0])))
    want = np.unwrap(raw)[1:]
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_unwrap_step():
    est = jnp.float32(10 * np.pi)
    raw = jnp.float32(0.3)
    y = float(phase_ops.unwrap_step(est, raw))
    assert abs(y - est) <= np.pi + 0.31
    assert y == pytest.approx(0.3 + 10 * np.pi, abs=1e-5)


def test_rewrap_offset():
    m = 4
    est = jnp.float32(m * 2 * np.pi * 3.2)
    off = float(phase_ops.rewrap_offset(est, m))
    assert off == pytest.approx(3 * m * 2 * np.pi, rel=1e-6)
    assert float(phase_ops.rewrap_offset(jnp.float32(1.0), m)) == 0.0


# ---------------------------------------------------------------- timing

def test_timing_recovery_injected_offset():
    """sampleIndex under an injected timing offset -- untested in the
    reference (its sampleIndex port is collected but never asserted)."""
    sps, num_avg, nsym = 8, 20, 200
    peak = 5
    rng = np.random.default_rng(7)
    j = rng.integers(0, 4, nsym)
    pts = np.exp(2j * np.pi * j / 4)
    # Energy concentrated on intra-symbol index `peak`.
    x = np.zeros(nsym * sps, np.complex64)
    x[peak::sps] = pts
    x += (0.01 * rng.standard_normal(x.size)).astype(np.complex64)
    cfg = DemodConfig(sps=sps, num_avg=num_avg, constellation_size=4,
                      phase_avg=10)
    fn = make_demod_fn(cfg)
    st, out = fn(demod_init(cfg), jnp.asarray(x))
    v = np.asarray(out.valid)
    idx = np.asarray(out.sample_index)[v]
    assert (idx == peak).mean() > 0.99


def test_windowed_bin_sums_matches_naive():
    rng = np.random.default_rng(11)
    e = rng.random((30, 8)).astype(np.float32)
    got = np.asarray(timing.windowed_bin_sums(jnp.asarray(e), 10))
    want = np.stack([e[o:o + 10].sum(0) for o in range(21)])
    np.testing.assert_allclose(got, want, rtol=1e-5)
