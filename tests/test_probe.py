"""Blind signal survey (ops/probe.py): baud estimation + PSK classification."""

import numpy as np
import pytest

from psk_soft_tpu.ops.probe import classify_psk, estimate_baud
from psk_soft_tpu.testing.signals import gen_psk_channel


def _rect_psk(num_symbols, sps, m, rng, cfo=0.0, snr_db=20.0):
    """Rectangular M-PSK at possibly fractional sps."""
    n = int(num_symbols * sps)
    idx = rng.integers(0, m, num_symbols + 1)
    sym_of_sample = np.floor(np.arange(n) / sps).astype(np.int64)
    x = np.exp(2j * np.pi * (idx[sym_of_sample] / m + cfo * np.arange(n)))
    sigma = 10 ** (-snr_db / 20) / np.sqrt(2)
    x = x + sigma * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    return x.astype(np.complex64)


def test_baud_rect_integer_sps():
    rng = np.random.default_rng(51)
    x = _rect_psk(2000, 8, 4, rng)
    sps, conf = estimate_baud(x, sps_min=2, sps_max=32)
    assert abs(sps - 8.0) < 0.05, sps
    assert conf > 20.0


def test_baud_fractional_sps():
    rng = np.random.default_rng(52)
    x = _rect_psk(2000, 7.5, 4, rng)
    sps, conf = estimate_baud(x, sps_min=2, sps_max=32)
    assert abs(sps - 7.5) < 0.05, sps
    assert conf > 10.0


def test_baud_rrc_pulses():
    x, _ = gen_psk_channel(3000, 8, 4, snr_db=20.0, pulse="rrc", seed=53)
    sps, conf = estimate_baud(x, sps_min=2, sps_max=32)
    assert abs(sps - 8.0) < 0.05, sps
    assert conf > 10.0


def test_baud_batched_and_noise_confidence():
    rng = np.random.default_rng(54)
    sig = _rect_psk(1500, 10, 4, rng)
    noise = (rng.standard_normal(sig.size)
             + 1j * rng.standard_normal(sig.size)).astype(np.complex64)
    sps, conf = estimate_baud(np.stack([sig, noise]), sps_min=2, sps_max=32)
    assert abs(sps[0] - 10.0) < 0.05
    assert conf[0] > 5 * conf[1]                 # noise row: no line


@pytest.mark.parametrize("m", [2, 4, 8])
def test_classify_order_and_cfo(m):
    rng = np.random.default_rng(55 + m)
    cfo = 0.011
    x = _rect_psk(3000, 8, m, rng, cfo=cfo, snr_db=18.0)
    m_est, cfo_est, conf = classify_psk(x, max_m=8)
    assert m_est == m
    assert abs(cfo_est - cfo) < 2e-4, cfo_est
    assert conf > 8.0


def test_classify_noise_and_batch():
    rng = np.random.default_rng(60)
    rows = [
        _rect_psk(2000, 8, 2, rng, cfo=0.003),
        _rect_psk(2000, 8, 4, rng, cfo=-0.02),
        (rng.standard_normal(16000)
         + 1j * rng.standard_normal(16000)).astype(np.complex64),
    ]
    m, cfo, conf = classify_psk(np.stack(rows), max_m=8)
    assert m.tolist() == [2, 4, 0]
    assert abs(cfo[0] - 0.003) < 2e-4
    assert abs(cfo[1] + 0.02) < 2e-4
    assert conf[2] == 0.0


def test_validation():
    with pytest.raises(ValueError):
        estimate_baud(np.zeros(4, np.complex64))
    with pytest.raises(ValueError):
        estimate_baud(np.zeros(64, np.complex64), sps_min=8, sps_max=4)
    with pytest.raises(ValueError):
        classify_psk(np.zeros(64, np.complex64), max_m=6)
    # sps band too tight for the capture length
    with pytest.raises(ValueError):
        estimate_baud(np.zeros(16, np.complex64), sps_min=30, sps_max=32)
