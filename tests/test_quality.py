"""Signal-quality estimation (ops/quality.py, runtime/quality.py).

Gates: M2M4 SNR tracks the injected AWGN SNR, rotation-free EVM matches the
AWGN prediction and is invariant to global rotation (the M-fold recovery
ambiguity), the lock metric separates locked channels from noise, per-channel
M planes match scalar runs (mixed banks), the valid mask gates warm-up, and
the QualityMonitor wrapper tracks a live engine including a dead channel
alarm."""

import numpy as np

from psk_soft_tpu import DemodConfig
from psk_soft_tpu.ops.quality import block_quality, snr_db
from psk_soft_tpu.runtime.quality import QualityMonitor


def _psk_soft(c, s, m, snr_db_val, seed=0, rot=0.0):
    """(c, s) soft decisions: unit M-PSK + complex AWGN at the given SNR."""
    rng = np.random.default_rng(seed)
    k = rng.integers(0, m, size=(c, s))
    pts = np.exp(1j * (2 * np.pi * k / m + rot))
    sigma = 10.0 ** (-snr_db_val / 20.0)
    n = (rng.standard_normal((c, s)) + 1j * rng.standard_normal((c, s)))
    return (pts + sigma * n / np.sqrt(2.0)).astype(np.complex64)


def test_m2m4_snr_tracks_truth():
    snrs = [5.0, 10.0, 15.0, 20.0]
    soft = np.stack([_psk_soft(1, 8192, 4, s, seed=i)[0]
                     for i, s in enumerate(snrs)])
    q = block_quality(soft, 4)
    est = snr_db(q.snr)
    for want, got in zip(snrs, est):
        assert abs(got - want) < 1.0, (want, got)


def test_evm_matches_awgn_and_rotation_invariant():
    # EVM_rms ~= noise/signal amplitude ratio = 10^(-SNR/20) at high SNR.
    for snr in (15.0, 25.0):
        soft = _psk_soft(2, 8192, 8, snr, seed=7)
        q = block_quality(soft, 8)
        want = 10.0 ** (-snr / 20.0)
        np.testing.assert_allclose(np.asarray(q.evm), want, rtol=0.15)
        # Any global rotation (incl. the M-fold ambiguity and the QPSK
        # +pi/4 convention) must leave every metric unchanged.
        q_rot = block_quality(soft * np.exp(1j * 0.77), 8)
        np.testing.assert_allclose(np.asarray(q_rot.evm),
                                   np.asarray(q.evm), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(q_rot.lock),
                                   np.asarray(q.lock), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(q_rot.snr),
                                   np.asarray(q.snr), rtol=1e-3)


def test_lock_separates_signal_from_noise():
    # lock ~ exp(-M^2/(4*SNR)): 0.96 for QPSK at 20 dB, ~0 for noise.
    locked = _psk_soft(1, 4096, 4, 20.0, seed=1)
    rng = np.random.default_rng(2)
    noise = (rng.standard_normal((1, 4096))
             + 1j * rng.standard_normal((1, 4096))).astype(np.complex64)
    q_lock = block_quality(locked, 4)
    q_noise = block_quality(noise, 4)
    assert float(q_lock.lock[0]) > 0.9
    assert float(q_noise.lock[0]) < 0.2
    assert float(snr_db(q_noise.snr)[0]) < 3.0


def test_per_channel_m_plane_matches_scalar():
    ms = np.array([2, 4, 8, 16], np.int32)
    soft = np.stack([_psk_soft(1, 4096, int(m), 12.0, seed=int(m))[0]
                     for m in ms])
    q_mixed = block_quality(soft, ms)
    for i, m in enumerate(ms):
        q_one = block_quality(soft[i:i + 1], int(m))
        np.testing.assert_allclose(float(q_mixed.evm[i]),
                                   float(q_one.evm[0]), rtol=1e-5)
        np.testing.assert_allclose(float(q_mixed.lock[i]),
                                   float(q_one.lock[0]), rtol=1e-5)


def test_valid_mask_gates_and_empty_rows_are_neutral():
    soft = _psk_soft(2, 512, 4, 18.0, seed=3)
    # Corrupt the first half; mask it out.
    corrupted = soft.copy()
    corrupted[:, :256] = 50.0 * (1 + 1j)
    valid = np.zeros((2, 512), bool)
    valid[:, 256:] = True
    q_masked = block_quality(corrupted, 4, valid=valid)
    q_clean = block_quality(soft[:, 256:], 4)
    np.testing.assert_allclose(np.asarray(q_masked.evm),
                               np.asarray(q_clean.evm), rtol=1e-5)
    assert list(np.asarray(q_masked.count)) == [256, 256]
    q_empty = block_quality(soft, 4, valid=np.zeros((2, 512), bool))
    assert list(np.asarray(q_empty.count)) == [0, 0]
    assert float(q_empty.lock[0]) == 0.0
    assert float(q_empty.evm[0]) == 0.0


def test_amplitude_scale_reports_in_power_not_evm():
    soft = _psk_soft(1, 4096, 4, 20.0, seed=4)
    q1 = block_quality(soft, 4)
    q3 = block_quality((3.0 * soft).astype(np.complex64), 4)
    np.testing.assert_allclose(float(q3.amp[0]), 3.0 * float(q1.amp[0]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(q3.evm[0]), float(q1.evm[0]), rtol=1e-4)
    np.testing.assert_allclose(float(q3.snr[0]), float(q1.snr[0]), rtol=1e-3)


def test_monitor_tracks_live_engine_and_alarms_dead_channel():
    from psk_soft_tpu.runtime.engine import BatchEngine

    cfg = DemodConfig(sps=8, num_avg=50, constellation_size=4, phase_avg=50)
    c, s = 3, 256
    eng = BatchEngine(cfg, c, block_symbols=s)
    mon = QualityMonitor(eng, alpha=0.05)
    rng = np.random.default_rng(0)
    need = s * cfg.sps

    got = 0
    for blk in range(6):
        for ch in range(c):
            if ch < 2:
                k = rng.integers(0, 4, s)
                x = np.repeat(np.exp(2j * np.pi * k / 4), cfg.sps)
                x = x + 0.02 * (rng.standard_normal(need)
                                + 1j * rng.standard_normal(need))
            else:       # dead channel: noise only
                x = 0.1 * (rng.standard_normal(need)
                           + 1j * rng.standard_normal(need))
            mon.push(ch, x.astype(np.complex64))
        pkts = mon.step_packets()
        if pkts:
            got += 1
    assert got >= 3
    snap = mon.snapshot()
    assert snap["symbols"][0] > 0
    assert snap["lock"][0] > 0.8 and snap["lock"][1] > 0.8
    assert snap["snr_db"][0] > 10.0
    assert snap["evm_pct"][0] < 25.0
    alarms = mon.alarms()
    assert not alarms[0] and not alarms[1]
    assert alarms[2]
    # flush path also taps; reset clears the quality state.
    mon.flush_packets()
    mon.reset_quality()
    assert mon.snapshot()["symbols"].sum() == 0


def test_monitor_mixed_bank_uses_mode_plane():
    """Monitor auto-detects per-channel M from engine.params (mixed bank
    surface), via a stub engine exposing the same attributes."""

    class _Stub:
        class params:
            m = np.array([2, 8], np.int32)
            diff = np.array([False, True])

        cfg = DemodConfig(sps=8, num_avg=50, constellation_size=4,
                          phase_avg=50)
        channels = 2

    mon = QualityMonitor(_Stub(), alpha=1.0)
    soft = np.stack([_psk_soft(1, 2048, 2, 25.0, seed=5)[0],
                     _psk_soft(1, 2048, 8, 25.0, seed=6)[0]])
    mon.observe(soft)
    snap = mon.snapshot()
    assert snap["lock"][0] > 0.9 and snap["lock"][1] > 0.9
    # With the WRONG scalar M=4 the 8-PSK channel fails to concentrate
    # (the BPSK one still locks: 4 is a multiple of its true M=2).
    mon4 = QualityMonitor(_Stub(), alpha=1.0, m=4)
    mon4.observe(soft)
    assert mon4.snapshot()["lock"][1] < 0.5
