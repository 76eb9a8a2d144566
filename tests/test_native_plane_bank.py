"""Native plane bank (native/pskbank.cpp PlaneBank via NativePlaneBank):
time-major re/im deframing in both wire formats, wraparound, overflow
semantics, and layout agreement with the channel-major bank."""

import threading

import numpy as np

from psk_soft_tpu.runtime.native_bank import (NativeChannelBank,
                                              NativePlaneBank)


def _frames(n, C, seed=0):
    rng = np.random.default_rng(seed)
    z = (rng.standard_normal((n, C)) + 1j * rng.standard_normal((n, C)))
    return z.astype(np.complex64)


def test_f32_planes_match_numpy():
    C, n = 7, 500
    f = _frames(n, C, seed=1)
    bank = NativePlaneBank(C, capacity_samples=2048)
    assert not bank.push_interleaved(f)
    re, im, flushed = bank.pop_planes(n)
    assert not flushed
    np.testing.assert_array_equal(re, f.real)     # (n, C) time-major
    np.testing.assert_array_equal(im, f.imag)


def test_i16_planes_roundtrip():
    C, n = 5, 300
    rng = np.random.default_rng(3)
    iq = rng.integers(-32768, 32768, size=(n, C, 2), dtype=np.int16)
    bank = NativePlaneBank(C, capacity_samples=1024, dtype="i16")
    assert not bank.push_interleaved(iq.ravel())
    re, im, flushed = bank.pop_planes(n)
    assert not flushed
    assert re.dtype == np.int16
    np.testing.assert_array_equal(re, iq[..., 0])
    np.testing.assert_array_equal(im, iq[..., 1])


def test_wraparound_exact():
    C, cap = 3, 256
    bank = NativePlaneBank(C, capacity_samples=cap)
    stream = _frames(cap * 5, C, seed=2)
    out_re, out_im = [], []
    pos = 0
    push, popn = 96, 80
    while pos < stream.shape[0] - push:
        bank.push_interleaved(stream[pos: pos + push])
        pos += push
        while bank.depth() >= popn:
            re, im, fl = bank.pop_planes(popn, timeout=0)
            assert not fl
            out_re.append(re)
            out_im.append(im)
    got_re = np.concatenate(out_re, axis=0)
    np.testing.assert_array_equal(got_re, stream[: got_re.shape[0]].real)
    np.testing.assert_array_equal(np.concatenate(out_im, axis=0),
                                  stream[: got_re.shape[0]].imag)


def test_overflow_flushes_and_flags():
    C, cap = 2, 128
    bank = NativePlaneBank(C, capacity_samples=cap)
    bank.push_interleaved(_frames(100, C))
    assert bank.push_interleaved(_frames(100, C, seed=9))  # overflow
    assert bank.depth() == 100                             # only the new data
    re, im, flushed = bank.pop_planes(100, timeout=0)
    assert flushed
    f = _frames(100, C, seed=9)
    np.testing.assert_array_equal(re, f.real)
    re2 = bank.pop_planes(1, timeout=0)
    assert re2 is None


def test_matches_channel_bank_layout():
    """Plane pop is exactly the channel-major pop transposed + split."""
    C, n = 8, 256
    f = _frames(n, C, seed=4)
    pb = NativePlaneBank(C, capacity_samples=1024)
    cb = NativeChannelBank(C, capacity_samples=1024)
    pb.push_interleaved(f)
    cb.push_interleaved(f)
    re, im, _ = pb.pop_planes(n)
    blk, _ = cb.pop_block(n)
    np.testing.assert_array_equal(re, blk.real.T)
    np.testing.assert_array_equal(im, blk.imag.T)


def test_threaded_producer_consumer():
    C, total, blk = 4, 4096, 256
    # Capacity covers the whole stream: the producer free-runs, so a smaller
    # ring would legally overflow-flush (that path is tested separately).
    bank = NativePlaneBank(C, capacity_samples=total + 1)
    stream = _frames(total, C, seed=5)

    def produce():
        for i in range(0, total, 128):
            bank.push_interleaved(stream[i: i + 128])
        bank.close()

    t = threading.Thread(target=produce)
    t.start()
    got = []
    while len(got) * blk < total:
        r = bank.pop_planes(blk, timeout=5.0)
        assert r is not None
        got.append(r[0] + 1j * r[1].astype(np.float32))
    t.join()
    np.testing.assert_array_equal(
        np.concatenate(got, axis=0), stream.astype(np.complex64))


def test_i16_rejects_complex_push():
    bank = NativePlaneBank(2, capacity_samples=64, dtype="i16")
    try:
        bank.push_interleaved(_frames(4, 2))
    except ValueError:
        return
    raise AssertionError("complex push into an i16 bank must raise")
