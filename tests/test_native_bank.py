"""Native channel-bank ring (native/pskbank.cpp via runtime/native_bank.py):
deinterleave correctness, ring wraparound, overflow-flush semantics, and the
threaded producer/consumer path feeding an engine block."""

import threading

import numpy as np
import pytest

from psk_soft_tpu.runtime.native_bank import NativeChannelBank


def _frames(n, C, seed=0):
    rng = np.random.default_rng(seed)
    z = (rng.standard_normal((n, C)) + 1j * rng.standard_normal((n, C)))
    return z.astype(np.complex64)


def test_deinterleave_matches_numpy():
    C, n = 7, 500
    f = _frames(n, C, seed=1)
    bank = NativeChannelBank(C, capacity_samples=2048)
    assert not bank.push_interleaved(f)
    blk, flushed = bank.pop_block(n)
    assert not flushed
    np.testing.assert_array_equal(blk, f.T)


def test_ring_wraparound_exact():
    C, cap = 3, 256
    bank = NativeChannelBank(C, capacity_samples=cap)
    # Fill/drain repeatedly with odd sizes so head wraps mid-block.
    stream = _frames(cap * 5, C, seed=2)
    out = []
    pos = 0
    push, popn = 96, 80
    while pos < stream.shape[0] - push:
        bank.push_interleaved(stream[pos: pos + push])
        pos += push
        while bank.depth() >= popn:
            out.append(bank.pop_block(popn)[0])
    got = np.concatenate(out, axis=1)
    np.testing.assert_array_equal(got, stream[: got.shape[1]].T)


def test_overflow_flushes_and_flags():
    C, cap = 2, 128
    bank = NativeChannelBank(C, capacity_samples=cap)
    bank.push_interleaved(_frames(100, C, seed=3))
    fl = bank.push_interleaved(_frames(100, C, seed=4))   # 200 > 128: flush
    assert fl                           # push reports the flush
    assert bank.depth() == 100          # only the new data remains
    blk, flushed = bank.pop_block(100)
    assert flushed                      # consumer sees the marker once
    f2 = _frames(10, C, seed=5)
    bank.push_interleaved(f2)
    blk2, flushed2 = bank.pop_block(10)
    assert not flushed2                 # marker cleared
    np.testing.assert_array_equal(blk2, f2.T)
    s = bank.stats()
    assert s.flushes == 1 and s.dropped_samples == 100


def test_oversized_push_keeps_most_recent():
    C, cap = 2, 64
    bank = NativeChannelBank(C, capacity_samples=cap)
    f = _frames(200, C, seed=6)
    assert bank.push_interleaved(f)     # flush + truncate to newest cap
    assert bank.depth() == cap
    blk, flushed = bank.pop_block(cap)
    assert flushed
    np.testing.assert_array_equal(blk, f[-cap:].T)


def test_threaded_producer_consumer():
    C, n_blocks, blk = 4, 50, 200
    stream = _frames(n_blocks * blk, C, seed=7)
    bank = NativeChannelBank(C, capacity_samples=blk * n_blocks + 1)

    def produce():
        for i in range(0, stream.shape[0], 37):
            bank.push_interleaved(stream[i: i + 37])
        bank.close()

    t = threading.Thread(target=produce)
    t.start()
    got = []
    while len(got) < n_blocks:
        r = bank.pop_block(blk, timeout=5.0)
        if r is None:
            break
        got.append(r[0])
    t.join()
    assert len(got) == n_blocks
    np.testing.assert_array_equal(np.concatenate(got, axis=1), stream.T)


def test_pop_timeout_returns_none():
    bank = NativeChannelBank(2, capacity_samples=64)
    assert bank.pop_block(10, timeout=0.05) is None


def test_push_rejects_partial_frames():
    bank = NativeChannelBank(4, capacity_samples=64)
    with pytest.raises(ValueError):
        bank.push_interleaved(np.zeros(6, np.complex64))  # 6 % 4 != 0


def test_engine_push_block_equivalence():
    from psk_soft_tpu import DemodConfig
    from psk_soft_tpu.runtime.engine import BatchEngine

    cfg = DemodConfig(sps=8, num_avg=20, constellation_size=4, phase_avg=10)
    C, S = 3, 64
    rng = np.random.default_rng(11)
    x = np.stack([
        np.repeat(np.exp(2j * np.pi * rng.integers(0, 4, 3 * S) / 4), 8)
        for _ in range(C)]).astype(np.complex64)
    e_ref = BatchEngine(cfg, C, block_symbols=S)
    e_blk = BatchEngine(cfg, C, block_symbols=S)
    for c in range(C):
        e_ref.push(c, x[c])
    e_blk.push_block(x)
    outs_ref, outs_blk = [], []
    while (o := e_ref.step()) is not None:
        outs_ref.append(o)
    while (o := e_blk.step()) is not None:
        outs_blk.append(o)
    assert len(outs_ref) == len(outs_blk) == 3
    for a, b in zip(outs_ref, outs_blk):
        np.testing.assert_array_equal(np.asarray(a.soft),
                                      np.asarray(b.soft))
