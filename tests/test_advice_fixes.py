"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. pskq_pop_into returns the actual float count; a head packet smaller than
   the caller's buffer is trimmed, never delivered with a garbage tail.
2. StreamEngine re-anchors its timestamp base on a mid-stream xdelta change.
3. BatchEngine.configure rebuilds the jitted non-finite guard.
4. NativePacketQueue.pop treats a finite timeout as a whole-call deadline.
"""

import time

import numpy as np

from psk_soft_tpu import DemodConfig
from psk_soft_tpu.runtime.engine import BatchEngine, StreamEngine
from psk_soft_tpu.runtime.native_queue import NativePacketQueue
from psk_soft_tpu.runtime.streams import SRI, Packet, PORT_SOFT
from psk_soft_tpu.testing.signals import gen_psk


def test_pop_trims_to_actual_count():
    """If the head shrinks between peek and pop (overflow-flush + push),
    _pop_exact must trim to the floats actually copied."""
    q = NativePacketQueue()
    data = np.arange(6, dtype=np.float32).view(np.complex64)  # 6 floats
    q.push(data, SRI(stream_id="s", mode=1))
    # Caller peeked a LARGER size (stale peek): pop with an oversize buffer.
    pkt = q._pop_exact(64)
    assert pkt is not None
    assert pkt.data.size == 3  # 3 complex64 = 6 floats, no garbage tail
    np.testing.assert_array_equal(pkt.data.view(np.float32),
                                  np.arange(6, dtype=np.float32))
    q.close()


def test_pop_too_small_buffer_repeeks():
    q = NativePacketQueue()
    q.push(np.arange(8, dtype=np.float32), SRI(stream_id="s", mode=0))
    assert q._pop_exact(4) is None          # -2: stays queued
    pkt = q.pop(timeout=1.0)                # re-peeks the true size
    assert pkt is not None and pkt.data.size == 8
    q.close()


def test_pop_timeout_is_deadline():
    q = NativePacketQueue()
    t0 = time.monotonic()
    assert q.pop(timeout=0.2) is None
    assert time.monotonic() - t0 < 2.0
    q.close()


def test_xdelta_change_reanchors_timestamps():
    """After a rate change, output packet times must be based on the new
    xdelta and the change-packet's T, not the stale stream origin."""
    cfg = DemodConfig(sps=8, num_avg=50, constellation_size=4, phase_avg=20)
    eng = StreamEngine(cfg, block_symbols=64)
    x, _ = gen_psk(600, 8, 4)
    eng.process(Packet(data=x[:2400], sri=SRI(stream_id="s", xdelta=0.01),
                       t=0.0))
    # Rate change at t=100.0 with an empty-enough staging buffer.
    out = eng.process(Packet(data=x[2400:],
                             sri=SRI(stream_id="s", xdelta=0.5), t=100.0))
    assert PORT_SOFT in out
    t_out = out[PORT_SOFT].t
    # Old anchoring would give ~0 + 0.5*8*k (k = 250+ symbols) >> 1000 or
    # ~0.01-scaled small times; new anchoring starts near the packet T.
    staged = 2400 - (2400 // (64 * 8)) * (64 * 8)  # leftover staged samples
    expect = 100.0 - 0.5 * staged
    assert abs(t_out - expect) < 0.5 * 8 * 2, (t_out, expect)


def test_batch_configure_rebuilds_guard():
    cfg0 = DemodConfig(sps=8, num_avg=20, constellation_size=4, phase_avg=10)
    cfg1 = dataclasses_replace(cfg0, constellation_size=8)
    eng = BatchEngine(cfg0, channels=2, block_symbols=32,
                      guard_nonfinite=True)
    g0 = eng._guard_fn
    assert g0 is not None
    eng.configure(cfg1)
    assert eng._guard_fn is not None and eng._guard_fn is not g0
    assert eng.cfg == cfg1
    # The rebuilt guard still works end-to-end: a NaN burst on channel 0
    # triggers exactly one per-channel resync.
    x, _ = gen_psk(64, 8, 8, seed=11)
    bad = x.copy()
    # Decisions lag the input by num_avg-1 symbols (the reference selects
    # from the OLDEST window symbol, cpp/psk_soft.cpp:465), so poison
    # symbols 25-26 and step twice: the NaNs reach valid outputs ~44-45.
    bad[200:210] = np.nan
    eng.push(0, bad)
    eng.push(1, x)
    eng.step()
    eng.step()
    assert eng.channel_resyncs[0] >= 1
    assert eng.channel_resyncs[1] == 0


def dataclasses_replace(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, **kw)
