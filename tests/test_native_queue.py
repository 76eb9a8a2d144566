"""Native C++ packet queue: ctypes surface, overflow-flush semantics, and the
end-to-end feed thread -> engine path."""

import threading
import time

import numpy as np

from psk_soft_tpu import DemodConfig
from psk_soft_tpu.runtime.engine import StreamEngine
from psk_soft_tpu.runtime.native_queue import (FeedThread, NativePacketQueue,
                                               QueueStats)
from psk_soft_tpu.runtime.streams import SRI, PORT_SOFT
from psk_soft_tpu.testing.signals import gen_psk

SRI_IN = SRI(stream_id="nq", xdelta=0.01, mode=1)


def test_push_pop_roundtrip():
    q = NativePacketQueue()
    x = (np.arange(8) + 1j * np.arange(8)).astype(np.complex64)
    q.push(x, SRI_IN, t=1.5)
    pkt = q.pop(timeout=1.0)
    assert pkt is not None
    np.testing.assert_array_equal(pkt.data, x)
    assert pkt.sri.stream_id == "nq"
    assert pkt.sri.xdelta == 0.01
    assert pkt.t == 1.5
    assert not pkt.input_queue_flushed


def test_pop_timeout():
    q = NativePacketQueue()
    t0 = time.time()
    assert q.pop(timeout=0.05) is None
    assert time.time() - t0 >= 0.04


def test_overflow_flush_semantics():
    """A push onto a full queue drops the backlog and flags the next
    delivered packet (BulkIO inputQueueFlushed equivalent)."""
    q = NativePacketQueue(capacity_bytes=1024, max_packets=4)
    x = np.zeros(64, np.complex64)  # 512 bytes each
    assert not q.push(x, SRI_IN)
    assert not q.push(x, SRI_IN)
    flushed = q.push(x, SRI_IN)  # 512*2 queued + 512 > 1024 -> flush
    assert flushed
    pkt = q.pop(timeout=1.0)
    assert pkt.input_queue_flushed
    st = q.stats()
    assert isinstance(st, QueueStats)
    assert st.flushes == 1
    assert st.dropped_packets == 2


def test_blocking_pop_wakes_on_push():
    q = NativePacketQueue()
    got = {}

    def consumer():
        got["pkt"] = q.pop(timeout=5.0)

    th = threading.Thread(target=consumer)
    th.start()
    time.sleep(0.05)
    q.push(np.ones(4, np.complex64), SRI_IN)
    th.join(timeout=5.0)
    assert got["pkt"] is not None


def test_feed_thread_end_to_end():
    """Producer thread -> native queue -> feed thread -> engine -> outputs."""
    cfg = DemodConfig(sps=8, num_avg=50, constellation_size=4, phase_avg=20)
    q = NativePacketQueue()
    eng = StreamEngine(cfg, block_symbols=64)
    feeder = FeedThread(q, eng)
    feeder.start()
    x, syms = gen_psk(500, 8, 4)
    for i, seg in enumerate(np.split(x, 10)):
        q.push(seg, SRI_IN, t=i * 4.0, eos=(i == 9))
    feeder.join(timeout=60.0)
    soft = np.concatenate([p.data for p in feeder.outputs[PORT_SOFT]])
    assert soft.size == 500 - 49
    thetas = [0, np.pi / 2, np.pi, 3 * np.pi / 2]
    expected = syms[:soft.size] * np.exp(1j * np.pi / 4)
    err = min(np.abs(soft[1:] * np.exp(1j * t) - expected[1:]).max()
              for t in thetas)
    assert err < 1e-3
    assert q.stats().popped == 10
