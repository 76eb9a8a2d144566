"""Odds and ends: matched filter in the streaming engine (incl. reconfigure
of the filter), native queue under concurrent producers, config JSON."""

import threading

import numpy as np

from psk_soft_tpu import DemodConfig
from psk_soft_tpu.runtime.engine import StreamEngine
from psk_soft_tpu.runtime.native_queue import NativePacketQueue
from psk_soft_tpu.runtime.streams import SRI, Packet, PORT_SOFT
from psk_soft_tpu.testing.signals import gen_psk_channel

SRI_IN = SRI(stream_id="s", xdelta=0.01)


def test_engine_with_rrc_matched_filter_streaming():
    cfg = DemodConfig(sps=8, num_avg=40, constellation_size=4, phase_avg=20,
                      matched_filter="rrc", timing_interp=True)
    x, _ = gen_psk_channel(800, sps=8, m=4, seed=0, snr_db=18, pulse="rrc")
    eng = StreamEngine(cfg, block_symbols=100)
    soft = []
    for i, seg in enumerate(np.split(x, 8)):
        out = eng.process(Packet(data=seg, sri=SRI_IN, eos=(i == 7)))
        if PORT_SOFT in out:
            soft.append(out[PORT_SOFT].data)
    soft = np.concatenate(soft)[100:]
    ang = np.angle(soft * np.exp(-1j * np.pi / 4)) % (np.pi / 2)
    dist = np.minimum(ang, np.pi / 2 - ang)
    assert np.percentile(dist, 99) < 0.25


def test_engine_reconfigure_matched_filter():
    """Turning the matched filter on mid-stream resyncs cleanly (tail shape
    changes; mf_tail reset)."""
    cfg0 = DemodConfig(sps=8, num_avg=30, constellation_size=4, phase_avg=10)
    cfg1 = DemodConfig(sps=8, num_avg=30, constellation_size=4, phase_avg=10,
                       matched_filter="boxcar")
    x, _ = gen_psk_channel(600, sps=8, m=4, seed=1, snr_db=25)
    eng = StreamEngine(cfg0, block_symbols=64)
    eng.process(Packet(data=x[:2400], sri=SRI_IN))
    eng.configure(cfg1)
    out = eng.process(Packet(data=x[2400:], sri=SRI_IN, eos=True))
    soft = out[PORT_SOFT].data
    assert np.isfinite(soft).all()
    assert np.abs(np.abs(soft[50:]) - 1).max() < 0.2


def test_native_queue_concurrent_producers():
    q = NativePacketQueue(capacity_bytes=64 << 20, max_packets=4096)
    n_threads, per = 8, 50

    def producer(tid):
        for k in range(per):
            data = np.full(64, tid * 1000 + k, np.complex64)
            q.push(data, SRI(stream_id=f"t{tid}"))

    threads = [threading.Thread(target=producer, args=(t,))
               for t in range(n_threads)]
    for t in threads:
        t.start()
    got = 0
    seen = set()
    while got < n_threads * per:
        pkt = q.pop(timeout=5.0)
        assert pkt is not None
        # Payload integrity: constant-fill packets arrive unmixed.
        vals = np.unique(pkt.data)
        assert vals.size == 1
        seen.add(complex(vals[0]))
        got += 1
    for t in threads:
        t.join()
    assert len(seen) == n_threads * per
    st = q.stats()
    assert st.pushed == st.popped == n_threads * per
    assert st.flushes == 0


def test_config_json_roundtrip(tmp_path):
    cfg = DemodConfig(sps=10, num_avg=64, constellation_size=8, phase_avg=32,
                      differential=True, matched_filter="rrc", rrc_beta=0.25,
                      timing_interp=True)
    s = cfg.to_json()
    assert DemodConfig.from_json(s) == cfg
    # CLI --config-json path
    p = tmp_path / "cfg.json"
    p.write_text(s)
    from psk_soft_tpu.cli import _config_from_args

    class A:
        config_json = str(p)

    assert _config_from_args(A()) == cfg
