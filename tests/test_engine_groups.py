"""Failure isolation (per-channel drop-and-resync) and heterogeneous-sps
channel bucketing."""

import numpy as np

from psk_soft_tpu import DemodConfig
from psk_soft_tpu.runtime.engine import BatchEngine, GroupEngine
from psk_soft_tpu.testing.signals import gen_psk, gen_psk_channel


def test_nonfinite_channel_resyncs_alone():
    cfg = DemodConfig(sps=8, num_avg=20, constellation_size=4, phase_avg=10)
    C = 4
    eng = BatchEngine(cfg, channels=C, block_symbols=64,
                      guard_nonfinite=True)
    good = [gen_psk_channel(256, sps=8, m=4, seed=i, snr_db=25)[0]
            for i in range(C)]
    # Poison channel 2 with NaNs in its second block.
    bad = good[2].copy()
    bad[600:620] = np.nan
    for c in range(C):
        eng.push(c, good[c][:512])
    out1 = eng.step()
    for c in range(C):
        eng.push(c, (bad if c == 2 else good[c])[512:1024])
    out2 = eng.step()
    assert eng.channel_resyncs.tolist() == [0, 0, 1, 0]
    # Healthy channels keep converged output next block.
    for c in range(C):
        eng.push(c, good[c][1024:1536])
    out3 = eng.step()
    v = np.asarray(out3.valid)
    assert v[0].all() and v[1].all() and v[3].all()
    # The resynced channel restarted its warm-up (first num_avg-1 window
    # positions of its new stream are invalid again).
    assert not v[2][:19].any()
    assert v[2][19:].all()


def test_batch_engine_flush_drains_remainder():
    cfg = DemodConfig(sps=8, num_avg=20, constellation_size=4, phase_avg=10)
    eng = BatchEngine(cfg, channels=2, block_symbols=64)
    for c in range(2):
        x, _ = gen_psk(100, 8, 4, seed=300 + c)  # 100 < 2 blocks
        eng.push(c, x)
    out1 = eng.step()
    assert out1 is not None
    out2 = eng.flush()  # remaining 36 symbols
    v = np.asarray(out2.valid)
    assert v.shape[1] == 36
    total = int(np.asarray(out1.valid).sum() + v.sum())
    assert total == 2 * (100 - 19)
    assert eng.flush() is None  # idempotent on empty staging


def test_group_engine_heterogeneous_sps():
    cfgs = [
        DemodConfig(sps=8, num_avg=20, constellation_size=4, phase_avg=10),
        DemodConfig(sps=10, num_avg=20, constellation_size=2, phase_avg=10),
        DemodConfig(sps=8, num_avg=20, constellation_size=4, phase_avg=10),
    ]
    ge = GroupEngine(cfgs, block_symbols=64)
    assert len(ge.groups) == 2  # sps-8 pair bucketed together
    sigs = []
    for ch, cfg in enumerate(cfgs):
        x, _ = gen_psk(128, cfg.sps, cfg.constellation_size, seed=100 + ch)
        sigs.append(x)
        ge.push(ch, x)
    collected = {ch: [] for ch in range(3)}
    while True:
        results = ge.step_all()
        if not results:
            break
        for ch, out in results.items():
            collected[ch].append(out)
    for ch, cfg in enumerate(cfgs):
        v = np.concatenate([np.asarray(o.valid) for o in collected[ch]])
        soft = np.concatenate([np.asarray(o.soft) for o in collected[ch]])[v]
        assert v.sum() == 128 - (cfg.num_avg - 1)
        assert np.abs(np.abs(soft) - 1).max() < 0.01


def test_batch_engine_configure():
    """Live reconfigure on the batch engine (phaseAvg change keeps lock)."""
    cfg0 = DemodConfig(sps=8, num_avg=20, constellation_size=4, phase_avg=16)
    cfg1 = DemodConfig(sps=8, num_avg=20, constellation_size=4, phase_avg=8)
    eng = BatchEngine(cfg0, channels=2, block_symbols=64)
    sigs = [gen_psk(256, 8, 4, seed=500 + c)[0] for c in range(2)]
    for c in range(2):
        eng.push(c, sigs[c][: 128 * 8])
    eng.step()
    eng.configure(cfg1)
    assert eng.metrics.reconfigures == 1
    for c in range(2):
        eng.push(c, sigs[c][128 * 8:])
    out = eng.step()
    soft = np.asarray(out.soft)[np.asarray(out.valid)]
    assert np.abs(np.abs(soft) - 1).max() < 0.01


def test_group_engine_packet_layer():
    """Per-group SRI/timestamp packet assembly (BatchEngine passthrough),
    with per-group output-rate rescaling and EOS marking."""
    from psk_soft_tpu.runtime.streams import SRI, PORT_SOFT, PORT_BITS

    cfgs = ([DemodConfig(sps=8, num_avg=20, constellation_size=4,
                         phase_avg=10)] * 2
            + [DemodConfig(sps=10, num_avg=20, constellation_size=2,
                           phase_avg=10)])
    eng = GroupEngine(cfgs, block_symbols=64, pipeline_depth=1)
    eng.set_input_sri(SRI(stream_id="hetero", xdelta=1e-6), t=2.0)
    rng = np.random.default_rng(0)
    for b in range(3):
        for ch, cfg in enumerate(cfgs):
            pts = np.exp(2j * np.pi
                         * rng.integers(0, cfg.constellation_size, 64)
                         / cfg.constellation_size)
            eng.push(ch, np.repeat(pts, cfg.sps).astype(np.complex64))
        pk = eng.step_all_packets()
        for gi, pkts in pk.items():
            cfg = eng.groups[gi][0]
            assert pkts[PORT_SOFT].data.shape[0] == len(eng.groups[gi][1])
            assert pkts[PORT_SOFT].sri.xdelta == 1e-6 * cfg.sps
            assert pkts[PORT_BITS].sri.xdelta == (
                1e-6 * cfg.sps / cfg.bits_per_symbol)
            assert not pkts[PORT_SOFT].eos
    fin = eng.flush_all_packets()
    assert set(fin) == {0, 1}
    for pkts in fin.values():
        assert pkts[PORT_SOFT].eos
