"""Polyphase DFT channelizer: oracle parity, tone routing, streaming
invariance, and wideband -> channelize -> demod-bank integration.

The oracle is the direct per-channel DDC the bank replaces: downconvert by
exp(-2j pi m l / C), FIR with the same prototype, decimate by C -- computed
literally in numpy below (see ops/channelizer.py docstring identity).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from psk_soft_tpu import DemodConfig
from psk_soft_tpu.ops.channelizer import (channel_frequencies,
                                          channelize_block,
                                          channelizer_init, prototype_taps)


def _oracle(taps, xx, C):
    """y[t, m] = sum_l h[l] * xx[t*C + l] * e^{-2j pi m l / C}."""
    L = taps.size
    B = (xx.size - (L - C)) // C
    l = np.arange(L)
    y = np.empty((B, C), np.complex64)
    for m in range(C):
        w = taps * np.exp(-2j * np.pi * m * l / C)
        for t in range(B):
            y[t, m] = np.dot(w, xx[t * C: t * C + L])
    return y


def test_matches_direct_ddc_oracle():
    C, K, B = 8, 6, 40
    taps = prototype_taps(C, K)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(B * C)
         + 1j * rng.standard_normal(B * C)).astype(np.complex64)
    carry, y = channelize_block(jnp.asarray(taps), channelizer_init(C, K),
                                jnp.asarray(x))
    xx = np.concatenate([np.zeros((K - 1) * C, np.complex64), x])
    np.testing.assert_allclose(np.asarray(y), _oracle(taps, xx, C),
                               atol=2e-5)
    # carry holds the last K-1 branch rows
    np.testing.assert_array_equal(np.asarray(carry).ravel(),
                                  x[-(K - 1) * C:])


@pytest.mark.parametrize("m", [0, 1, 5, 12, 15])
def test_tone_routes_to_its_bin(m):
    """A tone at channel m's center comes out of bin m at amplitude ~1 and
    is rejected everywhere else (prototype stopband)."""
    C, K, B = 16, 8, 64
    taps = prototype_taps(C, K)
    n = np.arange(B * C)
    x = np.exp(2j * np.pi * m * n / C).astype(np.complex64)
    _, y = channelize_block(jnp.asarray(taps), channelizer_init(C, K),
                            jnp.asarray(x))
    y = np.asarray(y)[K:]                       # past the bank's fill-in
    assert np.abs(np.abs(y[:, m]) - 1.0).max() < 1e-3
    others = np.delete(np.abs(y), m, axis=1)
    assert others.max() < 1e-3


def test_half_channel_offset_lands_between_bins():
    """A tone halfway between channel centers splits between the two
    adjacent bins at the prototype's edge gain -- i.e. frequency mapping is
    continuous, not off-by-one."""
    C, K, B = 8, 8, 64
    taps = prototype_taps(C, K)
    n = np.arange(B * C)
    x = np.exp(2j * np.pi * 2.5 * n / C).astype(np.complex64)
    _, y = channelize_block(jnp.asarray(taps), channelizer_init(C, K),
                            jnp.asarray(x))
    mag = np.abs(np.asarray(y)[K:]).mean(axis=0)
    top2 = set(np.argsort(mag)[-2:])
    assert top2 == {2, 3}


def test_streaming_equals_oneshot():
    C, K = 8, 6
    taps = jnp.asarray(prototype_taps(C, K))
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(200 * C)
         + 1j * rng.standard_normal(200 * C)).astype(np.complex64)
    _, ref = channelize_block(taps, channelizer_init(C, K), jnp.asarray(x))
    carry = channelizer_init(C, K)
    parts = []
    i = 0
    for nrows in (1, 7, 64, 3, 125):            # 200 rows total
        carry, y = channelize_block(taps, carry,
                                    jnp.asarray(x[i: i + nrows * C]))
        parts.append(np.asarray(y))
        i += nrows * C
    np.testing.assert_allclose(np.concatenate(parts), np.asarray(ref),
                               atol=1e-6)


def test_channel_frequencies():
    f = channel_frequencies(8, xdelta=1e-6)     # fs = 1 MHz
    assert f[0] == 0.0
    assert f[1] == pytest.approx(125e3)
    assert f[7] == pytest.approx(-125e3)
    assert f[4] == pytest.approx(500e3)         # Nyquist bin stays positive


def test_wideband_to_demod_bank():
    """End-to-end: C QPSK transmitters at distinct channel centers, summed
    into one wideband stream -> channelizer -> BatchEngine bank -> every
    channel locks and its soft decisions sit on the constellation."""
    from psk_soft_tpu.runtime.engine import BatchEngine
    from psk_soft_tpu.runtime.streams import PORT_SOFT, SRI
    from psk_soft_tpu.testing.signals import sinc_interp

    C, K, sps, S = 8, 8, 8, 260
    cfg = DemodConfig(sps=sps, num_avg=50, constellation_size=4,
                      phase_avg=20)
    rng = np.random.default_rng(3)
    n_rows = S * sps                            # channel-rate samples
    wide = np.zeros(n_rows * C, np.complex64)
    n = np.arange(n_rows * C)
    for m in range(C):
        pts = np.exp(2j * np.pi * rng.integers(0, 4, S) / 4)
        bb = np.repeat(pts, sps).astype(np.complex64)
        # band-limited upsample x C, then shift to channel m's center
        up = sinc_interp(bb, np.arange(n_rows * C) / C)
        wide += (up * np.exp(2j * np.pi * m * n / C)).astype(np.complex64)

    taps = jnp.asarray(prototype_taps(C, K))
    _, y = channelize_block(taps, channelizer_init(C, K),
                            jnp.asarray(wide))
    y = np.asarray(y)                           # (n_rows, C)

    eng = BatchEngine(cfg, C, block_symbols=64)
    eng.set_input_sri(SRI(stream_id="wb", xdelta=1.0))
    eng.push_block(np.ascontiguousarray(y.T))
    softs = []
    while True:
        pkts = eng.step_packets()
        if pkts is None:
            break
        if pkts:
            softs.append(pkts[PORT_SOFT].data)
    soft = np.concatenate(softs, axis=-1)
    assert soft.shape[0] == C and soft.shape[1] >= 100
    # every channel's soft decisions on the QPSK constellation (global
    # phase ambiguity folded out by the modulo)
    ang = np.angle(soft[:, 5:] * np.exp(-1j * np.pi / 4)) % (np.pi / 2)
    err = np.minimum(ang, np.pi / 2 - ang)
    assert np.percentile(err, 99) < 0.1


def test_frontend_planes_match_block():
    """ChannelizerFrontEnd.step_planes (device, time-major -- the fused
    kernel's input) and step_block (host, channel-major -- BatchEngine's
    input) carry the same samples."""
    from psk_soft_tpu.runtime.channelizer import ChannelizerFrontEnd

    C, K = 8, 6
    rng = np.random.default_rng(5)
    x = (rng.standard_normal(100 * C)
         + 1j * rng.standard_normal(100 * C)).astype(np.complex64)
    fe_p = ChannelizerFrontEnd(C, taps_per_branch=K)
    fe_b = ChannelizerFrontEnd(C, taps_per_branch=K)
    fe_p.push(x)
    fe_b.push(x)
    re, im = fe_p.step_planes(64)
    blk = fe_b.step_block(64)
    np.testing.assert_allclose(
        np.asarray(re).T + 1j * np.asarray(im).T, blk, atol=0)
    assert fe_p.available_rows() == fe_b.available_rows() == 36
    # drain returns the remaining 36 rows, then nothing
    assert fe_b.drain(planes=False).shape == (C, 36)
    assert fe_b.drain(planes=False) is None
    # reset clears history: a fresh identical push reproduces block 1
    fe_b.reset()
    fe_b.push(x)
    np.testing.assert_array_equal(fe_b.step_block(64), blk)


def test_frontend_feeds_full_kernel_engine():
    """Device-resident filterbank planes flow straight into the flagship
    FullKernelBatchEngine (interpret-mode kernel) and every band locks --
    the production wideband path end to end."""
    from psk_soft_tpu.runtime.channelizer import ChannelizerFrontEnd
    from psk_soft_tpu.runtime.engine import FullKernelBatchEngine
    from psk_soft_tpu.runtime.streams import PORT_SOFT, SRI
    from psk_soft_tpu.testing.signals import sinc_interp

    C, K, sps, S = 128, 8, 8, 200
    cfg = DemodConfig(sps=sps, num_avg=50, constellation_size=4,
                      phase_avg=20)
    rng = np.random.default_rng(9)
    n_rows = S * sps
    n = np.arange(n_rows * C, dtype=np.float64)
    wide = np.zeros(n_rows * C, np.complex64)
    occupied = [0, 3, 40, 64, 100, 127]       # sparse: synthesis is O(rows*C)
    for m in occupied:
        pts = np.exp(2j * np.pi * rng.integers(0, 4, S) / 4)
        up = sinc_interp(np.repeat(pts, sps).astype(np.complex64),
                         np.arange(n_rows * C) / C)
        wide += (up * np.exp(2j * np.pi * m * n / C)).astype(np.complex64)

    fe = ChannelizerFrontEnd(C, taps_per_branch=K)
    eng = FullKernelBatchEngine(cfg, C, block_symbols=64, s_tile=64,
                                interpret=True)
    eng.set_input_sri(SRI(stream_id="wb", xdelta=1.0))
    fe.push(wide)
    softs = []
    while True:
        r = fe.step_planes(64 * sps)
        if r is None:
            break
        eng.push_planes(*r)
        pkts = eng.step_packets()
        if pkts:
            softs.append(pkts[PORT_SOFT].data)
    pkts = eng.flush_packets()
    if pkts and pkts[PORT_SOFT].data.size:
        softs.append(pkts[PORT_SOFT].data)
    soft = np.concatenate(softs, axis=-1)
    assert soft.shape[0] == C and soft.shape[1] >= 100
    ang = np.angle(soft[occupied, 5:] * np.exp(-1j * np.pi / 4)) % (np.pi / 2)
    err = np.minimum(ang, np.pi / 2 - ang)
    assert np.percentile(err, 99) < 0.1


@pytest.mark.parametrize("n_time", [2, 4, 8])
def test_sharded_channelize_seam_invariance(n_time):
    """Row-sharding the filterbank over the mesh's time axis (K-1-row halo
    ppermute) reproduces the unsharded one-shot bit-for-bit at every seam."""
    from psk_soft_tpu.parallel.mesh import make_mesh
    from psk_soft_tpu.parallel.wideband import make_sharded_channelize

    C, K, B = 16, 6, 64 * n_time
    taps = prototype_taps(C, K)
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(B * C)
         + 1j * rng.standard_normal(B * C)).astype(np.complex64)
    _, ref = channelize_block(jnp.asarray(taps), channelizer_init(C, K),
                              jnp.asarray(x))
    mesh = make_mesh(chan=1, time=n_time)
    run = make_sharded_channelize(jnp.asarray(taps), C, mesh)
    y = run(jnp.asarray(x).reshape(B, C))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


# ---------------------------------------------------------------- 2x bank

def _oracle_os2(taps, xx, C):
    """y[t, m] = sum_l h[l] xx[t*C/2 + l] e^{-2j pi m (t*C/2 + l)/C}."""
    L, R = taps.size, C // 2
    B = (xx.size - (L - R)) // R
    l = np.arange(L)
    y = np.empty((B, C), np.complex64)
    for m in range(C):
        w = taps * np.exp(-2j * np.pi * m * l / C)
        for t in range(B):
            y[t, m] = np.dot(w, xx[t * R: t * R + L]) \
                * np.exp(-1j * np.pi * m * t)
    return y


def test_os2_matches_direct_ddc_oracle():
    from psk_soft_tpu.ops.channelizer import (channelize_block_os2,
                                              channelizer_os2_init)
    C, K, Bin = 8, 6, 40
    taps = prototype_taps(C, K)
    rng = np.random.default_rng(4)
    x = (rng.standard_normal(Bin * C)
         + 1j * rng.standard_normal(Bin * C)).astype(np.complex64)
    carry, y = channelize_block_os2(jnp.asarray(taps),
                                    channelizer_os2_init(C, K),
                                    jnp.asarray(x))
    xx = np.concatenate([np.zeros((2 * K - 1) * (C // 2), np.complex64), x])
    np.testing.assert_allclose(np.asarray(y), _oracle_os2(taps, xx, C),
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(carry).ravel(),
                                  x[-(2 * K - 1) * (C // 2):])


def test_os2_tone_flat_and_full_band():
    """At 2x oversampling a tone at the channel CENTER is flat (the odd-row
    twiddle is exact, no +-1 wobble), and a tone at 0.35/C past center --
    beyond the critical bank's output Nyquist -- appears in-channel as a
    clean complex exponential at the right frequency."""
    from psk_soft_tpu.ops.channelizer import (channelize_block_os2,
                                              channelizer_os2_init)
    C, K, Bin = 16, 8, 128
    taps = prototype_taps(C, K)
    n = np.arange(Bin * C)
    m = 3
    x = np.exp(2j * np.pi * m * n / C).astype(np.complex64)
    _, y = channelize_block_os2(jnp.asarray(taps),
                                channelizer_os2_init(C, K), jnp.asarray(x))
    y = np.asarray(y)[4 * K:]
    assert np.abs(y[:, m] - y[0, m]).max() < 1e-3      # flat, not wobbling
    assert np.abs(np.abs(y[:, m]) - 1.0).max() < 1e-3

    df = 0.35 / C                                       # past fs/(2C)
    x = np.exp(2j * np.pi * (m / C + df) * n).astype(np.complex64)
    _, y = channelize_block_os2(jnp.asarray(taps),
                                channelizer_os2_init(C, K), jnp.asarray(x))
    y = np.asarray(y)[4 * K:]
    # output rate is 2fs/C -> expected per-row phase step 2 pi df C/2
    step = np.angle(y[1:, m] / y[:-1, m])
    assert np.abs(step - 2 * np.pi * df * C / 2).max() < 1e-2
    assert np.abs(y[:, m]).min() > 0.5                  # band survived


def test_os2_streaming_equals_oneshot():
    from psk_soft_tpu.ops.channelizer import (channelize_block_os2,
                                              channelizer_os2_init)
    C, K = 8, 6
    taps = jnp.asarray(prototype_taps(C, K))
    rng = np.random.default_rng(6)
    x = (rng.standard_normal(200 * C)
         + 1j * rng.standard_normal(200 * C)).astype(np.complex64)
    _, ref = channelize_block_os2(taps, channelizer_os2_init(C, K),
                                  jnp.asarray(x))
    carry = channelizer_os2_init(C, K)
    parts = []
    i = 0
    for nin in (1, 7, 64, 3, 125):                      # input rows of C
        carry, y = channelize_block_os2(taps, carry,
                                        jnp.asarray(x[i: i + nin * C]))
        parts.append(np.asarray(y))
        i += nin * C
    np.testing.assert_allclose(np.concatenate(parts), np.asarray(ref),
                               atol=1e-6)


def test_os2_frontend_wideband_to_demod():
    """Oversampled-by-2 frontend plumbing: the same 8-transmitter wideband
    capture as the critical test comes out at TWICE the channel rate
    (QPSK at 8 samples/baud at the channel rate -> sps=16 at the bank
    output) and every band demodulates to the same quality."""
    from psk_soft_tpu.runtime.channelizer import ChannelizerFrontEnd
    from psk_soft_tpu.runtime.engine import BatchEngine
    from psk_soft_tpu.runtime.streams import PORT_SOFT, SRI
    from psk_soft_tpu.testing.signals import sinc_interp

    C, K, sps, S = 8, 8, 8, 260
    rng = np.random.default_rng(3)
    n_rows = S * sps
    n = np.arange(n_rows * C)
    wide = np.zeros(n_rows * C, np.complex64)
    for m in range(C):
        pts = np.exp(2j * np.pi * rng.integers(0, 4, S) / 4)
        up = sinc_interp(np.repeat(pts, sps).astype(np.complex64),
                         np.arange(n_rows * C) / C)
        wide += (up * np.exp(2j * np.pi * m * n / C)).astype(np.complex64)

    # decimating the 2x stream by 2 reproduces the critical stream
    # BIT-FOR-BIT: the os2 zero-carry is one R-row longer, so it is the
    # odd os2 rows -- with their (-1)^m twiddle folded out -- that read
    # the critical rows' exact samples through the same FMA chain
    from psk_soft_tpu.ops.channelizer import (channelize_block_os2,
                                              channelizer_os2_init)
    _, y2 = channelize_block_os2(jnp.asarray(prototype_taps(C, K)),
                                 channelizer_os2_init(C, K),
                                 jnp.asarray(wide))
    _, y1 = channelize_block(jnp.asarray(prototype_taps(C, K)),
                             channelizer_init(C, K), jnp.asarray(wide))
    alt = np.where(np.arange(C) % 2 == 1, -1.0, 1.0).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(y2)[1::2] * alt,
                                  np.asarray(y1))

    fe = ChannelizerFrontEnd(C, taps_per_branch=K, oversample=2)
    assert fe.available_rows() == 0
    fe.push(wide)
    assert fe.available_rows() == 2 * n_rows    # doubled output rate
    cfg = DemodConfig(sps=2 * sps, num_avg=50, constellation_size=4,
                      phase_avg=20)
    eng = BatchEngine(cfg, C, block_symbols=64)
    eng.set_input_sri(SRI(stream_id="os2", xdelta=1.0))
    softs = []
    while True:
        blk = fe.step_block(64 * 2 * sps)
        if blk is None:
            break
        eng.push_block(blk)
        while True:
            pkts = eng.step_packets()
            if pkts is None:
                break
            if pkts:
                softs.append(pkts[PORT_SOFT].data)
    soft = np.concatenate(softs, axis=-1)
    assert soft.shape[1] >= 100
    ang = np.angle(soft[:, 5:] * np.exp(-1j * np.pi / 4)) % (np.pi / 2)
    err = np.minimum(ang, np.pi / 2 - ang)
    # every band locked (the finer sps=16 grid sits closer to the flat-top
    # argmax near-ties than sps=8 does -- see PARITY.md on tie
    # sensitivity -- so the tolerance is wider than the critical test's)
    assert np.percentile(err, 99) < 0.2
    assert np.percentile(err, 50) < 0.06
