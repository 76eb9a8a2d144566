"""Interleaving + Gray labeling for the coded path.

Two measured effects drive these options (eval/coded.py docstring):
Gray labeling puts coded M-PSK ON the soft-decision union bound, and
block interleaving rescues frames from symbol bursts that destroy the
un-interleaved decode.
"""

import numpy as np
import pytest

from psk_soft_tpu.eval.coded import measure_coded_ber, union_bound
from psk_soft_tpu.ops import slicers, tx
from psk_soft_tpu.ops.fec import CODE_K7, info_bits_for
from psk_soft_tpu.ops.framesync import FrameFormat
from psk_soft_tpu.ops.interleave import deinterleave, interleave
from psk_soft_tpu.runtime.fec import FecFrameDecoder
from psk_soft_tpu.runtime.framesync import FrameSyncer


def test_interleave_roundtrip_and_validation():
    rng = np.random.default_rng(101)
    x = rng.integers(0, 100, (3, 120))
    for rows in (1, 2, 8, 120):
        got = np.asarray(deinterleave(interleave(x, rows), rows))
        assert np.array_equal(got, x)
    # write-rows / read-columns definition
    flat = np.arange(6)
    assert np.asarray(interleave(flat, 2)).tolist() == [0, 3, 1, 4, 2, 5]
    with pytest.raises(ValueError):
        interleave(x, 7)                        # 120 % 7 != 0
    with pytest.raises(ValueError):
        interleave(x, 0)


def test_gray_labels_properties():
    for m in (4, 8, 16, 32):
        lab = slicers.bit_labels(m, "gray")
        # adjacent constellation points differ in exactly one bit
        d = np.abs(lab - np.roll(lab, -1, axis=0)).sum(axis=1)
        assert (d == 1).all()
    with pytest.raises(ValueError):
        slicers.bit_labels(4, "natural")
    # bits_to_symbols inverts the gray labeling too
    rng = np.random.default_rng(102)
    bits = rng.integers(0, 2, 60, np.int8)
    idx = tx.bits_to_symbols(8, bits, "gray")
    lab = slicers.bit_labels(8, "gray")
    assert np.array_equal(lab[idx].reshape(-1), bits)


def test_gray_labeling_reaches_union_bound():
    """Coded QPSK with Gray labels tracks the union bound; the SCD
    quadrant labeling at the same SNR is an order of magnitude worse."""
    kw = dict(num_bits=120_000, seed=7)
    scd = measure_coded_ber(CODE_K7, 4, esn0_db=3.0, **kw)
    gray = measure_coded_ber(CODE_K7, 4, esn0_db=3.0, labeling="gray",
                             **kw)
    bound = float(union_bound(CODE_K7, 3.0))
    assert gray.ber <= 2.0 * bound + 5.0 / gray.n_bits, (gray.ber, bound)
    assert scd.ber > 10 * gray.ber, (scd.ber, gray.ber)


def test_interleaving_rescues_symbol_burst():
    """An 8-symbol burst (16 consecutive code bits) destroys the plain
    decode; block-interleaved (rows=16) the same burst lands as isolated
    single errors 8 trellis steps apart and is absorbed."""
    rng = np.random.default_rng(103)
    fmt = FrameFormat(uw=tuple(rng.integers(0, 4, 32)), payload=64, m=4,
                      threshold=0.7)
    n_info = info_bits_for(CODE_K7, fmt.payload * 2)
    info = rng.integers(0, 2, n_info, np.int8)

    def run(rows):
        idx = tx.frame_stream(fmt, [info], [50], 300, code=CODE_K7,
                              interleave_rows=rows, seed=9)
        soft = tx.symbols_to_iq(4, idx).astype(np.complex64)
        # burst: 8 payload symbols replaced by random points
        b0 = 50 + fmt.uw_len + 20
        soft[b0:b0 + 8] = tx.symbols_to_iq(
            4, rng.integers(0, 4, 8)) * np.exp(1j * 0.4)
        sync = FrameSyncer(1, fmt)
        dec = FecFrameDecoder(sync, CODE_K7, interleave_rows=rows)
        sync.observe(soft[None])
        sync.finalize()
        (f,) = dec.pop_frames()
        return int(np.sum(f.info_bits != info))

    assert run(16) == 0                      # interleaved: burst absorbed
    assert run(None) > 0                     # plain: decoder overwhelmed


def test_frame_roundtrip_gray():
    rng = np.random.default_rng(104)
    fmt = FrameFormat(uw=tuple(rng.integers(0, 4, 32)), payload=64, m=4,
                      threshold=0.7)
    n_info = info_bits_for(CODE_K7, fmt.payload * 2)
    infos = [rng.integers(0, 2, n_info, np.int8) for _ in range(2)]
    idx = tx.frame_stream(fmt, infos, [40, 400], 700, code=CODE_K7,
                          labeling="gray", seed=11)
    soft = tx.symbols_to_iq(4, idx).astype(np.complex64)
    noisy = soft + 0.15 * (rng.standard_normal(soft.shape)
                           + 1j * rng.standard_normal(soft.shape))
    sync = FrameSyncer(1, fmt)
    dec = FecFrameDecoder(sync, CODE_K7, labeling="gray")
    sync.observe(noisy[None].astype(np.complex64))
    sync.finalize()
    frames = dec.pop_frames()
    assert len(frames) == 2
    for f, info in zip(frames, infos):
        assert np.array_equal(f.info_bits, info)
