"""CRC layer (ops/crc.py): GF(2)-matmul CRC vs the serial definition."""

import numpy as np
import pytest

from psk_soft_tpu.ops.crc import (CRC16_CCITT, CRC32_MPEG2, CrcSpec,
                                  append_crc, check_crc, crc_bits,
                                  crc_preset, crc_serial)


def bytes_to_bits(data: bytes) -> np.ndarray:
    """MSB-first bit expansion (the serial CRC byte convention)."""
    a = np.frombuffer(data, np.uint8)
    return ((a[:, None] >> np.arange(7, -1, -1)) & 1).reshape(-1).astype(
        np.int8)


def test_known_check_values():
    bits = bytes_to_bits(b"123456789")
    assert crc_serial(CRC16_CCITT, bits) == 0x29B1     # CRC-16/CCITT-FALSE
    assert crc_serial(CRC32_MPEG2, bits) == 0x0376E6E7  # CRC-32/MPEG-2


@pytest.mark.parametrize("spec", [CRC16_CCITT, CRC32_MPEG2,
                                  CrcSpec(8, 0x07),
                                  CrcSpec(5, 0x15, init=0x1F, xorout=0x0A)])
@pytest.mark.parametrize("length", [1, 7, 64, 200])
def test_matmul_matches_serial(spec, length):
    rng = np.random.default_rng(71)
    bits = rng.integers(0, 2, length, np.int8)
    got = np.asarray(crc_bits(spec, bits))
    want_int = crc_serial(spec, bits)
    want = [(want_int >> (spec.degree - 1 - i)) & 1
            for i in range(spec.degree)]
    assert got.tolist() == want


def test_append_check_roundtrip_and_detection():
    rng = np.random.default_rng(72)
    msgs = rng.integers(0, 2, (8, 120), np.int8)
    framed = append_crc(CRC16_CCITT, msgs)
    assert framed.shape == (8, 136)
    back, ok = check_crc(CRC16_CCITT, framed)
    assert ok.all() and np.array_equal(back, msgs)
    # Any single corrupted bit is detected in that row only.
    bad = framed.copy()
    bad[2, 50] ^= 1
    bad[5, 130] ^= 1                   # corruption inside the CRC field
    _, ok = check_crc(CRC16_CCITT, bad)
    assert ok.tolist() == [True, True, False, True, True, False, True, True]


def test_presets_and_validation():
    assert crc_preset("crc16") is CRC16_CCITT
    assert crc_preset("crc32") is CRC32_MPEG2
    with pytest.raises(ValueError):
        crc_preset("crc8")
    with pytest.raises(ValueError):
        CrcSpec(16, 0x10000)           # poly out of range
    with pytest.raises(ValueError):
        CrcSpec(16, 0x1020)            # missing x^0 term
    with pytest.raises(ValueError):
        check_crc(CRC16_CCITT, np.zeros(16, np.int8))   # no message room
    with pytest.raises(ValueError):
        crc_bits(CRC16_CCITT, np.zeros(0, np.int8))
