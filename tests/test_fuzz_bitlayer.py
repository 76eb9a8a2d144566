"""Combinatorial loopback fuzz of the bit layer.

Every combination axis the TX/RX stacks share -- constellation order,
code/puncture, labeling, interleaving, scrambling, CRC -- through the
standalone frame path: tx.frame_stream -> FrameSyncer -> FecFrameDecoder
-> FrameDescrambler -> FrameCrcChecker must return the info bits exactly
under light noise.  Catches contract drift between the TX inverses and
the RX stages across the whole option space.
"""

import numpy as np
import pytest

from psk_soft_tpu.ops import tx
from psk_soft_tpu.ops.crc import CRC16_CCITT, CRC32_MPEG2
from psk_soft_tpu.ops.fec import (CODE_K7, PUNCTURE_2_3, PUNCTURE_3_4,
                                  CODE_K3, ConvCode, info_bits_for)
from psk_soft_tpu.ops.framesync import FrameFormat
from psk_soft_tpu.ops.scramble import prbs7, prbs15
from psk_soft_tpu.runtime.crc import FrameCrcChecker
from psk_soft_tpu.runtime.fec import FecFrameDecoder
from psk_soft_tpu.runtime.framesync import FrameSyncer
from psk_soft_tpu.runtime.scramble import FrameDescrambler

C23 = ConvCode(7, (0o171, 0o133), PUNCTURE_2_3)
C34 = ConvCode(7, (0o171, 0o133), PUNCTURE_3_4)

# (m, payload_symbols, code, interleave_rows, labeling, lfsr, crc)
CASES = [
    (4, 64, CODE_K7, None, "scd", None, None),
    (4, 64, CODE_K7, 8, "gray", prbs15(), CRC16_CCITT),
    (4, 64, CODE_K7, 16, "scd", prbs7(), CRC32_MPEG2),
    (2, 80, CODE_K3, None, "gray", prbs15(), None),
    (2, 128, CODE_K7, 32, "scd", None, CRC16_CCITT),
    (8, 64, CODE_K7, None, "gray", prbs15(), CRC16_CCITT),
    (8, 48, C34, 16, "scd", None, None),           # 144 bits, %4==0
    (4, 66, C23, 4, "gray", prbs7(), CRC16_CCITT),  # 132 bits, %3==0
    # Uncoded frames slice through the port slicers, so they are
    # SCD-labeled by construction (gray is a property of the coded path).
    (4, 60, None, None, "scd", prbs15(), CRC16_CCITT),
    (8, 40, None, None, "scd", None, CRC32_MPEG2),
]


@pytest.mark.parametrize("case", CASES,
                         ids=[f"m{m}-p{p}-{'u' if c is None else c.k}"
                              f"{'' if c is None or c.puncture is None else 'p'}"
                              f"-{lab}{'-il' if il else ''}"
                              f"{'-scr' if lf else ''}{'-crc' if cr else ''}"
                              for m, p, c, il, lab, lf, cr in CASES])
def test_bitlayer_loopback(case):
    m, payload, code, il_rows, labeling, lfsr, crc = case
    nb = int(np.log2(m))
    code_bits = payload * nb
    n_info = (info_bits_for(code, code_bits) if code is not None
              else code_bits)
    if crc is not None:
        n_info -= crc.degree
    assert n_info > 8, "case too small"
    rng = np.random.default_rng(hash(str(case)) % (1 << 32))
    fmt = FrameFormat(uw=tuple(rng.integers(0, m, 32)), payload=payload,
                      m=m, threshold=0.6)
    starts = [60, 60 + fmt.frame_len + 40, 60 + 2 * (fmt.frame_len + 40)]
    total = starts[-1] + fmt.frame_len + 60
    infos = [rng.integers(0, 2, n_info, np.int8) for _ in starts]
    idx = tx.frame_stream(fmt, infos, starts, total, code=code, lfsr=lfsr,
                          crc=crc, interleave_rows=il_rows,
                          labeling=labeling, seed=3)
    soft = tx.symbols_to_iq(m, idx).astype(np.complex64)
    # light noise + a constant rotation in the M-fold ambiguity class
    rot = np.exp(2j * np.pi * int(rng.integers(0, m)) / m)
    sigma = 0.02 if m == 8 else 0.05
    soft = (soft * rot
            + sigma * (rng.standard_normal(soft.size)
                       + 1j * rng.standard_normal(soft.size))
            ).astype(np.complex64)

    sync = FrameSyncer(1, fmt)
    top = sync
    if code is not None:
        top = FecFrameDecoder(top, code, interleave_rows=il_rows,
                              labeling=labeling)
    if lfsr is not None:
        top = FrameDescrambler(top, lfsr)
    if crc is not None:
        top = FrameCrcChecker(top, crc)
    # stream in uneven blocks
    for lo in (0, 171, 530):
        hi = {0: 171, 171: 530, 530: total}[lo]
        sync.observe(soft[None, lo:hi])
    sync.finalize()
    frames = top.pop_frames()
    assert len(frames) == len(starts), (len(frames), case)
    for f, info in zip(sorted(frames, key=lambda f: f.start), infos):
        got = f.info_bits if code is not None else f.bits
        if crc is not None:
            assert f.crc_ok is True
        assert np.array_equal(got, info), case
