"""One-launch receive chain: demod -> frame sync -> Viterbi -> CRC.

The round-4 chain benchmark proved the full coded receive path composes
into a single jitted program with no host round trips (bench.py
run_chain); this module is that composition as a public, reusable API.
Everything is static-shaped, so the step jits, scans, vmaps, and runs
inside ``shard_map`` bodies unchanged -- the chan axis needs no
collectives because every post-demod stage is per-channel independent
(the multi-chip twin is ``eval/scaling.chain_scaling_report``).

Stages (each individually equivalence-gated elsewhere):

- flagship fused demod kernel (``models/full.demod_block_full``),
- time-major fixed-capacity frame sync (``ops/framesync.
  sync_extract_topk_tm`` -- consumes the kernel's native (S, C) planes
  with zero relayout),
- max-log PSK LLRs (``ops/fec.psk_llrs``),
- Mosaic Viterbi (``ops/pallas/viterbi_kernel.viterbi_decode_pallas`` --
  fused single-launch ACS+traceback at frame lengths),
- optional CRC check (``ops/crc.crc_bits``).

Reference anchor: the bits pipeline the chain feeds,
/root/reference/cpp/psk_soft.cpp:502-566, 605-615 (the reference emits
raw sliced bits and leaves sync/FEC/CRC to downstream REDHAWK
components; here they are one TPU program).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..config import DemodConfig
from ..ops.crc import CrcSpec, crc_bits
from ..ops.fec import ConvCode, info_bits_for, psk_llrs
from ..ops.framesync import FrameFormat, sync_extract_topk_tm
from ..ops.pallas.viterbi_kernel import viterbi_decode_pallas
from .full import demod_block_full


class ChainOutputs(NamedTuple):
    """Per-block decoded frames, fixed capacity k per channel.

    Rows where ``found`` is False are garbage (fixed-capacity contract of
    sync_extract_topk)."""

    msg: jnp.ndarray      # (C, k, n_msg) int8 decoded message bits
    ok: jnp.ndarray       # (C, k) bool CRC pass (all-True when no CRC)
    found: jnp.ndarray    # (C, k) bool frame detected
    pos: jnp.ndarray      # (C, k) int32 UW start (demod-output symbols)
    ang: jnp.ndarray      # (C, k) float32 raw UW correlation angle


def chain_msg_bits(fmt: FrameFormat, code: ConvCode,
                   crc: CrcSpec | None) -> int:
    """Message bits per frame after FEC (and CRC field, if any)."""
    nb = int(np.log2(fmt.m))
    n_info = info_bits_for(code, fmt.payload * nb)
    return n_info - (crc.degree if crc is not None else 0)


def chain_tail(soft_re, soft_im, fmt: FrameFormat, code: ConvCode,
               k_frames: int, crc: CrcSpec | None = None,
               labeling: str = "gray",
               interpret: bool | None = None) -> ChainOutputs:
    """Post-demod chain: (S, C) soft planes -> decoded frames.

    Jit-composable; pairs with any producer of time-major soft planes
    (demod_block_full / demod_block_full_rolling outputs feed it
    directly).
    """
    nb = int(np.log2(fmt.m))
    n_info = info_bits_for(code, fmt.payload * nb)
    n_msg = n_info - (crc.degree if crc is not None else 0)
    c_dim = soft_re.shape[1]
    pm, found, pos, ang = sync_extract_topk_tm(soft_re, soft_im, fmt,
                                               k_frames)
    n_rows = c_dim * k_frames
    llr = psk_llrs(fmt.m, pm.reshape(n_rows, fmt.payload),
                   labeling=labeling)
    bits = viterbi_decode_pallas(code, llr.reshape(n_rows,
                                                   fmt.payload * nb),
                                 interpret=interpret)
    msg = bits[:, :n_msg]
    if crc is not None:
        ok = jnp.all(crc_bits(crc, msg) == bits[:, n_msg:], axis=-1)
    else:
        ok = jnp.ones((n_rows,), bool)
    return ChainOutputs(msg.reshape(c_dim, k_frames, n_msg),
                        ok.reshape(c_dim, k_frames), found, pos, ang)


def make_chain_fn(cfg: DemodConfig, fmt: FrameFormat, code: ConvCode,
                  k_frames: int, crc: CrcSpec | None = None, *,
                  labeling: str = "gray", debug_ports: bool = False,
                  interpret: bool = False):
    """Build the one-launch chain step.

    Returns ``step(state, x_re, x_im) -> (state', ChainOutputs)`` where
    ``state`` is a converged ``FullState`` (models/full.full_from_ff) and
    ``x_re/x_im`` are (S*sps, C) time-major input planes.  Wrap in
    ``jax.jit`` (or a scan/shard_map) at the call site.
    """
    step_demod = functools.partial(demod_block_full, cfg,
                                   debug_ports=debug_ports,
                                   interpret=interpret)

    def step(state, x_re, x_im):
        st2, fo = step_demod(state, x_re, x_im)
        out = chain_tail(fo.soft_re, fo.soft_im, fmt, code, k_frames,
                         crc=crc, labeling=labeling, interpret=interpret)
        return st2, out

    return step
