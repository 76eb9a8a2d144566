"""Streaming demod engines: the service-loop equivalent.

The reference's ``serviceFunction`` (C4, ``cpp/psk_soft.cpp:346-618``) is a
blocking packet loop: getPacket -> flush/mode/reset checks -> property
snapshot -> SRI propagation -> hot loop -> four pushPackets.  Here the same
contract is a host-side engine around the jitted block step:

* :class:`StreamEngine` -- one stream, full reference semantics
  (flush -> reset, real-mode rejection, live reconfigure with resync rules,
  EOS propagation, SRI rate rescaling, accurate per-port timestamps).
* :class:`BatchEngine` -- C aligned streams (e.g. channelizer outputs)
  demodulated as one batched device step; same per-packet semantics applied
  group-wide.

Device blocks are fixed-size (``block_symbols``) so one compiled program
serves the steady state; the sub-block remainder waits in a host staging
buffer (the reference's deques keep partial symbols across packets the same
way, via ``index``).  On EOS the remaining whole symbols are processed as one
final (recompiled once) block and the tail < sps samples are dropped, like
the reference's never-completed last window.

This module is the stable import surface; the implementation lives in one
module per engine family (round-4 split of the former monolith):
``engine_stream`` (StreamEngine/StreamRegistry + metrics/pipeline dispatch),
``engine_bank`` (TMOutputs/BankAssembler/pipelined packet layer),
``engine_batch``, ``engine_full``, ``engine_mixed``, ``engine_group``.
"""

from .engine_stream import (EngineMetrics, _PipelineOps, StreamEngine,
                            StreamRegistry, logger, reconfigure_ff)
from .engine_bank import (BankAssembler, TMOutputs, _PipelinedPackets,
                          _merge_packet_dicts)
from .engine_batch import BatchEngine
from .engine_full import FullKernelBatchEngine
from .engine_mixed import MixedKernelBatchEngine
from .engine_group import GroupEngine
from .chain_engine import ChainEngine

__all__ = [
    "EngineMetrics", "StreamEngine", "StreamRegistry", "reconfigure_ff",
    "BankAssembler", "TMOutputs", "BatchEngine", "FullKernelBatchEngine",
    "MixedKernelBatchEngine", "GroupEngine", "ChainEngine", "logger",
]
