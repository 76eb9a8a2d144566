"""Multi-host launch: the process-deployment layer.

The reference deploys as a CORBA executable per host, brokered by the
REDHAWK domain manager (cpp/main.cpp:24-29; omniORB is control-plane only,
SURVEY.md section 5).  TPU-native equivalent: every host runs the same
program, ``jax.distributed.initialize`` forms the global device mesh, and
the data plane is XLA collectives over ICI/DCN (parallel/sharded.py).

Typical use on an N-host slice:

    from psk_soft_tpu.parallel import launch
    launch.initialize()                      # env-driven (TPU pods: no args)
    mesh = launch.global_mesh(time=launch.num_hosts())
    run = make_sharded_demod(cfg, mesh, total_symbols)

Lay the *time* axis across hosts only when streams are long enough that the
seam halo (numAvg*sps samples) amortizes over DCN; the channel axis is
communication-free and is the default host axis.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
from jax.sharding import Mesh

from .mesh import make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env fallbacks; no-op if single host
    and no coordinator is configured."""
    coordinator_address = coordinator_address or os.environ.get(
        "PSK_COORDINATOR")
    if num_processes is None and "PSK_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["PSK_NUM_PROCESSES"])
    if process_id is None and "PSK_PROCESS_ID" in os.environ:
        process_id = int(os.environ["PSK_PROCESS_ID"])
    if coordinator_address is None and num_processes in (None, 1):
        return  # single-process; TPU pods auto-configure via the TPU env
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def num_hosts() -> int:
    return jax.process_count()


def global_mesh(chan: Optional[int] = None, time: int = 1) -> Mesh:
    """Build a (chan, time) mesh over all global devices.

    Defaults to all devices on the channel axis (communication-free).
    """
    n = len(jax.devices())
    if chan is None:
        if n % time:
            raise ValueError(f"{n} devices not divisible by time={time}")
        chan = n // time
    return make_mesh(chan=chan, time=time, devices=jax.devices())
