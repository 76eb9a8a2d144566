"""Mesh helpers for the (channel, time) device grid.

The reference's only "distribution" is CORBA object brokering between
processes (SURVEY.md section 2.5); here the two parallel axes of the domain
are first-class:

* ``chan``: independent demod chains -- embarrassingly parallel, DP-like,
  no communication.
* ``time``: one stream's time axis split across devices -- SP/CP-like; the
  sequential carries become halo exchanges + prefix combines at block seams
  (parallel/sharded.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(chan: int = 1, time: int = 1, devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    if chan * time > len(devices):
        raise ValueError(
            f"mesh {chan}x{time} needs {chan * time} devices, have {len(devices)}")
    devs = np.asarray(devices[: chan * time]).reshape(chan, time)
    return Mesh(devs, ("chan", "time"))


def channel_sharding(mesh: Mesh) -> NamedSharding:
    """(C, T) arrays sharded over channels only."""
    return NamedSharding(mesh, P("chan", None))


def chan_time_sharding(mesh: Mesh) -> NamedSharding:
    """(C, T) arrays sharded over both channels and time."""
    return NamedSharding(mesh, P("chan", "time"))
