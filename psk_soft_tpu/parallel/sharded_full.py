"""Multi-chip flagship: the fully-fused kernel sharded over channels.

The channel axis is communication-free (SURVEY.md section 2.5), so scaling
the single-kernel pipeline (models/full.py) across a mesh is a pure
``shard_map``: each device runs the Mosaic kernel on its channel slice and
carries its own state planes.  This is the production configuration for
BASELINE.json config 5's channel dimension; time-axis sharding composes with
it via parallel/sharded.py (the jnp pipeline) until the seam machinery is
folded into the kernel.

Expected scaling: linear in devices (no collectives on the data path), so
the >=85%% 1-chip -> N-host efficiency target reduces to per-host ingest
bandwidth.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DemodConfig
from ..models.full import FullOutputs, FullState, demod_block_full


def channel_sharding_tm(mesh: Mesh) -> NamedSharding:
    """Time-major planes (T, C): channels on the last axis, sharded."""
    return NamedSharding(mesh, P(None, "chan"))


def shard_full_state(state: FullState, mesh: Mesh) -> FullState:
    sh = channel_sharding_tm(mesh)
    return FullState(
        win_re=jax.device_put(state.win_re, sh),
        win_im=jax.device_put(state.win_im, sh),
        planes=jax.device_put(state.planes, sh),
    )


def make_sharded_full_demod(cfg: DemodConfig, mesh: Mesh, *,
                            s_tile: int = 256, interpret: bool = False):
    """Returns fn(state, x_re, x_im) -> (state, FullOutputs), with every
    (.., C) plane sharded over the mesh's 'chan' axis.  C per device must be
    a multiple of 128."""
    body = functools.partial(demod_block_full, cfg, s_tile=s_tile,
                             interpret=interpret)
    spec = P(None, "chan")
    state_specs = FullState(win_re=spec, win_im=spec, planes=spec)
    inner = jax.shard_map(
        body, mesh=mesh,
        in_specs=(state_specs, spec, spec),
        out_specs=(state_specs, FullOutputs(spec, spec, spec, spec, spec)),
        check_vma=False,
    )
    return jax.jit(inner)
