"""Checkpoint / resume for demod carry state.

The reference has no checkpointing: its state lives in in-memory deques and a
restart re-converges only after the numAvg*sps warm-up
(cpp/psk_soft.cpp:377,457; SURVEY.md section 5).  Here the entire demod state
is an explicit pytree, so checkpoint = serialize the leaves; resume = pass
them back in -- restart-from-block is exact, not a re-convergence.

Format: ``.npz`` with float32 planes for complex leaves (the axon TPU cannot
transfer complex64; utils.transfer handles the split) plus a JSON header
recording the state class and the DemodConfig.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np
import jax.numpy as jnp

from ..config import DemodConfig
from ..utils.transfer import to_device, to_host

_STATE_REGISTRY = {}


def _registry():
    if not _STATE_REGISTRY:
        from ..state import DemodState
        from ..models.blockpsk import FFState, SymbolBackendState
        from ..models.fused import FusedState
        from ..models.full import FullState
        from ..ops.equalizer import EqState
        from ..ops.fec import ViterbiStreamState
        for cls in (DemodState, FFState, SymbolBackendState, FusedState,
                    FullState, EqState, ViterbiStreamState):
            _STATE_REGISTRY[cls.__name__] = cls
    return _STATE_REGISTRY


def save_state(path: str, state, cfg: DemodConfig, extra: dict | None = None):
    """Serialize a carry state + its config to ``path`` (.npz)."""
    host = to_host(state)
    arrays = {}
    complex_fields = []
    for name, leaf in zip(type(state)._fields, host):
        if np.iscomplexobj(leaf):
            arrays[f"{name}__re"] = np.asarray(leaf.real, np.float32)
            arrays[f"{name}__im"] = np.asarray(leaf.imag, np.float32)
            complex_fields.append(name)
        else:
            arrays[name] = np.asarray(leaf)
    header = {
        "state_class": type(state).__name__,
        "fields": list(type(state)._fields),
        "complex_fields": complex_fields,
        "config": dataclasses.asdict(cfg),
        "extra": extra or {},
    }
    arrays["__header__"] = np.frombuffer(
        json.dumps(header).encode(), np.uint8)
    np.savez(path, **arrays)


def load_state(path: str):
    """Returns (state, DemodConfig, extra)."""
    with np.load(path) as z:
        header = json.loads(bytes(z["__header__"]).decode())
        cls = _registry()[header["state_class"]]
        leaves = []
        for name in header["fields"]:
            if name in header["complex_fields"]:
                re = z[f"{name}__re"]
                im = z[f"{name}__im"]
                out = np.empty(re.shape, np.complex64)
                out.real = re
                out.imag = im
                leaves.append(to_device(out))
            else:
                leaves.append(jnp.asarray(z[name]))
    cfg = DemodConfig(**header["config"])
    return cls(*leaves), cfg, header["extra"]
