"""Device->host transfer helpers.

The axon TPU PJRT plugin in this environment cannot transfer complex64
buffers to the host (UNIMPLEMENTED); real/int/bool buffers work.  These
helpers split complex leaves into float32 planes *on device*, transfer, and
recombine on the host, so engines and tools work identically on CPU and TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _is_plane_pair(x) -> bool:
    return isinstance(x, tuple) and len(x) == 2


def to_host(tree):
    """np.asarray for a pytree, safe for complex leaves on axon TPUs."""

    def split(leaf):
        if jnp.iscomplexobj(leaf):
            return (leaf.real, leaf.imag)
        return leaf

    def recombine(leaf):
        if _is_plane_pair(leaf):
            re = np.asarray(leaf[0], np.float32)
            im = np.asarray(leaf[1], np.float32)
            out = np.empty(re.shape, np.complex64)
            out.real = re
            out.imag = im
            return out
        return np.asarray(leaf)

    split_tree = jax.tree_util.tree_map(split, tree)
    return jax.tree_util.tree_map(recombine, split_tree, is_leaf=_is_plane_pair)
