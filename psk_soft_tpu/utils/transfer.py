"""Host<->device transfer helpers.

The axon TPU PJRT plugin in this environment cannot transfer complex64
buffers to the host (UNIMPLEMENTED), and a complex64 host->device *upload*
poisons the session: every subsequent device->host transfer of any dtype
fails.  These helpers keep complex data off the wire in both directions --
float32 planes cross, complex is (re)combined on the destination -- so
engines and tools work identically on CPU and TPU.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _combine(re, im):
    return jax.lax.complex(re, im)


def complex_zeros(shape) -> jnp.ndarray:
    """complex64 zeros without an eager complex constant (eager
    ``jnp.zeros(..., complex64)`` uploads a complex scalar, which poisons
    the axon session -- see module docstring)."""
    z = jnp.zeros(shape, jnp.float32)
    return _combine(z, z)


def complex_ones(shape) -> jnp.ndarray:
    """complex64 ones (1+0j), axon-safe like :func:`complex_zeros`."""
    return _combine(jnp.ones(shape, jnp.float32),
                    jnp.zeros(shape, jnp.float32))


def to_device(x):
    """jnp.asarray that never uploads complex buffers (axon-safe)."""
    x = np.asarray(x)
    if np.iscomplexobj(x):
        # ascontiguousarray promotes 0-d to 1-d; reshape restores.
        re = np.ascontiguousarray(x.real, np.float32).reshape(x.shape)
        im = np.ascontiguousarray(x.imag, np.float32).reshape(x.shape)
        return _combine(jnp.asarray(re), jnp.asarray(im))
    return jnp.asarray(x)


class _PlanePair:
    """Sentinel wrapper marking a (real, imag) plane split (a plain tuple
    would collide with legitimate 2-tuples in user pytrees)."""

    __slots__ = ("re", "im")

    def __init__(self, re, im):
        self.re = re
        self.im = im


def _is_plane_pair(x) -> bool:
    return isinstance(x, _PlanePair)


def to_host(tree):
    """np.asarray for a pytree, safe for complex leaves on axon TPUs."""

    def split(leaf):
        if jnp.iscomplexobj(leaf):
            return _PlanePair(leaf.real, leaf.imag)
        return leaf

    def recombine(leaf):
        if _is_plane_pair(leaf):
            re = np.asarray(leaf.re, np.float32)
            im = np.asarray(leaf.im, np.float32)
            out = np.empty(re.shape, np.complex64)
            out.real = re
            out.imag = im
            return out
        return np.asarray(leaf)

    split_tree = jax.tree_util.tree_map(split, tree)
    return jax.tree_util.tree_map(recombine, split_tree, is_leaf=_is_plane_pair)
