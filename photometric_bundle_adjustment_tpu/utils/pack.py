"""Pytree <-> per-dtype flat-buffer packing for low-latency dispatch.

Over the tunneled dev chip every jit argument is its own host->device
transfer, each paying per-request latency (~25 ms measured; multi-second
when a stall lands).  A BA solve's (problem, plan) pytree is ~20 arrays —
the transfers, not the solve, dominate the stage wall.  Packing the tree
into ONE flat buffer per dtype turns a solve into 2-3 uploads; unpacking
inside the jitted program is static slicing (free on device).

The spec returned by :func:`pack_tree` is hashable (treedef + dtype/shape
tuples) so it can ride a jit call as a static argument.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pack_tree(tree):
    """Flatten ``tree`` (numpy/jax leaves) into per-dtype 1-D numpy
    buffers.

    Returns ``(buffers: dict[str, np.ndarray], spec)`` where ``spec`` is a
    hashable description: ``(treedef, leaves)`` with ``leaves`` a tuple of
    ``(dtype_name, shape)`` in flatten order.  Use with
    :func:`unpack_tree` inside jit.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    order: dict = {}
    parts: dict = {}
    desc = []
    for leaf in leaves:
        a = np.asarray(leaf)
        key = a.dtype.name
        desc.append((key, a.shape))
        parts.setdefault(key, []).append(a.ravel())
        order[key] = True
    buffers = {k: (np.concatenate(v) if v else np.zeros(0))
               for k, v in parts.items()}
    return buffers, (treedef, tuple(desc))


def unpack_tree(buffers, spec):
    """Inverse of :func:`pack_tree` for use INSIDE a jitted function:
    ``buffers`` is a dict of 1-D arrays (device), ``spec`` the static
    description; returns the original pytree of device arrays (static
    slices + reshapes — no data movement)."""
    treedef, desc = spec
    offsets = {k: 0 for k in buffers}
    leaves = []
    for key, shape in desc:
        n = int(np.prod(shape)) if shape else 1
        off = offsets[key]
        leaves.append(buffers[key][off: off + n].reshape(shape))
        offsets[key] = off + n
    return jax.tree_util.tree_unflatten(treedef, leaves)
