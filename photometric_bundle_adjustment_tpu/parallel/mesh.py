"""Device-mesh helpers for the distribution layer.

The reference has no distributed execution at all (SURVEY §2.3: TBB threads
only); this module IS the "communication backend" of the TPU build: a
1-D (or hosts x chips) ``jax.sharding.Mesh`` whose data axis shards the
landmark/observation dimension of BA problems, with XLA inserting the
ICI collectives (psum / reduce-scatter) for the reduced camera system.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
