"""Device-mesh helpers.

The reference's distributed layer is NCCL process groups + mp.spawn +
rank-0 asymmetry + pad_scatter/pad_gather of emitter rays (SURVEY.md §2.2).
Here the whole framework is ONE jitted SPMD program over a
jax.sharding.Mesh: the emitter query is a sharding constraint on the flat
ray axis; XLA inserts the all-gather/reduce-scatter over ICI. Nothing else
to build — these helpers just standardize mesh/axis names.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"  # shards rays / pixels / spp


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = (DATA_AXIS,)
) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devs).reshape(shape), axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_leading_axis(tree, mesh: Mesh):
    """Place every array with leading axis divisible by the mesh size on the
    data axis; replicate the rest."""
    n = mesh.shape[DATA_AXIS]

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] > 0:
            return jax.device_put(x, data_sharded(mesh, x.ndim))
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(place, tree)
