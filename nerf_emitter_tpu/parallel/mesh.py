"""Device-mesh helpers + multi-host (DCN) initialization.

The reference's distributed layer is NCCL process groups + mp.spawn +
rank-0 asymmetry + pad_scatter/pad_gather of emitter rays (SURVEY.md §2.2),
launched one-process-per-GPU across machines with a TCP rendezvous
(reference scripts/train.py:140-153). Here the whole framework is ONE
jitted SPMD program over a jax.sharding.Mesh: the emitter query is a
sharding constraint on the flat ray axis; XLA inserts the
all-gather/reduce-scatter over ICI (intra-host/slice) and DCN (across
hosts). Multi-host runs launch the SAME command on every host with the
coordinator env set (`maybe_initialize_distributed`); after that,
jax.devices() is the global device list and the mesh spans all hosts —
no other code changes anywhere in the framework.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"  # shards rays / pixels / spp

_DISTRIBUTED_INITIALIZED = False


def maybe_initialize_distributed() -> bool:
    """Multi-host wiring (the reference's dist.init_process_group(nccl),
    train.py:140-146): when the coordinator env is present, join the
    jax.distributed service so jax.devices() becomes the global list and
    collectives ride ICI within a host/slice and DCN across.

    Env (same names on every host):
      NERF_EMITTER_COORDINATOR   host:port of process 0
      NERF_EMITTER_NUM_PROCESSES world size
      NERF_EMITTER_PROCESS_ID    this process's rank
    On TPU pods the three can be auto-detected by jax.distributed (GCE
    metadata); then setting just NERF_EMITTER_COORDINATOR="auto" works.
    Returns True if distributed mode is active. Idempotent."""
    global _DISTRIBUTED_INITIALIZED
    if _DISTRIBUTED_INITIALIZED:
        return True
    coord = os.environ.get("NERF_EMITTER_COORDINATOR")
    if not coord:
        return False
    kwargs = {}
    if coord != "auto":
        kwargs = dict(
            coordinator_address=coord,
            num_processes=int(os.environ["NERF_EMITTER_NUM_PROCESSES"]),
            process_id=int(os.environ["NERF_EMITTER_PROCESS_ID"]),
        )
    jax.distributed.initialize(**kwargs)
    _DISTRIBUTED_INITIALIZED = True
    return True


def is_main_process() -> bool:
    """The reference's comms.is_main_process (utils/comms.py:24-80): host-
    side artifacts (checkpoints, logs, renders) are written once."""
    return jax.process_index() == 0


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
    data axis; replicate the rest. Works on a multi-host mesh: every
    process passes the SAME full host array (each host loads the whole
    dataset) and receives the global sharded jax.Array."""
    n = mesh.shape[DATA_AXIS]
    multihost = jax.process_count() > 1

    def put(x, sharding):
        if not multihost:
            return jax.device_put(x, sharding)
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] > 0:
            return put(x, data_sharded(mesh, x.ndim))
        return put(x, replicated(mesh))

    return jax.tree.map(place, tree)
