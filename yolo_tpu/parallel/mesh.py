"""SPMD parallelism over a jax.sharding.Mesh.

The reference's distributed story is DDP over NCCL with implicit gradient
all-reduce (train.py:93-107, 218-223). The TPU-native equivalent: a device
mesh with a ``data`` axis (and a ``model`` axis reserved for spatial/channel
sharding of large convs), batches sharded over ``data``, params replicated,
and XLA emitting the psum over ICI during the jitted backward pass — there is
no user-level collective code.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
feed each host its local shard (replaces DistributedSampler).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def make_mesh(devices=None, model_parallel: int = 1) -> Mesh:
    """Build a (data, model) mesh over all devices (model=1 -> pure DP)."""
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device-put host arrays with batch sharded over the data axis."""
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Replicate a pytree across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
