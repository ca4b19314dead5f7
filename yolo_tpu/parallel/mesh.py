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


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Image-HEIGHT sharding over the data axis — spatial partitioning.

    Beyond the reference (whose only scale-out is DDP batch splitting):
    for low-batch serving, splitting the batch cannot use more chips than
    images, but sharding H lets every chip work on slices of the SAME
    image — GSPMD inserts the conv halo exchanges (and boundary
    collectives for maxpool/upsample/space-to-depth) over ICI
    automatically. Output equals single-device inference to f32 reduction
    noise (tests/test_parallel.py::test_spatial_partitioned_infer).
    H must divide by the data-axis size x the deepest stride.
    """
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_spatial(mesh: Mesh, *arrays):
    """Device-put NHWC image batches with H sharded over the data axis."""
    sh = spatial_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


# ---------------------------------------------------------------------------
# tensor parallelism: conv output channels sharded over the model axis
# ---------------------------------------------------------------------------
# The reference has no TP (SURVEY.md §2.6 — DDP only). This goes beyond
# parity the TPU-native way: annotate weight shardings, let GSPMD propagate
# channel sharding through the graph and insert the ICI collectives. Only
# plain (groups == 1) convs whose filter count divides the model-axis size
# are sharded (HWIO O-dim + the matching BN/bias vectors); depthwise, SE,
# YOLO-head convs (na*(nc+5) channels) and everything else stays replicated.

_TP_VECTOR_FIELDS = ('gamma', 'beta', 'b', 'mean', 'var')


def _tp_spec(net, tp: int, layer_idx: int, fld: str, shape) -> P:
    if layer_idx >= len(net.layers):
        return P()
    lyr = net.layers[layer_idx]
    if lyr.kind != 'conv' or lyr.groups != 1 or lyr.filters % tp:
        return P()
    if fld == 'w' and len(shape) == 4 and shape[-1] == lyr.filters:
        return P(None, None, None, MODEL_AXIS)
    if fld in _TP_VECTOR_FIELDS and tuple(shape) == (lyr.filters,):
        return P(MODEL_AXIS)
    return P()


def state_shardings(mesh: Mesh, net, tree):
    """NamedSharding pytree for any params-shaped state (params, BN state,
    optimizer velocity/moments, EMA, grad accumulators).

    Works by path pattern: a dict key that is a layer index ('12') followed
    by a field key ('w'/'gamma'/...) anywhere in the path marks a per-layer
    parameter leaf; everything else is replicated.
    """
    tp = mesh.shape[MODEL_AXIS]

    def spec(path, leaf):
        keys = [k.key for k in path if isinstance(k, jax.tree_util.DictKey)]
        p = P()
        if tp > 1:
            for a, b in zip(keys, keys[1:]):
                if isinstance(a, str) and a.isdigit() and isinstance(b, str):
                    p = _tp_spec(net, tp, int(a), b, leaf.shape)
                    break
        return NamedSharding(mesh, p)

    return jax.tree_util.tree_map_with_path(spec, tree)


def shard_state(mesh: Mesh, net, tree):
    """Device-put a train-state pytree with TP shardings (pure DP when the
    mesh has model=1 — then this equals replicate())."""
    shardings = state_shardings(mesh, net, tree)
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
