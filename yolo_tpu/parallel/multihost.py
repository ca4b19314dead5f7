"""Multi-host (multi-slice / DCN) setup helpers.

The reference's multi-node story is `torch.distributed.launch` + env-var
rank wiring + DistributedSampler (train.py:93-107, 267-280). The TPU-native
equivalent needs almost no user code: `jax.distributed.initialize()` wires
the hosts, the mesh spans all devices, and XLA routes the gradient psum
over ICI within a slice and DCN across slices. Data loading replaces
DistributedSampler with per-host shard slicing (`host_shard`).

Untestable on this single-host dev setup; the sharding math itself is
covered by the virtual-mesh tests (tests/test_parallel.py).
"""

from __future__ import annotations

import jax


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Initialise the JAX distributed runtime (call once, before any jax
    op, on every host). On Cloud TPU all arguments auto-detect from the
    metadata server; pass them explicitly elsewhere."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs['coordinator_address'] = coordinator_address
    if num_processes is not None:
        kwargs['num_processes'] = num_processes
    if process_id is not None:
        kwargs['process_id'] = process_id
    jax.distributed.initialize(**kwargs)


def host_shard(items, *, process_index: int | None = None,
               process_count: int | None = None):
    """Per-host slice of a dataset item list (replaces DistributedSampler:
    host i reads every process_count-th item starting at i, so each epoch
    partition is disjoint and near-equal)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return items[pi::pc]


def global_batch_from_host_batches(mesh, host_batch):
    """Assemble a globally-sharded array from this host's local batch
    (each host feeds its own shard; jax stitches the global view)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P('data'))
    return jax.make_array_from_process_local_data(sharding, host_batch)


def allgather_host_values(value):
    """Host-side all-gather: every process contributes its local numpy
    array (equal shapes required) and receives the stacked (pc, ...) result
    as numpy. Used to replicate per-host eval targets so each rank can
    compute the full statistics locally (reference rank-0 aggregation)."""
    from jax.experimental import multihost_utils
    import numpy as np
    return np.asarray(multihost_utils.process_allgather(np.asarray(value)))


def replicated_global(mesh, value):
    """Device-put an identical-on-every-host numpy value as a fully
    replicated global array on a (possibly multi-process) mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P()), value)
