from .mesh import (make_mesh, shard_batch, replicate, batch_sharding,  # noqa: F401
                   replicated_sharding, state_shardings, shard_state,
                   spatial_sharding, shard_spatial)
from .multihost import (init_multihost, host_shard,  # noqa: F401
                        global_batch_from_host_batches,
                        allgather_host_values, replicated_global)
