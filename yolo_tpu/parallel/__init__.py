from .mesh import (make_mesh, shard_batch, replicate, batch_sharding,  # noqa: F401
                   replicated_sharding, state_shardings, shard_state)
