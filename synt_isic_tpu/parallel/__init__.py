from .mesh import create_mesh, batch_sharding, replicated_sharding, shard_batch
from .sharded_sampler import ShardedSampler
from .multihost import (initialize as initialize_multihost, is_multihost,
                        hybrid_mesh, local_batch_bounds, global_batch_array,
                        broadcast_from_host0, sync_hosts, host0_only)

__all__ = ["create_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "ShardedSampler", "initialize_multihost",
           "is_multihost", "hybrid_mesh", "local_batch_bounds",
           "global_batch_array", "broadcast_from_host0", "sync_hosts",
           "host0_only"]
