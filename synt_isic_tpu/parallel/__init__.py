from .mesh import create_mesh, batch_sharding, replicated_sharding, shard_batch
from .sharded_sampler import ShardedSampler

__all__ = ["create_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch", "ShardedSampler"]
