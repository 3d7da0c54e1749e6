from .mesh import (batch_sharding, data_parallel_mesh, replicate,
                   replicated_sharding, shard_batch)

__all__ = ['batch_sharding', 'data_parallel_mesh', 'replicate',
           'replicated_sharding', 'shard_batch']
