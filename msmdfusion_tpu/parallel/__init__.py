from .distributed import (collect_results, global_mesh, init_dist,
                          local_batch_slice, merge_sharded_results,
                          shard_indices)
from .mesh import (batch_sharding, data_parallel_mesh, replicate,
                   replicated_sharding, shard_batch)

__all__ = ['batch_sharding', 'collect_results', 'data_parallel_mesh',
           'global_mesh', 'init_dist', 'local_batch_slice',
           'merge_sharded_results', 'replicate', 'replicated_sharding',
           'shard_batch', 'shard_indices']
