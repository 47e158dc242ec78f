from .mesh import (make_mesh, shard_batch, replicate, data_parallel_jit,
                   local_batch_slice, local_shard, init_multihost,
                   add_multihost_args, maybe_init_multihost)
