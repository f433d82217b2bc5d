from .mesh import (make_mesh, shard_batch, shard_cache_rows, replicate,  # noqa: F401
                   data_sharding)
from .distributed import (init_distributed, process_count, process_index,  # noqa: F401
                          local_batch_indices, global_batch_from_local,
                          process_allgather, process_allgather_ragged,
                          host_local_rows, local_n_real, global_mesh,
                          gather_pyobj)
