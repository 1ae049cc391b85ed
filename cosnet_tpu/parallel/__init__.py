from cosnet_tpu.parallel.mesh import (
    data_parallel_mesh,
    initialize_distributed,
    multi_host_mesh,
    replicate,
    shard_batch,
    shard_batch_2d,
)
