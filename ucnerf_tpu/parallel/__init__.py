from ucnerf_tpu.parallel.mesh import (
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    shard_local_batch,
    process_slice,
    fetch_to_host,
)
