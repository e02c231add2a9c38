from shineon_tpu.parallel.mesh import (  # noqa: F401
    data_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
