from nrse_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    byol_param_shardings,
    param_partition_spec,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "byol_param_shardings",
    "param_partition_spec",
    "shard_batch",
]
