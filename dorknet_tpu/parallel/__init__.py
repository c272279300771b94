from dorknet_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    model_parallel_param_shardings,
    shard_network_params,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "model_parallel_param_shardings",
    "shard_network_params",
]
