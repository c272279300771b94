from dorknet_tpu.parallel.multihost import initialize, is_main_process, local_batch_slice
from dorknet_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    spatial_batch_sharding,
    replicated,
    model_parallel_param_shardings,
    fsdp_param_shardings,
    shard_network_params,
)

__all__ = [
    "initialize",
    "is_main_process",
    "local_batch_slice",
    "make_mesh",
    "batch_sharding",
    "spatial_batch_sharding",
    "replicated",
    "model_parallel_param_shardings",
    "fsdp_param_shardings",
    "shard_network_params",
]
