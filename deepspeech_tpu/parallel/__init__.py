from deepspeech_tpu.parallel.mesh import (
    batch_sharding,
    local_batch_to_global,
    metrics_to_local,
    make_mesh,
    make_param_shardings,
    param_spec,
    replicated,
    shard_batch,
    shard_params,
)

__all__ = [
    "batch_sharding", "local_batch_to_global", "make_mesh",
    "metrics_to_local",
    "make_param_shardings", "param_spec", "replicated", "shard_batch",
    "shard_params",
]
