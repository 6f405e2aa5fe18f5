from deepspeech_tpu.parallel.mesh import (
    batch_sharding,
    stacked_batch_sharding,
    equalize_batch_padding,
    local_batch_to_global,
    metrics_to_local,
    make_mesh,
    make_param_shardings,
    make_state_shardings,
    param_spec,
    replicated,
    shard_batch,
    shard_params,
    shard_state,
)

__all__ = [
    "batch_sharding", "stacked_batch_sharding", "equalize_batch_padding", "local_batch_to_global", "make_mesh",
    "metrics_to_local",
    "make_param_shardings", "make_state_shardings", "param_spec",
    "replicated", "shard_batch", "shard_params", "shard_state",
]
