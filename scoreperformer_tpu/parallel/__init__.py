from .mesh import (
    DATA_AXIS,
    DEFAULT_PARTITION_RULES,
    MODEL_AXIS,
    batch_sharding,
    host_local_to_global_batch,
    make_mesh,
    maybe_distributed_initialize,
    opt_state_shardings,
    params_shardings,
    shard_batch,
    shard_opt_state,
    shard_params,
)
