from .mesh import (
    DATA_AXIS,
    DEFAULT_PARTITION_RULES,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    params_shardings,
    shard_batch,
    shard_params,
)
