from .mesh import (  # noqa: F401
    create_mesh,
    data_sharding,
    param_shardings,
    replicated,
    shard_batch,
    shard_params,
    stacked_data_sharding,
)
