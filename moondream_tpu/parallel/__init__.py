from .inference import ShardedTextEngine, kv_cache_sharding  # noqa: F401
from .mesh import (  # noqa: F401
    create_mesh,
    default_mesh_axes,
    param_shardings,
    shard_params,
    text_param_shardings,
)
