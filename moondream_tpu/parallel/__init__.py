from .inference import ShardedTextEngine, kv_cache_sharding  # noqa: F401
from .serving import make_sharded_serving_engine  # noqa: F401
from .pipeline import (  # noqa: F401
    make_pp_loss_and_grads,
    make_pp_train_step,
    shard_params_pp,
)
from .mesh import (  # noqa: F401
    batch_shardings,
    create_mesh,
    default_mesh_axes,
    param_shardings,
    shard_batch,
    shard_params,
    text_param_shardings,
)
