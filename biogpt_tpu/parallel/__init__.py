from .mesh import make_mesh, DATA_AXIS, MODEL_AXIS  # noqa: F401
from .sharding import (  # noqa: F401
    param_pspecs,
    cache_pspec,
    shard_params,
    shard_cache,
    named_sharding_tree,
)
