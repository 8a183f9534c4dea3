from .mesh import (  # noqa: F401
    get_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
    is_coordinator,
)
from .tp import (  # noqa: F401
    shard_params,
    to_named_shardings,
    tp_param_specs,
)
