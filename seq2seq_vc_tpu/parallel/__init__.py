from .mesh import (  # noqa: F401
    get_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
    is_coordinator,
)
