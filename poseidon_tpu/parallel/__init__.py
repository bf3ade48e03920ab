from .host import (
    broadcast_object,
    initialize_distributed,
    is_primary,
    process_count,
    process_index,
    sync_hosts,
)
from .mesh import (
    batch_sharding,
    make_mesh,
    param_partition_spec,
    params_shardings,
    replicated,
    shard_batch,
)

__all__ = [
    "broadcast_object", "initialize_distributed", "is_primary",
    "process_count", "process_index", "sync_hosts",
    "batch_sharding", "make_mesh", "param_partition_spec",
    "params_shardings", "replicated", "shard_batch",
]
