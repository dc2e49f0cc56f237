from .mesh import (
    DATA_AXIS,
    batch_sharding,
    create_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
]
