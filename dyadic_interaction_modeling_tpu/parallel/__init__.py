from .mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_sharding,
    init_distributed,
    is_master,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_sharding",
    "init_distributed",
    "is_master",
]
