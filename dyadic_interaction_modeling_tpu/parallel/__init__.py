from .plan import MeshPlan
from .mesh import (
    make_mesh,
    shard_batch,
    replicate,
    tp_param_spec,
    tp_param_shardings,
    fsdp_param_spec,
    fsdp_param_shardings,
    data_sharding,
    init_distributed,
    is_master,
)

__all__ = [
    "MeshPlan",
    "make_mesh",
    "shard_batch",
    "replicate",
    "tp_param_spec",
    "tp_param_shardings",
    "fsdp_param_spec",
    "fsdp_param_shardings",
    "data_sharding",
    "init_distributed",
    "is_master",
]
