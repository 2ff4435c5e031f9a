from .distributed import (
    init_distributed_mode,
    get_rank,
    get_world_size,
    is_main_process,
    barrier,
)
from .mesh import (
    create_mesh,
    batch_spec,
    shard_batch,
    replicated,
    shard_params,
    param_shardings,
    dit_param_spec,
    AXES,
)

__all__ = [
    "init_distributed_mode",
    "get_rank",
    "get_world_size",
    "is_main_process",
    "barrier",
    "create_mesh",
    "batch_spec",
    "shard_batch",
    "replicated",
    "shard_params",
    "param_shardings",
    "dit_param_spec",
    "AXES",
]
