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
    "create_mesh",
    "batch_spec",
    "shard_batch",
    "replicated",
    "shard_params",
    "param_shardings",
    "dit_param_spec",
    "AXES",
]
