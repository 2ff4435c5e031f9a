from .state import TrainState, init_train_state, save_checkpoint, restore_checkpoint, list_checkpoints
from .train_dit import make_optimizer, make_train_step, build_from_config, evaluate_step
from .torch_import import (
    load_torch_state_dict,
    import_dit_state_dict,
    import_dit_checkpoint,
    import_vmae_state_dict,
    import_vmae_checkpoint,
    warm_start_filter,
)

__all__ = [
    "TrainState",
    "init_train_state",
    "save_checkpoint",
    "restore_checkpoint",
    "list_checkpoints",
    "make_optimizer",
    "make_train_step",
    "build_from_config",
    "evaluate_step",
    "load_torch_state_dict",
    "import_dit_state_dict",
    "import_dit_checkpoint",
    "import_vmae_state_dict",
    "import_vmae_checkpoint",
    "warm_start_filter",
]
