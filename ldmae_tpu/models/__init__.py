from . import lightningdit, vmae
from .lightningdit import DiTSpec, DiTConsts, dit_spec, init_dit_params, dit_forward, list_models
from .vmae import VMAESpec, VMAEConsts, vmae_spec, init_vmae_params, list_archs

__all__ = [
    "lightningdit",
    "vmae",
    "DiTSpec",
    "DiTConsts",
    "dit_spec",
    "init_dit_params",
    "dit_forward",
    "list_models",
    "VMAESpec",
    "VMAEConsts",
    "vmae_spec",
    "init_vmae_params",
    "list_archs",
]
