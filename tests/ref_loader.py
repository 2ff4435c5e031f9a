"""Load the ACTUAL reference model classes from /root/reference for parity
tests, stubbing only the third-party packages absent from this image.

The stubs are faithful re-implementations of the tiny pieces the reference
uses (timm PatchEmbed/Mlp/DropPath, diffusers BaseOutput) — everything else
(the VMAE, LightningDiT, DiagonalGaussianDistribution, RoPE, RMSNorm,
SwiGLU) is the reference's own code executing under torch CPU.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import torch
import torch.nn as nn

REF_LDMAE = "/root/reference/LDMAE"
REF_VMAE = "/root/reference/VMAE"

# run the reference's @torch.compile decorators eagerly
os.environ.setdefault("TORCHDYNAMO_DISABLE", "1")


# ---------------------------------------------------------------------------
# Faithful timm stand-ins (timm 1.0 semantics for the pieces the reference
# instantiates: PatchEmbed conv proj + flatten/transpose; Mlp fc1/act/fc2;
# DropPath identity at p=0/eval)
# ---------------------------------------------------------------------------


class PatchEmbed(nn.Module):
    def __init__(
        self, img_size=224, patch_size=16, in_chans=3, embed_dim=768,
        norm_layer=None, flatten=True, bias=True,
    ):
        super().__init__()
        self.img_size = (img_size, img_size)
        self.patch_size = (patch_size, patch_size)
        self.grid_size = (img_size // patch_size, img_size // patch_size)
        self.num_patches = self.grid_size[0] * self.grid_size[1]
        self.flatten = flatten
        self.proj = nn.Conv2d(
            in_chans, embed_dim, kernel_size=patch_size, stride=patch_size, bias=bias
        )
        self.norm = norm_layer(embed_dim) if norm_layer else nn.Identity()

    def forward(self, x):
        x = self.proj(x)
        if self.flatten:
            x = x.flatten(2).transpose(1, 2)
        return self.norm(x)


class Mlp(nn.Module):
    def __init__(
        self, in_features, hidden_features=None, out_features=None,
        act_layer=nn.GELU, norm_layer=None, bias=True, drop=0.0, use_conv=False,
    ):
        super().__init__()
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        self.fc1 = nn.Linear(in_features, hidden_features, bias=bias)
        self.act = act_layer()
        self.drop1 = nn.Dropout(drop)
        self.norm = norm_layer(hidden_features) if norm_layer else nn.Identity()
        self.fc2 = nn.Linear(hidden_features, out_features, bias=bias)
        self.drop2 = nn.Dropout(drop)

    def forward(self, x):
        return self.drop2(self.fc2(self.norm(self.drop1(self.act(self.fc1(x))))))


class DropPath(nn.Module):
    def __init__(self, drop_prob=0.0, scale_by_keep=True):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1.0 - self.drop_prob
        mask = x.new_empty((x.shape[0],) + (1,) * (x.ndim - 1)).bernoulli_(keep)
        return x * mask / keep


class _BaseOutput:
    """diffusers.utils.BaseOutput stand-in: reference code only uses
    attribute access on its @dataclass subclasses."""


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _module_tree(dotted: str, leaf_attrs: dict) -> dict:
    """Build {name: module} entries for every level of a dotted path."""
    out = {}
    parts = dotted.split(".")
    for i in range(1, len(parts) + 1):
        name = ".".join(parts[:i])
        out[name] = _stub_module(name)
    for k, v in leaf_attrs.items():
        setattr(out[dotted], k, v)
    # link children as attributes
    for i in range(1, len(parts)):
        parent, child = ".".join(parts[:i]), ".".join(parts[: i + 1])
        setattr(out[parent], parts[i], out[child])
    return out


def _common_stubs() -> dict:
    stubs = {}
    stubs.update(
        _module_tree(
            "timm.models.vision_transformer",
            dict(PatchEmbed=PatchEmbed, Mlp=Mlp, DropPath=DropPath),
        )
    )
    # diffusers: BaseOutput used as a dataclass base; Config/ModelMixin unused
    du = _module_tree("diffusers.utils", dict(BaseOutput=_BaseOutput))
    du["diffusers"].BaseOutput = _BaseOutput
    du["diffusers"].ConfigMixin = object
    du["diffusers"].ModelMixin = object
    stubs.update(du)
    # torchvision: only referenced by transforms the tests never call
    tv = _module_tree("torchvision.transforms.functional", {})
    tv.update(_module_tree("torchvision.datasets", dict(ImageFolder=object)))
    tv["torchvision"].transforms = tv["torchvision.transforms"]
    tv["torchvision"].datasets = tv["torchvision.datasets"]
    # any transform name resolves to an inert, subclassable placeholder
    # (util/misc.py subclasses transforms.RandomResizedCrop at import time);
    # dunder lookups must still raise (inspect.getmodule probes __file__ etc.)
    def _tf_getattr(name):
        if name.startswith("__"):
            raise AttributeError(name)
        return type(name, (), {})

    tv["torchvision.transforms"].__getattr__ = _tf_getattr
    stubs.update(tv)
    # taming LPIPS: imported at module level, only constructed when a
    # perceptual loss is configured (the tests never do)
    stubs.update(_module_tree("taming.modules.losses.lpips", dict(LPIPS=object)))
    # fairscale (rmsnorm.py dead Llama code references these names)
    stubs.update(
        _module_tree("fairscale.nn.model_parallel.initialize", {})
    )
    fl = _module_tree(
        "fairscale.nn.model_parallel.layers",
        dict(ColumnParallelLinear=object, ParallelEmbedding=object, RowParallelLinear=object),
    )
    fl["fairscale.nn.model_parallel"].initialize = sys.modules.get(
        "fairscale.nn.model_parallel.initialize"
    ) or fl.get("fairscale.nn.model_parallel.initialize")
    stubs.update(fl)
    return stubs


def _load_with(path: str, name: str, stubs: dict, sys_path: list | None = None):
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    added = []
    for p in sys_path or []:
        if p not in sys.path:
            sys.path.insert(0, p)
            added.append(p)
    try:
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        for p in added:
            sys.path.remove(p)


_cache: dict = {}


def load_ref_vmae():
    """The reference VMAE/models_mae.py module (real code, stubbed deps)."""
    if "vmae" not in _cache:
        _cache["vmae"] = _load_with(
            f"{REF_VMAE}/models_mae.py",
            "ref_vmae_models_mae",
            _common_stubs(),
            sys_path=[REF_VMAE],
        )
    return _cache["vmae"]


def load_ref_transport():
    """The reference LDMAE/transport package (real code: __init__ +
    transport.py + path.py + utils.py), with torchdiffeq stubbed (only the
    ODE integrator class touches it; training_losses never does)."""
    if "transport" not in _cache:
        stubs = {
            "torchdiffeq": _stub_module("torchdiffeq", odeint=None),
        }
        saved = {k: sys.modules.get(k) for k in stubs}
        sys.modules.update(stubs)
        try:
            spec = importlib.util.spec_from_file_location(
                "ref_transport",
                f"{REF_LDMAE}/transport/__init__.py",
                submodule_search_locations=[f"{REF_LDMAE}/transport"],
            )
            mod = importlib.util.module_from_spec(spec)
            sys.modules["ref_transport"] = mod
            spec.loader.exec_module(mod)
            _cache["transport"] = mod
        finally:
            for k, v in saved.items():
                if v is None:
                    sys.modules.pop(k, None)
                else:
                    sys.modules[k] = v
    return _cache["transport"]


def load_ref_lightningdit():
    """The reference LDMAE/models/lightningdit.py module with its REAL
    sibling modules (pos_embed / rmsnorm / swiglu_ffn)."""
    if "dit" not in _cache:
        stubs = _common_stubs()
        pos_embed = _load_with(f"{REF_LDMAE}/models/pos_embed.py", "ref_pe_full", stubs)
        rmsnorm = _load_with(f"{REF_LDMAE}/models/rmsnorm.py", "ref_rms_full", stubs)
        swiglu = _load_with(f"{REF_LDMAE}/models/swiglu_ffn.py", "ref_swiglu_full", stubs)
        models_pkg = _stub_module("models")
        models_pkg.__path__ = []
        stubs.update(
            {
                "models": models_pkg,
                "models.pos_embed": pos_embed,
                "models.rmsnorm": rmsnorm,
                "models.swiglu_ffn": swiglu,
            }
        )
        _cache["dit"] = _load_with(
            f"{REF_LDMAE}/models/lightningdit.py", "ref_lightningdit_full", stubs
        )
    return _cache["dit"]
