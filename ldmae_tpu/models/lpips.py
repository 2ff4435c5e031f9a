"""LPIPS perceptual loss (VGG16) in JAX.

Re-implementation of /root/reference/LDMAE/models/lpips.py (taming-style):
ScalingLayer with the fixed shift/scale constants (lpips.py:102-114), VGG16
feature slices at relu{1_2, 2_2, 3_3, 4_3, 5_3}, per-slice channel-unit
normalisation, squared diff, learned 1×1 ``NetLinLayer`` projections (no
bias), spatial average, summed.

Weights: torchvision ``vgg16`` features state_dict (keys features.N.weight)
for the backbone and the taming ``vgg.pth`` (keys lin{k}.model.1.weight) for
the lin heads, both importable from local files (zero-egress environment —
the reference downloads them at runtime, lpips.py:10-44). Falls back to
deterministic random weights with a warning (loss still a valid perceptual-
style metric for smoke tests, NOT comparable to published numbers).
"""

from __future__ import annotations

import os
import warnings
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# conv layer indices in torchvision vgg16.features, grouped by slice
_VGG_SLICES = [
    [(0, 3, 64), (2, 64, 64)],
    [(5, 64, 128), (7, 128, 128)],
    [(10, 128, 256), (12, 256, 256), (14, 256, 256)],
    [(17, 256, 512), (19, 512, 512), (21, 512, 512)],
    [(24, 512, 512), (26, 512, 512), (28, 512, 512)],
]
_CHNS = [64, 128, 256, 512, 512]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv3(x, w, b):
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + b.reshape(1, -1, 1, 1)


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
        [(0, 0)] * 4,
    )


def vgg_slices(params: Params, x: jnp.ndarray) -> list:
    """x: (N,3,H,W) after ScalingLayer → the five relu feature maps."""
    feats = []
    h = x
    for si, convs in enumerate(_VGG_SLICES):
        if si > 0:
            h = _maxpool2(h)
        for li, _ in enumerate(convs):
            p = params["vgg"][f"s{si}_{li}"]
            h = jax.nn.relu(_conv3(h, p["w"], p["b"]))
        feats.append(h)
    return feats


def _normalize_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x**2, axis=1, keepdims=True))
    return x / (norm + eps)


def lpips(params: Params, img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
    """img0/img1: (N, 3, H, W) in [-1, 1] → (N, 1, 1, 1) LPIPS distance."""
    shift = jnp.asarray(_SHIFT).reshape(1, 3, 1, 1)
    scale = jnp.asarray(_SCALE).reshape(1, 3, 1, 1)
    f0 = vgg_slices(params, (img0 - shift) / scale)
    f1 = vgg_slices(params, (img1 - shift) / scale)
    val = 0.0
    for k in range(len(_CHNS)):
        d = (_normalize_tensor(f0[k]) - _normalize_tensor(f1[k])) ** 2
        lin_w = params["lins"][k]  # (1, C, 1, 1)
        proj = jnp.sum(d * lin_w.reshape(1, -1, 1, 1), axis=1, keepdims=True)
        val = val + jnp.mean(proj, axis=(2, 3), keepdims=True)
    return val


def make_lpips_fn(params: Params) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Perceptual-loss callable for the VMAE trainers: (imgs, recon) → (N,)."""

    def fn(imgs, recon):
        return lpips(params, imgs.astype(jnp.float32), recon.astype(jnp.float32)).reshape(-1)

    return fn


# ---------------------------------------------------------------------------
# Weight import
# ---------------------------------------------------------------------------


def import_lpips_weights(
    vgg_sd: Optional[Dict[str, np.ndarray]] = None,
    lin_sd: Optional[Dict[str, np.ndarray]] = None,
) -> Params:
    """vgg_sd: torchvision vgg16 state_dict (features.N.weight/bias);
    lin_sd: taming vgg.pth (lin{k}.model.1.weight)."""
    rng = np.random.default_rng(0)
    vgg: Params = {}
    for si, convs in enumerate(_VGG_SLICES):
        for li, (idx, cin, cout) in enumerate(convs):
            if vgg_sd is not None:
                w = np.asarray(vgg_sd[f"features.{idx}.weight"], np.float32)
                b = np.asarray(vgg_sd[f"features.{idx}.bias"], np.float32)
            else:
                w = (rng.standard_normal((cout, cin, 3, 3)) * np.sqrt(2.0 / (cin * 9))).astype(np.float32)
                b = np.zeros(cout, np.float32)
            vgg[f"s{si}_{li}"] = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    lins = []
    for k, c in enumerate(_CHNS):
        if lin_sd is not None:
            w = np.asarray(lin_sd[f"lin{k}.model.1.weight"], np.float32)
        else:
            w = np.abs(rng.standard_normal((1, c, 1, 1))).astype(np.float32) / c
        lins.append(jnp.asarray(w))
    return {"vgg": vgg, "lins": lins}


DEFAULT_VGG_PATHS = [
    "pretrain_weight/vgg16_features.pth",
    "pretrain_weight/vgg16-397923af.pth",
]
DEFAULT_LIN_PATHS = ["pretrain_weight/vgg.pth", "pretrain_weight/vgg_lpips.pth"]


def load_lpips_params(
    vgg_path: Optional[str] = None, lin_path: Optional[str] = None
) -> Params:
    def find(path, candidates):
        if path and os.path.exists(path):
            return path
        for c in candidates:
            if os.path.exists(c):
                return c
        return None

    vgg_path = find(vgg_path, DEFAULT_VGG_PATHS)
    lin_path = find(lin_path, DEFAULT_LIN_PATHS)
    vgg_sd = lin_sd = None
    if vgg_path or lin_path:
        import torch

        if vgg_path:
            vgg_sd = {
                k: v.numpy()
                for k, v in torch.load(vgg_path, map_location="cpu", weights_only=False).items()
            }
        if lin_path:
            lin_sd = {
                k: v.numpy()
                for k, v in torch.load(lin_path, map_location="cpu", weights_only=False).items()
            }
    if vgg_sd is None:
        warnings.warn(
            "VGG16 weights not found — LPIPS uses random features (smoke "
            "tests only). Place vgg16-397923af.pth + vgg.pth under "
            "pretrain_weight/."
        )
    return import_lpips_weights(vgg_sd, lin_sd)
