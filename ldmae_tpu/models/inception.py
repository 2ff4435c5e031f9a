"""InceptionV3 (FID variant) in JAX.

Re-implementation of the pytorch-fid InceptionV3 used by the reference
(/root/reference/LDMAE/tools/calculate_fid.py:64-392): torchvision's
inception_v3(num_classes=1008, aux_logits=False) with the FID patches —
``count_include_pad=False`` average pooling inside the Inception A/C/E
blocks and a max-pool branch in the final E block (FIDInceptionE_2).

Weights: the canonical pt_inception-2015-12-05 checkpoint (a plain torch
state_dict with torchvision names) is imported via
``import_inception_torch_state_dict`` — BatchNorms are folded into
scale/shift at import (inference-only). Without a weights file the model
runs with deterministic random weights (shape/pipeline testing only; FID
values then are NOT comparable).

Preprocessing matches the wrapper (calculate_fid.py:178-209): bilinear
resize to 299 (antialias=False, like F.interpolate), then x*2-1.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# (name, (out_ch, in_ch, kh, kw), stride, padding)
_STEM = [
    ("Conv2d_1a_3x3", (32, 3, 3, 3), 2, (0, 0)),
    ("Conv2d_2a_3x3", (32, 32, 3, 3), 1, (0, 0)),
    ("Conv2d_2b_3x3", (64, 32, 3, 3), 1, (1, 1)),
    ("maxpool1", None, None, None),
    ("Conv2d_3b_1x1", (80, 64, 1, 1), 1, (0, 0)),
    ("Conv2d_4a_3x3", (192, 80, 3, 3), 1, (0, 0)),
    ("maxpool2", None, None, None),
]


def _conv(x, p, stride=1, padding=(0, 0)):
    if isinstance(padding, int):
        padding = (padding, padding)
    out = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    # folded batchnorm: scale/shift per channel
    return out * p["scale"].reshape(1, -1, 1, 1) + p["shift"].reshape(1, -1, 1, 1)


def _basic_conv(x, p, stride=1, padding=(0, 0)):
    return jax.nn.relu(_conv(x, p, stride, padding))


def _max_pool(x, window=3, stride=2, padding=0):
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, 1, window, window),
        (1, 1, stride, stride),
        [(0, 0), (0, 0), (padding, padding), (padding, padding)],
    )


def _avg_pool_no_pad_count(x, window=3, stride=1, padding=1):
    """avg_pool2d(count_include_pad=False) — the FID patch."""
    sums = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        (1, 1, window, window), (1, 1, stride, stride),
        [(0, 0), (0, 0), (padding, padding), (padding, padding)],
    )
    ones = jnp.ones((1, 1) + x.shape[2:], x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add,
        (1, 1, window, window), (1, 1, stride, stride),
        [(0, 0), (0, 0), (padding, padding), (padding, padding)],
    )
    return sums / counts


def _adaptive_avg_pool_1(x):
    return jnp.mean(x, axis=(2, 3))


# ---------------------------------------------------------------------------
# Inception blocks (torchvision structure, FID pooling)
# ---------------------------------------------------------------------------


def _inception_a(x, p):
    b1 = _basic_conv(x, p["branch1x1"])
    b5 = _basic_conv(x, p["branch5x5_1"])
    b5 = _basic_conv(b5, p["branch5x5_2"], padding=2)
    b3 = _basic_conv(x, p["branch3x3dbl_1"])
    b3 = _basic_conv(b3, p["branch3x3dbl_2"], padding=1)
    b3 = _basic_conv(b3, p["branch3x3dbl_3"], padding=1)
    bp = _avg_pool_no_pad_count(x)
    bp = _basic_conv(bp, p["branch_pool"])
    return jnp.concatenate([b1, b5, b3, bp], axis=1)


def _inception_b(x, p):
    b3 = _basic_conv(x, p["branch3x3"], stride=2)
    bd = _basic_conv(x, p["branch3x3dbl_1"])
    bd = _basic_conv(bd, p["branch3x3dbl_2"], padding=1)
    bd = _basic_conv(bd, p["branch3x3dbl_3"], stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=1)


def _inception_c(x, p):
    b1 = _basic_conv(x, p["branch1x1"])
    b7 = _basic_conv(x, p["branch7x7_1"])
    b7 = _basic_conv(b7, p["branch7x7_2"], padding=(0, 3))
    b7 = _basic_conv(b7, p["branch7x7_3"], padding=(3, 0))
    bd = _basic_conv(x, p["branch7x7dbl_1"])
    bd = _basic_conv(bd, p["branch7x7dbl_2"], padding=(3, 0))
    bd = _basic_conv(bd, p["branch7x7dbl_3"], padding=(0, 3))
    bd = _basic_conv(bd, p["branch7x7dbl_4"], padding=(3, 0))
    bd = _basic_conv(bd, p["branch7x7dbl_5"], padding=(0, 3))
    bp = _avg_pool_no_pad_count(x)
    bp = _basic_conv(bp, p["branch_pool"])
    return jnp.concatenate([b1, b7, bd, bp], axis=1)


def _inception_d(x, p):
    b3 = _basic_conv(x, p["branch3x3_1"])
    b3 = _basic_conv(b3, p["branch3x3_2"], stride=2)
    b7 = _basic_conv(x, p["branch7x7x3_1"])
    b7 = _basic_conv(b7, p["branch7x7x3_2"], padding=(0, 3))
    b7 = _basic_conv(b7, p["branch7x7x3_3"], padding=(3, 0))
    b7 = _basic_conv(b7, p["branch7x7x3_4"], stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=1)


def _inception_e(x, p, pool: str):
    b1 = _basic_conv(x, p["branch1x1"])
    b3 = _basic_conv(x, p["branch3x3_1"])
    b3 = jnp.concatenate(
        [
            _basic_conv(b3, p["branch3x3_2a"], padding=(0, 1)),
            _basic_conv(b3, p["branch3x3_2b"], padding=(1, 0)),
        ],
        axis=1,
    )
    bd = _basic_conv(x, p["branch3x3dbl_1"])
    bd = _basic_conv(bd, p["branch3x3dbl_2"], padding=1)
    bd = jnp.concatenate(
        [
            _basic_conv(bd, p["branch3x3dbl_3a"], padding=(0, 1)),
            _basic_conv(bd, p["branch3x3dbl_3b"], padding=(1, 0)),
        ],
        axis=1,
    )
    if pool == "max":  # FIDInceptionE_2 (calculate_fid.py:361-392)
        bp = _max_pool(x, window=3, stride=1, padding=1)
    else:  # FIDInceptionE_1
        bp = _avg_pool_no_pad_count(x)
    bp = _basic_conv(bp, p["branch_pool"])
    return jnp.concatenate([b1, b3, bd, bp], axis=1)


_MIXED = [
    ("Mixed_5b", _inception_a),
    ("Mixed_5c", _inception_a),
    ("Mixed_5d", _inception_a),
    ("Mixed_6a", _inception_b),
    ("Mixed_6b", _inception_c),
    ("Mixed_6c", _inception_c),
    ("Mixed_6d", _inception_c),
    ("Mixed_6e", _inception_c),
    ("Mixed_7a", _inception_d),
    ("Mixed_7b", partial(_inception_e, pool="avg")),
    ("Mixed_7c", partial(_inception_e, pool="max")),
]


def inception_forward(
    params: Params,
    x: jnp.ndarray,
    *,
    resize_input: bool = True,
    normalize_input: bool = True,
    return_spatial: bool = False,
    spatial_tap: str = "mixed_6_conv",
) -> jnp.ndarray:
    """x: (N, H, W, 3) float32 in [0, 1] → (N, 2048) pool features.

    With ``return_spatial`` also returns the sFID spatial features at
    ``spatial_tap``. The default ``"mixed_6_conv"`` is the EXACT node the ADM
    evaluator taps — the TF1 graph's `mixed_6/conv:0`
    (reference tools/evaluator.py:24,610-614): TF 17×17 blocks mixed_4..7 map
    to torchvision Mixed_6b..6e, and the `conv` branch is the post-relu 1×1
    branch, i.e. Mixed_6d.branch1x1, (N, 192, 17, 17). Because both graphs
    concatenate that branch FIRST, it equals the first 192 channels of the
    Mixed_6d block output (torch-anchored in test_inception_golden.py), so
    the ADM recipe spatial[..., :7] is reproduced exactly. Any Mixed_* block
    name is also accepted (block-boundary taps, for tap studies —
    EVAL_NOTES.md).
    """
    x = jnp.transpose(x, (0, 3, 1, 2))  # NCHW
    if resize_input:
        x = jax.image.resize(
            x, (x.shape[0], 3, 299, 299), method="bilinear", antialias=False
        )
    if normalize_input:
        x = 2 * x - 1

    for name, shape, stride, padding in _STEM:
        if shape is None:
            x = _max_pool(x)
        else:
            x = _basic_conv(x, params[name], stride=stride, padding=padding)

    spatial = None
    for name, fn in _MIXED:
        x = fn(x, params[name])
        if name == spatial_tap:
            spatial = x
        elif name == "Mixed_6d" and spatial_tap == "mixed_6_conv":
            # post-relu Mixed_6d.branch1x1 == first 192 channels of the
            # block concat (branch order: [b1, b7, bd, bp])
            spatial = x[:, :192]
    if return_spatial and spatial is None:
        raise ValueError(f"unknown spatial_tap {spatial_tap!r}")
    pooled = _adaptive_avg_pool_1(x)
    if return_spatial:
        return pooled, spatial
    return pooled


# ---------------------------------------------------------------------------
# Weight import / init
# ---------------------------------------------------------------------------

_BLOCK_BRANCHES = {
    _inception_a: ["branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"],
    _inception_b: ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"],
    _inception_c: ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3", "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3", "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"],
    _inception_d: ["branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4"],
}
_E_BRANCHES = ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a", "branch3x3dbl_3b", "branch_pool"]


def _fold_bn(sd: Dict[str, np.ndarray], prefix: str, eps: float = 1e-3) -> Params:
    """Fold conv + BatchNorm(eval) into {w, scale, shift}."""
    w = np.asarray(sd[f"{prefix}.conv.weight"], np.float32)
    gamma = np.asarray(sd[f"{prefix}.bn.weight"], np.float32)
    beta = np.asarray(sd[f"{prefix}.bn.bias"], np.float32)
    mean = np.asarray(sd[f"{prefix}.bn.running_mean"], np.float32)
    var = np.asarray(sd[f"{prefix}.bn.running_var"], np.float32)
    inv = gamma / np.sqrt(var + eps)
    return {
        "w": jnp.asarray(w),
        "scale": jnp.asarray(inv),
        "shift": jnp.asarray(beta - mean * inv),
    }


def import_inception_torch_state_dict(sd: Dict[str, np.ndarray]) -> Params:
    """pt_inception-2015-12-05 state_dict (torchvision names) → params."""
    params: Params = {}
    for name, shape, _, _ in _STEM:
        if shape is not None:
            params[name] = _fold_bn(sd, name)
    for name, fn in _MIXED:
        branches = _E_BRANCHES if name in ("Mixed_7b", "Mixed_7c") else _BLOCK_BRANCHES[fn.func if isinstance(fn, partial) else fn]
        params[name] = {b: _fold_bn(sd, f"{name}.{b}") for b in branches}
    return params


def load_inception_params(weights_path: Optional[str] = None) -> Params:
    """Load FID weights from a local pt_inception file, or fall back to
    deterministic random weights (pipeline testing only)."""
    if weights_path and os.path.exists(weights_path):
        import torch

        sd = torch.load(weights_path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = {k: v.numpy() for k, v in sd.items()}
        return import_inception_torch_state_dict(sd)
    return init_random_inception_params(jax.random.key(0))


# channel plumbing for random init (in_ch per conv, matching torchvision)
def _random_sd(key) -> Dict[str, np.ndarray]:
    """Build a random state_dict with the correct shapes (for tests)."""
    rng = np.random.default_rng(0)
    sd: Dict[str, np.ndarray] = {}

    def add(prefix, out_c, in_c, kh, kw):
        sd[f"{prefix}.conv.weight"] = rng.standard_normal((out_c, in_c, kh, kw)).astype(np.float32) * 0.05
        sd[f"{prefix}.bn.weight"] = np.ones(out_c, np.float32)
        sd[f"{prefix}.bn.bias"] = np.zeros(out_c, np.float32)
        sd[f"{prefix}.bn.running_mean"] = np.zeros(out_c, np.float32)
        sd[f"{prefix}.bn.running_var"] = np.ones(out_c, np.float32)

    for name, shape, _, _ in _STEM:
        if shape is not None:
            add(name, *shape)

    def add_a(name, in_c, pf):
        add(f"{name}.branch1x1", 64, in_c, 1, 1)
        add(f"{name}.branch5x5_1", 48, in_c, 1, 1)
        add(f"{name}.branch5x5_2", 64, 48, 5, 5)
        add(f"{name}.branch3x3dbl_1", 64, in_c, 1, 1)
        add(f"{name}.branch3x3dbl_2", 96, 64, 3, 3)
        add(f"{name}.branch3x3dbl_3", 96, 96, 3, 3)
        add(f"{name}.branch_pool", pf, in_c, 1, 1)

    add_a("Mixed_5b", 192, 32)
    add_a("Mixed_5c", 256, 64)
    add_a("Mixed_5d", 288, 64)

    add("Mixed_6a.branch3x3", 384, 288, 3, 3)
    add("Mixed_6a.branch3x3dbl_1", 64, 288, 1, 1)
    add("Mixed_6a.branch3x3dbl_2", 96, 64, 3, 3)
    add("Mixed_6a.branch3x3dbl_3", 96, 96, 3, 3)

    def add_c(name, c7):
        add(f"{name}.branch1x1", 192, 768, 1, 1)
        add(f"{name}.branch7x7_1", c7, 768, 1, 1)
        add(f"{name}.branch7x7_2", c7, c7, 1, 7)
        add(f"{name}.branch7x7_3", 192, c7, 7, 1)
        add(f"{name}.branch7x7dbl_1", c7, 768, 1, 1)
        add(f"{name}.branch7x7dbl_2", c7, c7, 7, 1)
        add(f"{name}.branch7x7dbl_3", c7, c7, 1, 7)
        add(f"{name}.branch7x7dbl_4", c7, c7, 7, 1)
        add(f"{name}.branch7x7dbl_5", 192, c7, 1, 7)
        add(f"{name}.branch_pool", 192, 768, 1, 1)

    add_c("Mixed_6b", 128)
    add_c("Mixed_6c", 160)
    add_c("Mixed_6d", 160)
    add_c("Mixed_6e", 192)

    add("Mixed_7a.branch3x3_1", 192, 768, 1, 1)
    add("Mixed_7a.branch3x3_2", 320, 192, 3, 3)
    add("Mixed_7a.branch7x7x3_1", 192, 768, 1, 1)
    add("Mixed_7a.branch7x7x3_2", 192, 192, 1, 7)
    add("Mixed_7a.branch7x7x3_3", 192, 192, 7, 1)
    add("Mixed_7a.branch7x7x3_4", 192, 192, 3, 3)

    def add_e(name, in_c):
        add(f"{name}.branch1x1", 320, in_c, 1, 1)
        add(f"{name}.branch3x3_1", 384, in_c, 1, 1)
        add(f"{name}.branch3x3_2a", 384, 384, 1, 3)
        add(f"{name}.branch3x3_2b", 384, 384, 3, 1)
        add(f"{name}.branch3x3dbl_1", 448, in_c, 1, 1)
        add(f"{name}.branch3x3dbl_2", 384, 448, 3, 3)
        add(f"{name}.branch3x3dbl_3a", 384, 384, 1, 3)
        add(f"{name}.branch3x3dbl_3b", 384, 384, 3, 1)
        add(f"{name}.branch_pool", 192, in_c, 1, 1)

    add_e("Mixed_7b", 1280)
    add_e("Mixed_7c", 2048)
    return sd


def init_random_inception_params(key) -> Params:
    return import_inception_torch_state_dict(_random_sd(key))


DEFAULT_WEIGHTS_PATHS = [
    "pretrain_weight/pt_inception-2015-12-05-6726825d.pth",
    os.path.expanduser("~/.cache/ldmae_tpu/pt_inception-2015-12-05-6726825d.pth"),
]


def default_feature_fn(weights_path: Optional[str] = None, batch_jit: bool = True) -> Callable:
    """(N, H, W, 3)∈[0,1] → (N, 2048) using the FID Inception."""
    if weights_path is None:
        for p in DEFAULT_WEIGHTS_PATHS:
            if os.path.exists(p):
                weights_path = p
                break
    params = load_inception_params(weights_path)
    if weights_path is None:
        import warnings

        warnings.warn(
            "FID Inception weights not found — using random weights; FID "
            "values will NOT be comparable to the reference. Place "
            "pt_inception-2015-12-05-6726825d.pth under pretrain_weight/."
        )
    fwd = jax.jit(lambda x: inception_forward(params, x))
    return lambda x: np.asarray(fwd(jnp.asarray(x, jnp.float32)))
