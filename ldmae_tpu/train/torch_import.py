"""PyTorch checkpoint import.

Maps the reference's state_dicts onto ldmae_tpu parameter pytrees so the
published checkpoints (vmaef8d16.pth — SURVEY.md §5.4; DiT {model,ema,opt}
.pt files — train_accum.py:275-284) run unchanged on TPU.

Layout conversions (see tests/test_torch_parity.py for end-to-end proof):
  * nn.Linear weight (out, in)            -> w (in, out)          [transpose]
  * packed qkv (3D, D)                    -> (D, 3, D)
  * adaLN_modulation.1 (kD, D)            -> (D, k, D)
  * SwiGLU w12 (2h, D)                    -> w1 (D, h), w2 (D, h)
  * PatchEmbed conv (D, C, p, p)          -> (p*p*C, D) matmul weight
  * per-block tensors                     -> stacked on a leading depth axis
  * fixed sin-cos pos_embed buffers       -> dropped (recomputed as consts,
                                             at any resolution — subsumes
                                             pe_reset.py)

Uses torch (CPU) only for deserialisation; everything returned is numpy/jnp.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np
import jax.numpy as jnp

from ..models.lightningdit import DiTSpec
from ..models.vmae import VMAESpec

Params = Dict[str, Any]


def load_torch_state_dict(path: str, key: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Load a .pth/.pt file → {name: np.ndarray}.

    ``key`` selects a sub-dict ('model', 'ema', ...). When None, tries the
    raw dict, then 'model' (matching the reference's strict=False loaders).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if key is not None:
        ckpt = ckpt[key]
    elif isinstance(ckpt, dict) and "model" in ckpt and not _looks_like_state_dict(ckpt):
        ckpt = ckpt["model"]
    return {
        k: v.detach().to(torch.float32).numpy()
        for k, v in ckpt.items()
        if hasattr(v, "detach")
    }


def _looks_like_state_dict(d: Mapping[str, Any]) -> bool:
    return all(hasattr(v, "detach") for v in d.values()) and len(d) > 4


def _lin(sd, name) -> Params:
    p: Params = {"w": jnp.asarray(sd[f"{name}.weight"].T)}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{name}.bias"])
    return p


def _stack(trees: list) -> Params:
    """Stack a list of identical param dicts along a new leading axis."""
    import jax

    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _attn(sd, prefix: str, d: int, qk_norm: bool) -> Params:
    qkv_w = sd[f"{prefix}.qkv.weight"]  # (3D, D)
    p: Params = {
        "qkv": {"w": jnp.asarray(qkv_w.T.reshape(d, 3, d))},
        "proj": _lin(sd, f"{prefix}.proj"),
    }
    if f"{prefix}.qkv.bias" in sd:
        p["qkv"]["b"] = jnp.asarray(sd[f"{prefix}.qkv.bias"].reshape(3, d))
    if qk_norm:
        p["q_norm"] = {"scale": jnp.asarray(sd[f"{prefix}.q_norm.weight"])}
        p["k_norm"] = {"scale": jnp.asarray(sd[f"{prefix}.k_norm.weight"])}
        if f"{prefix}.q_norm.bias" in sd:  # LayerNorm qk-norm variant
            p["q_norm"]["bias"] = jnp.asarray(sd[f"{prefix}.q_norm.bias"])
            p["k_norm"]["bias"] = jnp.asarray(sd[f"{prefix}.k_norm.bias"])
    return p


def _patch_embed(sd, name: str, in_channels: Optional[int] = None) -> Params:
    w = sd[f"{name}.proj.weight"]  # (D, C, p, p)
    if in_channels is not None and w.shape[1] > in_channels:
        # warm-start channel slice `weight[:, :16]` (train_accum.py:308-334);
        # must happen on the conv channel axis BEFORE flattening to the
        # (p·p·C, D) matmul layout — a row slice is only equivalent at p=1
        w = w[:, :in_channels]
    d = w.shape[0]
    return {
        "w": jnp.asarray(w.transpose(2, 3, 1, 0).reshape(-1, d)),
        "b": jnp.asarray(sd[f"{name}.proj.bias"]),
    }


# ---------------------------------------------------------------------------
# LightningDiT
# ---------------------------------------------------------------------------


def import_dit_state_dict(sd: Dict[str, np.ndarray], spec: DiTSpec) -> Params:
    d = spec.hidden_size
    na = spec.num_adaln

    def block(i: int) -> Params:
        pre = f"blocks.{i}"
        b: Params = {"attn": _attn(sd, f"{pre}.attn", d, spec.use_qknorm)}
        if spec.use_swiglu:
            w12 = sd[f"{pre}.mlp.w12.weight"]  # (2h, D)
            b12 = sd[f"{pre}.mlp.w12.bias"]
            h = w12.shape[0] // 2
            b["mlp"] = {
                "w1": {"w": jnp.asarray(w12[:h].T), "b": jnp.asarray(b12[:h])},
                "w2": {"w": jnp.asarray(w12[h:].T), "b": jnp.asarray(b12[h:])},
                "w3": _lin(sd, f"{pre}.mlp.w3"),
            }
        else:
            b["mlp"] = {
                "fc1": _lin(sd, f"{pre}.mlp.fc1"),
                "fc2": _lin(sd, f"{pre}.mlp.fc2"),
            }
        ada_w = sd[f"{pre}.adaLN_modulation.1.weight"]  # (na*D, D)
        ada_b = sd[f"{pre}.adaLN_modulation.1.bias"]
        b["adaln"] = {
            "w": jnp.asarray(ada_w.T.reshape(d, na, d)),
            "b": jnp.asarray(ada_b.reshape(na, d)),
        }
        if spec.use_rmsnorm:
            b["norm1"] = {"scale": jnp.asarray(sd[f"{pre}.norm1.weight"])}
            b["norm2"] = {"scale": jnp.asarray(sd[f"{pre}.norm2.weight"])}
        return b

    params: Params = {
        "x_embedder": _patch_embed(sd, "x_embedder", spec.in_channels),
        "t_embedder": {
            "fc1": _lin(sd, "t_embedder.mlp.0"),
            "fc2": _lin(sd, "t_embedder.mlp.2"),
        },
        "y_embedder": {"table": jnp.asarray(sd["y_embedder.embedding_table.weight"])},
        "blocks": _stack([block(i) for i in range(spec.depth)]),
        "final_layer": {
            "adaln": {
                "w": jnp.asarray(sd["final_layer.adaLN_modulation.1.weight"].T.reshape(d, 2, d)),
                "b": jnp.asarray(sd["final_layer.adaLN_modulation.1.bias"].reshape(2, d)),
            },
            "linear": _lin(sd, "final_layer.linear"),
        },
    }
    if spec.use_rmsnorm:
        params["final_layer"]["norm"] = {
            "scale": jnp.asarray(sd["final_layer.norm_final.weight"])
        }
    return params


def import_dit_checkpoint(path: str, spec: DiTSpec, key: str = "ema") -> Params:
    """Load a reference DiT checkpoint ({model, ema, opt, config} — SURVEY §5.4).

    inference.py:100-103 consumes the 'ema' sub-dict; pass key='model' for the
    raw weights."""
    sd = load_torch_state_dict(path, key=key)
    return import_dit_state_dict(sd, spec)


# ---------------------------------------------------------------------------
# VMAE
# ---------------------------------------------------------------------------


def _vit_block(sd, pre: str, d: int) -> Params:
    return {
        "norm1": {
            "scale": jnp.asarray(sd[f"{pre}.norm1.weight"]),
            "bias": jnp.asarray(sd[f"{pre}.norm1.bias"]),
        },
        "attn": _attn(sd, f"{pre}.attn", d, qk_norm=False),
        "norm2": {
            "scale": jnp.asarray(sd[f"{pre}.norm2.weight"]),
            "bias": jnp.asarray(sd[f"{pre}.norm2.bias"]),
        },
        "mlp": {
            "fc1": _lin(sd, f"{pre}.mlp.fc1"),
            "fc2": _lin(sd, f"{pre}.mlp.fc2"),
        },
    }


def _latent_proj(sd, name: str, down_nonlinear: bool) -> Params:
    if down_nonlinear:  # MLP_dim_resize: layers.0 / layers.2
        return {"fc1": _lin(sd, f"{name}.layers.0"), "fc2": _lin(sd, f"{name}.layers.2")}
    return _lin(sd, name)


def import_vmae_state_dict(sd: Dict[str, np.ndarray], spec: VMAESpec) -> Params:
    d, dd = spec.embed_dim, spec.decoder_embed_dim
    params: Params = {
        "patch_embed": _patch_embed(sd, "patch_embed"),
        "blocks": _stack([_vit_block(sd, f"blocks.{i}", d) for i in range(spec.depth)]),
        "norm": {"scale": jnp.asarray(sd["norm.weight"]), "bias": jnp.asarray(sd["norm.bias"])},
        "decoder_embed": _lin(sd, "decoder_embed"),
        "decoder_blocks": _stack(
            [_vit_block(sd, f"decoder_blocks.{i}", dd) for i in range(spec.decoder_depth)]
        ),
        "decoder_norm": {
            "scale": jnp.asarray(sd["decoder_norm.weight"]),
            "bias": jnp.asarray(sd["decoder_norm.bias"]),
        },
        "to_latent": _latent_proj(sd, "to_latent", spec.down_nonlinear),
        "from_latent": _latent_proj(sd, "from_latent", spec.down_nonlinear),
    }
    if not spec.no_cls and "cls_token" in sd:
        params["cls_token"] = jnp.asarray(sd["cls_token"].reshape(-1))
    if "mask_token" in sd and not spec.ldmae_mode:
        params["mask_token"] = jnp.asarray(sd["mask_token"].reshape(-1))

    if spec.smooth_output:
        dp: Params = {}
        if spec.pred_with_conv:
            dp["conv_smoother"] = {
                "w": jnp.asarray(sd["decoder_pred.conv_smoother.weight"]),
                "b": jnp.asarray(sd["decoder_pred.conv_smoother.bias"]),
            }
        else:
            dp["linear_pred"] = _lin(sd, "decoder_pred.linear_pred")
            dp["conv_smoother"] = {
                "w": jnp.asarray(sd["decoder_pred.conv_smoother.weight"]),
                "b": jnp.asarray(sd["decoder_pred.conv_smoother.bias"]),
            }
        params["decoder_pred"] = dp
    else:
        params["decoder_pred"] = _lin(sd, "decoder_pred")
    return params


def import_vmae_checkpoint(path: str, spec: VMAESpec) -> Params:
    """Load vmaef8d16.pth-style checkpoints ({'model': state_dict, ...});
    the reference loads with strict=False (extract_features.py:62-64) —
    missing keys here raise instead, surfacing arch mismatches."""
    sd = load_torch_state_dict(path)
    return import_vmae_state_dict(sd, spec)


def import_vmae_state_dict_gradual(
    sd: Dict[str, np.ndarray],
    spec: VMAESpec,
    downsample_after: int,
    upsample_after: int,
) -> Params:
    """gradual_resol checkpoints: the reference interleaves the Downsample /
    Upsample convs INSIDE the blocks ModuleLists (models_mae.py:352-395), so
    ``blocks.{downsample_after}`` is the conv and later block indices shift
    by one. Produces the vmae_variants.init_gradual_params layout (unstacked
    block lists + encoder_downsample/decoder_upsample, OIHW conv weights)."""
    d, dd = spec.embed_dim, spec.decoder_embed_dim

    def blocks_with_conv(prefix, depth, width, conv_at):
        blocks, conv = [], None
        for src in range(depth + 1):
            if src == conv_at:
                conv = {
                    "w": jnp.asarray(sd[f"{prefix}.{src}.conv.weight"]),
                    "b": jnp.asarray(sd[f"{prefix}.{src}.conv.bias"]),
                }
            else:
                blocks.append(_vit_block(sd, f"{prefix}.{src}", width))
        return blocks, conv

    enc_blocks, enc_conv = blocks_with_conv("blocks", spec.depth, d, downsample_after)
    dec_blocks, dec_conv = blocks_with_conv(
        "decoder_blocks", spec.decoder_depth, dd, upsample_after
    )

    # non-block pieces via the standard importer (fed a view with the block
    # lists de-interleaved to plain 0..depth-1 indices so it doesn't trip on
    # the conv entries)
    view = {k: v for k, v in sd.items()
            if not k.startswith(("blocks.", "decoder_blocks."))}
    for prefix, depth, conv_at in (
        ("blocks", spec.depth, downsample_after),
        ("decoder_blocks", spec.decoder_depth, upsample_after),
    ):
        for i in range(depth):
            src = i if i < conv_at else i + 1
            head = f"{prefix}.{src}."
            for k, v in sd.items():
                if k.startswith(head):
                    view[f"{prefix}.{i}." + k[len(head):]] = v
    params = import_vmae_state_dict(view, spec)
    params["blocks"] = enc_blocks
    params["decoder_blocks"] = dec_blocks
    params["encoder_downsample"] = enc_conv
    params["decoder_upsample"] = dec_conv
    return params


# ---------------------------------------------------------------------------
# Warm-start (train_accum.py:308-334)
# ---------------------------------------------------------------------------


def warm_start_filter(init_params: Params, loaded: Params) -> Params:
    """Shape-checked warm start: keep loaded leaves whose shapes match,
    fall back to the fresh initialisation otherwise (train_accum.py:308-334;
    the x_embedder channel slice is applied at import time in _patch_embed)."""
    import jax

    def pick(path, init_leaf):
        node = loaded
        try:
            for k in path:
                node = node[k.key if hasattr(k, "key") else k.idx]
        except (KeyError, TypeError, IndexError):
            return init_leaf
        if node.shape == init_leaf.shape:
            return node
        # mismatched shapes are skipped (train_accum.py:320-326); the
        # x_embedder channel slice happens at import time in _patch_embed
        return init_leaf

    return jax.tree_util.tree_map_with_path(pick, init_params)
