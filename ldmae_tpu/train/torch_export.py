"""Export ldmae_tpu parameter pytrees as reference-format torch checkpoints.

Inverse of torch_import: a DiT trained here can be saved as the reference's
``{model, ema, opt, config} → {step:07d}.pt`` format (train_accum.py:275-284)
and a VMAE as ``{'model': state_dict, 'epoch', 'args'} → checkpoint-{E}.pth``
(VMAE/util/misc.py:468-485), so reference-side tooling keeps working.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from ..models.lightningdit import DiTSpec
from ..models.vmae import VMAESpec
from ..ops.sincos import get_2d_sincos_pos_embed

Params = Any


def _t(x):
    import torch

    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def export_dit_state_dict(params: Params, spec: DiTSpec) -> Dict[str, Any]:
    import torch

    d = spec.hidden_size
    na = spec.num_adaln
    sd: Dict[str, Any] = {}

    # patch embed: (p*p*C, D) -> conv (D, C, p, p)
    p = spec.patch_size
    w = np.asarray(params["x_embedder"]["w"]).reshape(p, p, spec.in_channels, d)
    sd["x_embedder.proj.weight"] = _t(w.transpose(3, 2, 0, 1))
    sd["x_embedder.proj.bias"] = _t(params["x_embedder"]["b"])

    sd["t_embedder.mlp.0.weight"] = _t(np.asarray(params["t_embedder"]["fc1"]["w"]).T)
    sd["t_embedder.mlp.0.bias"] = _t(params["t_embedder"]["fc1"]["b"])
    sd["t_embedder.mlp.2.weight"] = _t(np.asarray(params["t_embedder"]["fc2"]["w"]).T)
    sd["t_embedder.mlp.2.bias"] = _t(params["t_embedder"]["fc2"]["b"])
    sd["y_embedder.embedding_table.weight"] = _t(params["y_embedder"]["table"])

    grid = spec.input_size // spec.patch_size
    sd["pos_embed"] = _t(get_2d_sincos_pos_embed(d, grid)[None])
    if spec.use_rope:
        # the reference registers the RoPE tables as buffers
        # (pos_embed.py:128-132) so they appear in its state_dict
        from ..ops.rope import build_rope_table

        cos, sin = build_rope_table(spec.head_dim // 2, grid)
        sd["feat_rope.freqs_cos"] = _t(cos)
        sd["feat_rope.freqs_sin"] = _t(sin)

    b = params["blocks"]
    for i in range(spec.depth):
        pre = f"blocks.{i}"
        qkv_w = np.asarray(b["attn"]["qkv"]["w"][i]).reshape(d, 3 * d)
        sd[f"{pre}.attn.qkv.weight"] = _t(qkv_w.T)
        sd[f"{pre}.attn.qkv.bias"] = _t(np.asarray(b["attn"]["qkv"]["b"][i]).reshape(3 * d))
        sd[f"{pre}.attn.proj.weight"] = _t(np.asarray(b["attn"]["proj"]["w"][i]).T)
        sd[f"{pre}.attn.proj.bias"] = _t(b["attn"]["proj"]["b"][i])
        if spec.use_qknorm:
            sd[f"{pre}.attn.q_norm.weight"] = _t(b["attn"]["q_norm"]["scale"][i])
            sd[f"{pre}.attn.k_norm.weight"] = _t(b["attn"]["k_norm"]["scale"][i])
            # LayerNorm qk-norm (use_rmsnorm=False) carries a bias too —
            # dropping it made strict=True reference loads fail and zeroed
            # the trained biases on strict=False
            if "bias" in b["attn"]["q_norm"]:
                sd[f"{pre}.attn.q_norm.bias"] = _t(b["attn"]["q_norm"]["bias"][i])
                sd[f"{pre}.attn.k_norm.bias"] = _t(b["attn"]["k_norm"]["bias"][i])
        if spec.use_swiglu:
            w1 = np.asarray(b["mlp"]["w1"]["w"][i]).T
            w2 = np.asarray(b["mlp"]["w2"]["w"][i]).T
            sd[f"{pre}.mlp.w12.weight"] = _t(np.concatenate([w1, w2], axis=0))
            sd[f"{pre}.mlp.w12.bias"] = _t(
                np.concatenate(
                    [np.asarray(b["mlp"]["w1"]["b"][i]), np.asarray(b["mlp"]["w2"]["b"][i])]
                )
            )
            sd[f"{pre}.mlp.w3.weight"] = _t(np.asarray(b["mlp"]["w3"]["w"][i]).T)
            sd[f"{pre}.mlp.w3.bias"] = _t(b["mlp"]["w3"]["b"][i])
        else:
            sd[f"{pre}.mlp.fc1.weight"] = _t(np.asarray(b["mlp"]["fc1"]["w"][i]).T)
            sd[f"{pre}.mlp.fc1.bias"] = _t(b["mlp"]["fc1"]["b"][i])
            sd[f"{pre}.mlp.fc2.weight"] = _t(np.asarray(b["mlp"]["fc2"]["w"][i]).T)
            sd[f"{pre}.mlp.fc2.bias"] = _t(b["mlp"]["fc2"]["b"][i])
        ada_w = np.asarray(b["adaln"]["w"][i]).reshape(d, na * d)
        sd[f"{pre}.adaLN_modulation.1.weight"] = _t(ada_w.T)
        sd[f"{pre}.adaLN_modulation.1.bias"] = _t(np.asarray(b["adaln"]["b"][i]).reshape(na * d))
        if spec.use_rmsnorm:
            sd[f"{pre}.norm1.weight"] = _t(b["norm1"]["scale"][i])
            sd[f"{pre}.norm2.weight"] = _t(b["norm2"]["scale"][i])

    fl = params["final_layer"]
    sd["final_layer.adaLN_modulation.1.weight"] = _t(
        np.asarray(fl["adaln"]["w"]).reshape(d, 2 * d).T
    )
    sd["final_layer.adaLN_modulation.1.bias"] = _t(np.asarray(fl["adaln"]["b"]).reshape(2 * d))
    sd["final_layer.linear.weight"] = _t(np.asarray(fl["linear"]["w"]).T)
    sd["final_layer.linear.bias"] = _t(fl["linear"]["b"])
    if spec.use_rmsnorm:
        sd["final_layer.norm_final.weight"] = _t(fl["norm"]["scale"])
    return sd


def save_dit_torch_checkpoint(
    path: str,
    params: Params,
    ema_params: Params,
    spec: DiTSpec,
    config: Optional[Dict] = None,
) -> str:
    import torch

    torch.save(
        {
            "model": export_dit_state_dict(params, spec),
            "ema": export_dit_state_dict(ema_params, spec),
            "opt": {},  # reference resume ignores optimizer state anyway
            "config": config or {},
        },
        path,
    )
    return path


def export_vmae_state_dict(params: Params, spec: VMAESpec) -> Dict[str, Any]:
    import torch

    sd: Dict[str, Any] = {}
    p = spec.patch_size
    d, dd = spec.embed_dim, spec.decoder_embed_dim

    w = np.asarray(params["patch_embed"]["w"]).reshape(p, p, spec.in_chans, d)
    sd["patch_embed.proj.weight"] = _t(w.transpose(3, 2, 0, 1))
    sd["patch_embed.proj.bias"] = _t(params["patch_embed"]["b"])
    sd["pos_embed"] = _t(
        get_2d_sincos_pos_embed(
            d, spec.grid, cls_token=not spec.no_cls, extra_tokens=spec.num_extra_tokens
        )[None]
    )
    sd["decoder_pos_embed"] = _t(
        get_2d_sincos_pos_embed(
            dd, spec.grid, cls_token=not spec.no_cls, extra_tokens=spec.num_extra_tokens
        )[None]
    )

    def lin(name, node):
        sd[f"{name}.weight"] = _t(np.asarray(node["w"]).T)
        if "b" in node:
            sd[f"{name}.bias"] = _t(node["b"])

    def blocks(prefix, node, depth, dim):
        for i in range(depth):
            pre = f"{prefix}.{i}"
            sd[f"{pre}.norm1.weight"] = _t(node["norm1"]["scale"][i])
            sd[f"{pre}.norm1.bias"] = _t(node["norm1"]["bias"][i])
            qkv_w = np.asarray(node["attn"]["qkv"]["w"][i]).reshape(dim, 3 * dim)
            sd[f"{pre}.attn.qkv.weight"] = _t(qkv_w.T)
            sd[f"{pre}.attn.qkv.bias"] = _t(np.asarray(node["attn"]["qkv"]["b"][i]).reshape(3 * dim))
            sd[f"{pre}.attn.proj.weight"] = _t(np.asarray(node["attn"]["proj"]["w"][i]).T)
            sd[f"{pre}.attn.proj.bias"] = _t(node["attn"]["proj"]["b"][i])
            sd[f"{pre}.norm2.weight"] = _t(node["norm2"]["scale"][i])
            sd[f"{pre}.norm2.bias"] = _t(node["norm2"]["bias"][i])
            sd[f"{pre}.mlp.fc1.weight"] = _t(np.asarray(node["mlp"]["fc1"]["w"][i]).T)
            sd[f"{pre}.mlp.fc1.bias"] = _t(node["mlp"]["fc1"]["b"][i])
            sd[f"{pre}.mlp.fc2.weight"] = _t(np.asarray(node["mlp"]["fc2"]["w"][i]).T)
            sd[f"{pre}.mlp.fc2.bias"] = _t(node["mlp"]["fc2"]["b"][i])

    blocks("blocks", params["blocks"], spec.depth, d)
    sd["norm.weight"] = _t(params["norm"]["scale"])
    sd["norm.bias"] = _t(params["norm"]["bias"])
    blocks("decoder_blocks", params["decoder_blocks"], spec.decoder_depth, dd)
    sd["decoder_norm.weight"] = _t(params["decoder_norm"]["scale"])
    sd["decoder_norm.bias"] = _t(params["decoder_norm"]["bias"])
    lin("decoder_embed", params["decoder_embed"])

    if spec.down_nonlinear:
        lin("to_latent.layers.0", params["to_latent"]["fc1"])
        lin("to_latent.layers.2", params["to_latent"]["fc2"])
        lin("from_latent.layers.0", params["from_latent"]["fc1"])
        lin("from_latent.layers.2", params["from_latent"]["fc2"])
    else:
        lin("to_latent", params["to_latent"])
        lin("from_latent", params["from_latent"])

    if "cls_token" in params:
        sd["cls_token"] = _t(np.asarray(params["cls_token"]).reshape(1, 1, -1))
    if "mask_token" in params:
        sd["mask_token"] = _t(np.asarray(params["mask_token"]).reshape(1, 1, -1))

    dp = params["decoder_pred"]
    if spec.smooth_output:
        if not spec.pred_with_conv:
            lin("decoder_pred.linear_pred", dp["linear_pred"])
        sd["decoder_pred.conv_smoother.weight"] = _t(dp["conv_smoother"]["w"])
        sd["decoder_pred.conv_smoother.bias"] = _t(dp["conv_smoother"]["b"])
    else:
        lin("decoder_pred", dp)
    return sd


def save_vmae_torch_checkpoint(
    path: str, params: Params, spec: VMAESpec, epoch: int = 0, args: Optional[Dict] = None
) -> str:
    import torch

    torch.save(
        {"model": export_vmae_state_dict(params, spec), "epoch": epoch, "args": args or {}},
        path,
    )
    return path
