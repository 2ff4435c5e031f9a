"""Diffusers AutoencoderKL checkpoint import.

The reference's SD-VAE path (tokenizer/sdvae.py + extract_features.py:68-99)
is a diffusers ``AutoencoderKL`` with block_out_channels (128,256,512,512),
no attention in the down/up blocks, no quant convs, latent 16 — structurally
the same conv VAE as ldmae_tpu.models.conv_vae with ch_mult (1,2,4,4). This
module maps the diffusers state_dict naming onto our params:

  LDM name                         diffusers name
  encoder.down.{i}.block.{b}.*     encoder.down_blocks.{i}.resnets.{b}.*
  encoder.down.{i}.downsample.conv encoder.down_blocks.{i}.downsamplers.0.conv
  encoder.mid.block_1/2            encoder.mid_block.resnets.0/1
  encoder.mid.attn_1.{q,k,v,proj_out,norm}
                                   encoder.mid_block.attentions.0.
                                     {to_q,to_k,to_v,to_out.0,group_norm}
  norm_out / conv_in / conv_out    conv_norm_out / conv_in / conv_out
  decoder.up.{i}.block.{b}         decoder.up_blocks.{j}.resnets.{b}
                                   (diffusers orders up_blocks low→high j,
                                    LDM indexes levels high→low i = n-1-j)
  nin_shortcut                     conv_shortcut

Diffusers attention projections are Linear (C, C); LDM uses 1×1 convs — the
weights reshape to (C, C, 1, 1).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .conv_vae import ConvVAESpec, import_conv_vae_state_dict, sdvae_spec


def diffusers_to_ldm_state_dict(
    sd: Dict[str, np.ndarray], spec: ConvVAESpec
) -> Dict[str, np.ndarray]:
    n_lv = len(spec.ch_mult)
    out: Dict[str, np.ndarray] = {}

    def copy(dst, src):
        if src in sd:
            out[dst] = np.asarray(sd[src])

    def resnet(dst, src):
        for a, b in [
            ("norm1", "norm1"), ("conv1", "conv1"),
            ("norm2", "norm2"), ("conv2", "conv2"),
        ]:
            copy(f"{dst}.{a}.weight", f"{src}.{b}.weight")
            copy(f"{dst}.{a}.bias", f"{src}.{b}.bias")
        if f"{src}.conv_shortcut.weight" in sd:
            copy(f"{dst}.nin_shortcut.weight", f"{src}.conv_shortcut.weight")
            copy(f"{dst}.nin_shortcut.bias", f"{src}.conv_shortcut.bias")

    def attn(dst, src):
        # modern diffusers naming first, then the pre-0.17 legacy names
        # (query/key/value/proj_attn with norm instead of group_norm)
        if f"{src}.group_norm.weight" in sd:
            copy(f"{dst}.norm.weight", f"{src}.group_norm.weight")
            copy(f"{dst}.norm.bias", f"{src}.group_norm.bias")
            names = [("q", "to_q"), ("k", "to_k"), ("v", "to_v"), ("proj_out", "to_out.0")]
        else:
            copy(f"{dst}.norm.weight", f"{src}.norm.weight")
            copy(f"{dst}.norm.bias", f"{src}.norm.bias")
            names = [("q", "query"), ("k", "key"), ("v", "value"), ("proj_out", "proj_attn")]
        for a, b in names:
            w = sd.get(f"{src}.{b}.weight")
            if w is None:
                continue
            w = np.asarray(w)
            if w.ndim == 2:  # Linear -> 1x1 conv
                w = w[:, :, None, None]
            out[f"{dst}.{a}.weight"] = w
            copy(f"{dst}.{a}.bias", f"{src}.{b}.bias")

    # encoder
    copy("encoder.conv_in.weight", "encoder.conv_in.weight")
    copy("encoder.conv_in.bias", "encoder.conv_in.bias")
    for i in range(n_lv):
        for b in range(spec.num_res_blocks):
            resnet(f"encoder.down.{i}.block.{b}", f"encoder.down_blocks.{i}.resnets.{b}")
        copy(
            f"encoder.down.{i}.downsample.conv.weight",
            f"encoder.down_blocks.{i}.downsamplers.0.conv.weight",
        )
        copy(
            f"encoder.down.{i}.downsample.conv.bias",
            f"encoder.down_blocks.{i}.downsamplers.0.conv.bias",
        )
    resnet("encoder.mid.block_1", "encoder.mid_block.resnets.0")
    resnet("encoder.mid.block_2", "encoder.mid_block.resnets.1")
    attn("encoder.mid.attn_1", "encoder.mid_block.attentions.0")
    copy("encoder.norm_out.weight", "encoder.conv_norm_out.weight")
    copy("encoder.norm_out.bias", "encoder.conv_norm_out.bias")
    copy("encoder.conv_out.weight", "encoder.conv_out.weight")
    copy("encoder.conv_out.bias", "encoder.conv_out.bias")

    # decoder (up_blocks ordered from lowest resolution in diffusers)
    copy("decoder.conv_in.weight", "decoder.conv_in.weight")
    copy("decoder.conv_in.bias", "decoder.conv_in.bias")
    resnet("decoder.mid.block_1", "decoder.mid_block.resnets.0")
    resnet("decoder.mid.block_2", "decoder.mid_block.resnets.1")
    attn("decoder.mid.attn_1", "decoder.mid_block.attentions.0")
    for j in range(n_lv):
        i = n_lv - 1 - j  # LDM level index
        for b in range(spec.num_res_blocks + 1):
            resnet(f"decoder.up.{i}.block.{b}", f"decoder.up_blocks.{j}.resnets.{b}")
        copy(
            f"decoder.up.{i}.upsample.conv.weight",
            f"decoder.up_blocks.{j}.upsamplers.0.conv.weight",
        )
        copy(
            f"decoder.up.{i}.upsample.conv.bias",
            f"decoder.up_blocks.{j}.upsamplers.0.conv.bias",
        )
    copy("decoder.norm_out.weight", "decoder.conv_norm_out.weight")
    copy("decoder.norm_out.bias", "decoder.conv_norm_out.bias")
    copy("decoder.conv_out.weight", "decoder.conv_out.weight")
    copy("decoder.conv_out.bias", "decoder.conv_out.bias")

    copy("quant_conv.weight", "quant_conv.weight")
    copy("quant_conv.bias", "quant_conv.bias")
    copy("post_quant_conv.weight", "post_quant_conv.weight")
    copy("post_quant_conv.bias", "post_quant_conv.bias")
    return out


def load_sdvae(ckpt_path: str):
    """Load an SD-VAE torch checkpoint ({'model': diffusers state_dict},
    extract_features.py:94-99, strict=False there → missing keys tolerated)."""
    import torch

    spec = sdvae_spec()
    raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "model" in raw:
        raw = raw["model"]
    # torch bfloat16 tensors raise from .numpy(); go through float32
    sd = {
        k: (v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy())
        for k, v in raw.items()
        if hasattr(v, "numpy")
    }
    ldm_sd = diffusers_to_ldm_state_dict(sd, spec)
    return import_conv_vae_state_dict(ldm_sd, spec), spec
