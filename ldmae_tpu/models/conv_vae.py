"""LDM-style convolutional VAE (AutoencoderKL) in JAX.

Re-implementation of /root/reference/LDMAE/tokenizer/autoencoder.py: swish
nonlinearity + GroupNorm(32, eps 1e-6) (autoencoder.py:10-18), asymmetric-pad
stride-2 Downsample / nearest-×2 Upsample (21-54), ResnetBlock (57-114),
single-head conv AttnBlock (117-160), Encoder with ch_mult pyramid + mid
attention (163-274), mirrored Decoder (277-398), and the AutoencoderKL
wrapper with quant/post_quant 1×1 convs (452-497). Used by the VA-VAE /
MAR-VAE tokenizer wrappers; the SD-VAE (diffusers) checkpoints import
through a key-mapping onto the same structure.

All convs run NCHW on fp32/bf16; GroupNorm in fp32.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gaussian import DiagonalGaussian, diagonal_gaussian

Params = Dict[str, Any]


@dataclass(frozen=True)
class ConvVAESpec:
    ch: int = 128
    out_ch: int = 3
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    decoder_attn_resolutions: Tuple[int, ...] = (16,)
    in_channels: int = 3
    resolution: int = 256
    z_channels: int = 16
    embed_dim: int = 16
    double_z: bool = True
    use_variational: bool = True
    use_quant_conv: bool = True
    use_post_quant_conv: bool = True
    num_groups: int = 32


def vavae_spec(embed_dim: int = 32) -> ConvVAESpec:
    """VA-VAE f16d32 (tokenizer/configs/vavae_f16d32.yaml + vavae.py:38-43)."""
    return ConvVAESpec(z_channels=embed_dim, embed_dim=embed_dim)


def marvae_spec(embed_dim: int = 16) -> ConvVAESpec:
    """MAR-VAE: same encoder, decoder without attention (marvae.py,
    autoencoder.py:458-459)."""
    return ConvVAESpec(
        z_channels=embed_dim, embed_dim=embed_dim, decoder_attn_resolutions=()
    )


def sdvae_spec() -> ConvVAESpec:
    """SD3-style VAE (extract_features.py:68-93): block_out_channels
    (128,256,512,512) = ch_mult (1,2,4,4), no attn in down/up blocks, no
    quant convs, latent 16."""
    return ConvVAESpec(
        ch=128,
        ch_mult=(1, 2, 4, 4),
        attn_resolutions=(),
        decoder_attn_resolutions=(),
        z_channels=16,
        embed_dim=16,
        use_quant_conv=False,
        use_post_quant_conv=False,
    )


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------


def _conv(x, p, stride=1, padding=1):
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + p["b"].reshape(1, -1, 1, 1).astype(out.dtype)


def _group_norm(x, p, groups=32, eps=1e-6):
    n, c, h, w = x.shape
    xf = x.astype(jnp.float32).reshape(n, groups, c // groups, h, w)
    mean = xf.mean(axis=(2, 3, 4), keepdims=True)
    var = xf.var(axis=(2, 3, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(n, c, h, w)
    out = xf * p["scale"].reshape(1, -1, 1, 1) + p["bias"].reshape(1, -1, 1, 1)
    return out.astype(x.dtype)


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _resnet_block(x, p, groups=32):
    h = _swish(_group_norm(x, p["norm1"], groups))
    h = _conv(h, p["conv1"])
    h = _swish(_group_norm(h, p["norm2"], groups))
    h = _conv(h, p["conv2"])
    if "nin_shortcut" in p:
        x = _conv(x, p["nin_shortcut"], padding=0)
    return x + h


def _attn_block(x, p, groups=32):
    """Single-head conv attention (autoencoder.py:117-160)."""
    h = _group_norm(x, p["norm"], groups)
    q = _conv(h, p["q"], padding=0)
    k = _conv(h, p["k"], padding=0)
    v = _conv(h, p["v"], padding=0)
    b, c, hh, ww = q.shape
    qf = q.reshape(b, c, hh * ww).transpose(0, 2, 1).astype(jnp.float32)
    kf = k.reshape(b, c, hh * ww).astype(jnp.float32)
    w_ = jnp.einsum("bic,bcj->bij", qf, kf) * (c**-0.5)
    w_ = jax.nn.softmax(w_, axis=2)
    vf = v.reshape(b, c, hh * ww).astype(jnp.float32)
    # out[b,c,j] = Σ_i v[b,c,i]·w[b,j,i] (the reference's permute+bmm)
    out = jnp.einsum("bci,bji->bcj", vf, w_)
    out = out.reshape(b, c, hh, ww).astype(x.dtype)
    return x + _conv(out, p["proj_out"], padding=0)


def _downsample(x, p):
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1)))
    return _conv(x, p["conv"], stride=2, padding=0)


def _upsample(x, p):
    n, c, h, w = x.shape
    x = jax.image.resize(x, (n, c, h * 2, w * 2), method="nearest")
    return _conv(x, p["conv"])


# ---------------------------------------------------------------------------
# Encoder / Decoder
# ---------------------------------------------------------------------------


def encoder_forward(params: Params, spec: ConvVAESpec, x: jnp.ndarray) -> jnp.ndarray:
    g = spec.num_groups
    h = _conv(x, params["conv_in"])
    curr_res = spec.resolution
    for i_level in range(len(spec.ch_mult)):
        level = params["down"][i_level]
        for i_block in range(spec.num_res_blocks):
            h = _resnet_block(h, level["block"][i_block], g)
            if curr_res in spec.attn_resolutions:
                h = _attn_block(h, level["attn"][i_block], g)
        if i_level != len(spec.ch_mult) - 1:
            h = _downsample(h, level["downsample"])
            curr_res //= 2
    h = _resnet_block(h, params["mid"]["block_1"], g)
    h = _attn_block(h, params["mid"]["attn_1"], g)
    h = _resnet_block(h, params["mid"]["block_2"], g)
    h = _swish(_group_norm(h, params["norm_out"], g))
    return _conv(h, params["conv_out"])


def decoder_forward(params: Params, spec: ConvVAESpec, z: jnp.ndarray) -> jnp.ndarray:
    g = spec.num_groups
    n_lv = len(spec.ch_mult)
    h = _conv(z, params["conv_in"])
    h = _resnet_block(h, params["mid"]["block_1"], g)
    h = _attn_block(h, params["mid"]["attn_1"], g)
    h = _resnet_block(h, params["mid"]["block_2"], g)
    curr_res = spec.resolution // 2 ** (n_lv - 1)
    for i_level in reversed(range(n_lv)):
        level = params["up"][i_level]
        for i_block in range(spec.num_res_blocks + 1):
            h = _resnet_block(h, level["block"][i_block], g)
            if curr_res in spec.decoder_attn_resolutions:
                h = _attn_block(h, level["attn"][i_block], g)
        if i_level != 0:
            h = _upsample(h, level["upsample"])
            curr_res *= 2
    h = _swish(_group_norm(h, params["norm_out"], g))
    return _conv(h, params["conv_out"])


def encode_moments(params: Params, spec: ConvVAESpec, x: jnp.ndarray) -> jnp.ndarray:
    """Raw posterior moments (2·z_channels), the conv-VAE equivalent of the
    VMAE docking ``_encode`` (sdvae has no quant convs, so this is exactly
    the diffusers ``_encode`` used when config ``sample: true``,
    extract_features.py:148-152)."""
    h = encoder_forward(params["encoder"], spec, x)
    moments = _conv(h, params["quant_conv"], padding=0) if spec.use_quant_conv else h
    if not spec.use_variational:
        moments = jnp.concatenate([moments, jnp.ones_like(moments)], axis=1)
    return moments


def encode(params: Params, spec: ConvVAESpec, x: jnp.ndarray) -> DiagonalGaussian:
    """AutoencoderKL.encode (autoencoder.py:480-486)."""
    return diagonal_gaussian(encode_moments(params, spec, x), axis=1)


def decode(params: Params, spec: ConvVAESpec, z: jnp.ndarray) -> jnp.ndarray:
    if spec.use_post_quant_conv:
        z = _conv(z, params["post_quant_conv"], padding=0)
    return decoder_forward(params["decoder"], spec, z)


def decode_to_images(params: Params, spec: ConvVAESpec, z: jnp.ndarray) -> jnp.ndarray:
    imgs = decode(params, spec, z)
    return jnp.clip(127.5 * imgs + 128.0, 0, 255).transpose(0, 2, 3, 1).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Init / torch import
# ---------------------------------------------------------------------------


def _init_conv(key, cin, cout, k):
    fan = cin * k * k
    a = float(np.sqrt(1.0 / fan))
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (cout, cin, k, k), minval=-a, maxval=a),
        "b": jax.random.uniform(kb, (cout,), minval=-a, maxval=a),
    }


def _init_gn(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}


def _init_resnet(keys, cin, cout):
    p = {
        "norm1": _init_gn(cin),
        "conv1": _init_conv(next(keys), cin, cout, 3),
        "norm2": _init_gn(cout),
        "conv2": _init_conv(next(keys), cout, cout, 3),
    }
    if cin != cout:
        p["nin_shortcut"] = _init_conv(next(keys), cin, cout, 1)
    return p


def _init_attn(keys, c):
    return {
        "norm": _init_gn(c),
        "q": _init_conv(next(keys), c, c, 1),
        "k": _init_conv(next(keys), c, c, 1),
        "v": _init_conv(next(keys), c, c, 1),
        "proj_out": _init_conv(next(keys), c, c, 1),
    }


def init_conv_vae_params(key: jax.Array, spec: ConvVAESpec) -> Params:
    keys = iter(jax.random.split(key, 4096))
    ch, zc = spec.ch, spec.z_channels
    n_lv = len(spec.ch_mult)
    in_mult = (1,) + tuple(spec.ch_mult)

    # encoder
    enc: Params = {"conv_in": _init_conv(next(keys), spec.in_channels, ch, 3), "down": []}
    curr_res = spec.resolution
    block_in = ch
    for i in range(n_lv):
        block_in = ch * in_mult[i]
        block_out = ch * spec.ch_mult[i]
        level: Params = {"block": [], "attn": []}
        for _ in range(spec.num_res_blocks):
            level["block"].append(_init_resnet(keys, block_in, block_out))
            block_in = block_out
            if curr_res in spec.attn_resolutions:
                level["attn"].append(_init_attn(keys, block_in))
        if i != n_lv - 1:
            level["downsample"] = {"conv": _init_conv(next(keys), block_in, block_in, 3)}
            curr_res //= 2
        enc["down"].append(level)
    enc["mid"] = {
        "block_1": _init_resnet(keys, block_in, block_in),
        "attn_1": _init_attn(keys, block_in),
        "block_2": _init_resnet(keys, block_in, block_in),
    }
    enc["norm_out"] = _init_gn(block_in)
    enc["conv_out"] = _init_conv(
        next(keys), block_in, 2 * zc if spec.double_z else zc, 3
    )

    # decoder
    block_in = ch * spec.ch_mult[-1]
    dec: Params = {"conv_in": _init_conv(next(keys), zc, block_in, 3)}
    dec["mid"] = {
        "block_1": _init_resnet(keys, block_in, block_in),
        "attn_1": _init_attn(keys, block_in),
        "block_2": _init_resnet(keys, block_in, block_in),
    }
    curr_res = spec.resolution // 2 ** (n_lv - 1)
    up: List[Params] = [None] * n_lv
    for i in reversed(range(n_lv)):
        block_out = ch * spec.ch_mult[i]
        level = {"block": [], "attn": []}
        for _ in range(spec.num_res_blocks + 1):
            level["block"].append(_init_resnet(keys, block_in, block_out))
            block_in = block_out
            if curr_res in spec.decoder_attn_resolutions:
                level["attn"].append(_init_attn(keys, block_in))
        if i != 0:
            level["upsample"] = {"conv": _init_conv(next(keys), block_in, block_in, 3)}
            curr_res *= 2
        up[i] = level
    dec["up"] = up
    dec["norm_out"] = _init_gn(block_in)
    dec["conv_out"] = _init_conv(next(keys), block_in, spec.out_ch, 3)

    params: Params = {"encoder": enc, "decoder": dec}
    mult = 2 if spec.use_variational else 1
    if spec.use_quant_conv:
        params["quant_conv"] = _init_conv(next(keys), 2 * spec.embed_dim, mult * spec.embed_dim, 1)
    if spec.use_post_quant_conv:
        params["post_quant_conv"] = _init_conv(next(keys), spec.embed_dim, spec.embed_dim, 1)
    return params


def import_conv_vae_state_dict(sd: Dict[str, np.ndarray], spec: ConvVAESpec) -> Params:
    """Import LDM-naming state_dicts (vavae 'state_dict' / marvae 'model'
    sub-dicts; see AutoencoderKL.init_from_ckpt, autoencoder.py:470-478)."""

    def conv(name):
        return {"w": jnp.asarray(sd[f"{name}.weight"]), "b": jnp.asarray(sd[f"{name}.bias"])}

    def gn(name):
        return {"scale": jnp.asarray(sd[f"{name}.weight"]), "bias": jnp.asarray(sd[f"{name}.bias"])}

    def resnet(pre):
        p = {
            "norm1": gn(f"{pre}.norm1"),
            "conv1": conv(f"{pre}.conv1"),
            "norm2": gn(f"{pre}.norm2"),
            "conv2": conv(f"{pre}.conv2"),
        }
        if f"{pre}.nin_shortcut.weight" in sd:
            p["nin_shortcut"] = conv(f"{pre}.nin_shortcut")
        return p

    def attn(pre):
        return {
            "norm": gn(f"{pre}.norm"),
            "q": conv(f"{pre}.q"),
            "k": conv(f"{pre}.k"),
            "v": conv(f"{pre}.v"),
            "proj_out": conv(f"{pre}.proj_out"),
        }

    n_lv = len(spec.ch_mult)
    enc: Params = {"conv_in": conv("encoder.conv_in"), "down": []}
    curr_res = spec.resolution
    for i in range(n_lv):
        level: Params = {"block": [], "attn": []}
        for b in range(spec.num_res_blocks):
            level["block"].append(resnet(f"encoder.down.{i}.block.{b}"))
            if curr_res in spec.attn_resolutions:
                level["attn"].append(attn(f"encoder.down.{i}.attn.{b}"))
        if i != n_lv - 1:
            level["downsample"] = {"conv": conv(f"encoder.down.{i}.downsample.conv")}
            curr_res //= 2
        enc["down"].append(level)
    enc["mid"] = {
        "block_1": resnet("encoder.mid.block_1"),
        "attn_1": attn("encoder.mid.attn_1"),
        "block_2": resnet("encoder.mid.block_2"),
    }
    enc["norm_out"] = gn("encoder.norm_out")
    enc["conv_out"] = conv("encoder.conv_out")

    dec: Params = {"conv_in": conv("decoder.conv_in")}
    dec["mid"] = {
        "block_1": resnet("decoder.mid.block_1"),
        "attn_1": attn("decoder.mid.attn_1"),
        "block_2": resnet("decoder.mid.block_2"),
    }
    curr_res = spec.resolution // 2 ** (n_lv - 1)
    up: List[Params] = [None] * n_lv
    for i in reversed(range(n_lv)):
        level = {"block": [], "attn": []}
        for b in range(spec.num_res_blocks + 1):
            level["block"].append(resnet(f"decoder.up.{i}.block.{b}"))
            if curr_res in spec.decoder_attn_resolutions:
                level["attn"].append(attn(f"decoder.up.{i}.attn.{b}"))
        if i != 0:
            level["upsample"] = {"conv": conv(f"decoder.up.{i}.upsample.conv")}
            curr_res *= 2
        up[i] = level
    dec["up"] = up
    dec["norm_out"] = gn("decoder.norm_out")
    dec["conv_out"] = conv("decoder.conv_out")

    params: Params = {"encoder": enc, "decoder": dec}
    if spec.use_quant_conv:
        params["quant_conv"] = conv("quant_conv")
    if spec.use_post_quant_conv:
        params["post_quant_conv"] = conv("post_quant_conv")
    return params


def load_vavae(ckpt_path: str, embed_dim: int = 32) -> Tuple[Params, ConvVAESpec]:
    """VA-VAE loader (vavae.py:31-43): torch ckpt['state_dict'], loss keys
    dropped."""
    import torch

    spec = vavae_spec(embed_dim)
    raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)["state_dict"]
    sd = {k: v.numpy() for k, v in raw.items() if "loss" not in k}
    return import_conv_vae_state_dict(sd, spec), spec


def load_marvae(ckpt_path: str, embed_dim: int = 16) -> Tuple[Params, ConvVAESpec]:
    """MAR-VAE loader (marvae.py): torch ckpt['model']."""
    import torch

    spec = marvae_spec(embed_dim)
    raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)["model"]
    sd = {k: v.numpy() for k, v in raw.items()}
    return import_conv_vae_state_dict(sd, spec), spec
