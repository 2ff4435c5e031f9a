"""VMAE secondary variants and probes.

Covers the inventory items of models_mae.py that the production arch doesn't
use but the reference ships:

  * ``gradual_resol`` (models_mae.py:189-230, 352-395, 559-627): patch size
    halved, a stride-2 conv Downsample on the token grid inserted mid-encoder
    and a nearest-×2 Upsample mid-decoder; encoder masks with mask tokens
    reinserted *inside* the encoder (forward_encoder_with_mask) and the
    decoder runs without unshuffling (forward_decoder_without_mask).
  * LayerScale (models_mae.py:108-115) and stochastic-depth DropPath on the
    ViT block residuals (constructed-but-default-off in the reference).
  * attention-map capture (models_mae.py:130-147: pre-softmax q·kᵀ·scale and
    the context tensor).
  * linear probes (models_mae.py:712-739): LayerNorm → bias-free Linear on
    pooled (classification) or per-token (segmentation) latents.

These paths use unrolled Python loops over per-block param lists (depths are
static and small); the production arch keeps the scanned fast path in
models/vmae.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import (
    dense,
    layer_norm,
    mlp_gelu,
    multi_head_attention,
    random_masking,
    unshuffle_with_mask_tokens,
)
from .vmae import VMAEConsts, VMAESpec, _conv2d, _decoder_pred

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Block with LayerScale / DropPath / attn-map capture
# ---------------------------------------------------------------------------


def vit_block(
    x: jnp.ndarray,
    bp: Params,
    num_heads: int,
    *,
    drop_path_rate: float = 0.0,
    drop_key: Optional[jax.Array] = None,
    return_attn_map: bool = False,
    attn_impl: str = "xla",
):
    """Pre-LN ViT block with optional LayerScale (ls1/ls2 params) and
    DropPath (per-sample residual drop, train-time only)."""

    def drop_path(h, key):
        if drop_path_rate <= 0.0 or key is None:
            return h
        keep = 1.0 - drop_path_rate
        mask = jax.random.bernoulli(key, keep, (h.shape[0],) + (1,) * (h.ndim - 1))
        return h * mask.astype(h.dtype) / keep

    k1 = k2 = None
    if drop_key is not None:
        k1, k2 = jax.random.split(drop_key)

    h = layer_norm(x, bp["norm1"]["scale"], bp["norm1"]["bias"], eps=1e-6)
    attn_maps = None
    if return_attn_map:
        out, attn_maps = attention_with_maps(h, bp["attn"], num_heads)
    else:
        out = multi_head_attention(h, bp["attn"], num_heads, impl=attn_impl)
    if "ls1" in bp:
        out = out * bp["ls1"]["gamma"].astype(out.dtype)
    x = x + drop_path(out, k1)

    h = layer_norm(x, bp["norm2"]["scale"], bp["norm2"]["bias"], eps=1e-6)
    out = mlp_gelu(h, bp["mlp"], approximate=False)
    if "ls2" in bp:
        out = out * bp["ls2"]["gamma"].astype(out.dtype)
    x = x + drop_path(out, k2)
    if return_attn_map:
        return x, attn_maps
    return x


def attention_with_maps(x: jnp.ndarray, p: Params, num_heads: int):
    """Attention returning [pre-softmax q·kᵀ·scale, context] like
    models_mae.py:130-147."""
    b, n, d = x.shape
    hd = d // num_heads
    w = p["qkv"]["w"].reshape(d, 3 * d)
    qkv = x @ w + p["qkv"]["b"].reshape(3 * d)
    qkv = qkv.reshape(b, n, 3, num_heads, hd)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    scale = hd**-0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    weights = jax.nn.softmax(logits, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, d)
    out = dense(ctx, p["proj"])
    return out, [logits, ctx]


# ---------------------------------------------------------------------------
# Token-grid Downsample / Upsample (models_mae.py:189-230)
# ---------------------------------------------------------------------------


def token_downsample(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """(B, N, C) -> (B, N/4, C): stride-2 conv with (0,1,0,1) pad."""
    b, n, c = x.shape
    h = int(round(n**0.5))
    grid = x.reshape(b, h, h, c).transpose(0, 3, 1, 2).astype(jnp.float32)
    grid = jnp.pad(grid, ((0, 0), (0, 0), (0, 1), (0, 1)))
    out = jax.lax.conv_general_dilated(
        grid, p["w"].astype(jnp.float32), (2, 2), [(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    ) + p["b"].reshape(1, -1, 1, 1)
    b2, c2, h2, w2 = out.shape
    return out.reshape(b2, c2, h2 * w2).transpose(0, 2, 1).astype(x.dtype)


def token_upsample(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """(B, N, C) -> (B, 4N, C): nearest-×2 + 3×3 conv."""
    b, n, c = x.shape
    h = int(round(n**0.5))
    grid = x.reshape(b, h, h, c).transpose(0, 3, 1, 2).astype(jnp.float32)
    grid = jax.image.resize(grid, (b, c, h * 2, h * 2), method="nearest")
    out = _conv2d(grid, p["w"], p["b"], [(1, 1), (1, 1)])
    b2, c2, h2, w2 = out.shape
    return out.reshape(b2, c2, h2 * w2).transpose(0, 2, 1).astype(x.dtype)


def _maybe_remat(block_fn, spec: VMAESpec, num_heads: int, attn_impl: str):
    """Honor spec.use_checkpoint in the unrolled gradual loops (the stacked
    paths do this inside models/vmae). Returns f(x, bp)."""

    def f(x, bp):
        return block_fn(x, bp, num_heads, attn_impl=attn_impl)

    if not getattr(spec, "use_checkpoint", False):
        return f
    return jax.checkpoint(f)


# ---------------------------------------------------------------------------
# gradual_resol forward paths
# ---------------------------------------------------------------------------


def forward_encoder_with_mask(
    params: Params,
    spec: VMAESpec,
    consts: VMAEConsts,
    imgs: jnp.ndarray,
    mask_ratio: float,
    key: jax.Array,
    downsample_after: int,
    attn_impl: str = "xla",
    mask_noise=None,
):
    """models_mae.py:559-596: patchify → mask → reinsert mask tokens →
    +PE → blocks (Downsample inserted after ``downsample_after`` blocks).

    mask_noise: optional deterministic shuffle-noise override for
    cross-framework parity tests (see tests/test_grad_parity.py)."""
    from ..ops.patchify import patch_embed

    x = patch_embed(imgs, params["patch_embed"], spec.patch_size)
    x, mask, ids_restore = random_masking(key, x, mask_ratio, noise=mask_noise)
    x = unshuffle_with_mask_tokens(x, params["mask_token"], ids_restore)
    x = x + consts.pos_embed.astype(x.dtype)[None]
    block = _maybe_remat(vit_block, spec, spec.num_heads, attn_impl)
    for i, bp in enumerate(params["blocks"]):
        x = block(x, bp)
        if i == downsample_after - 1:
            x = token_downsample(x, params["encoder_downsample"])
    x = layer_norm(x, params["norm"]["scale"], params["norm"]["bias"], eps=1e-6)
    return x, mask, ids_restore


def forward_decoder_without_mask(
    params: Params,
    spec: VMAESpec,
    consts: VMAEConsts,
    x: jnp.ndarray,
    upsample_after: int,
    attn_impl: str = "xla",
) -> jnp.ndarray:
    """models_mae.py:598-627: decoder on the downsampled grid, Upsample
    inserted after ``upsample_after`` blocks; no unshuffle."""
    x = dense(x, params["decoder_embed"])
    x = x + consts.decoder_pos_embed.astype(x.dtype)[None]
    block = _maybe_remat(vit_block, spec, spec.decoder_num_heads, attn_impl)
    for i, bp in enumerate(params["decoder_blocks"]):
        x = block(x, bp)
        if i == upsample_after - 1:
            x = token_upsample(x, params["decoder_upsample"])
    x = layer_norm(x, params["decoder_norm"]["scale"], params["decoder_norm"]["bias"], eps=1e-6)
    return _decoder_pred(x, params["decoder_pred"], spec)


def init_gradual_params(key: jax.Array, spec: VMAESpec, finetune_downsample_layer=None) -> Tuple[Params, int, int]:
    """Params for the gradual_resol variant: unstacked block lists + the
    token Down/Upsample convs. Returns (params, downsample_after,
    upsample_after). Note the reference halves patch_size in its ctor
    (models_mae.py:310-312) — pass the already-halved patch in the spec."""
    from .vmae import init_vmae_params

    base = init_vmae_params(key, spec)
    downsize = spec.depth // 2 if finetune_downsample_layer is None else finetune_downsample_layer
    upsize = spec.decoder_depth - downsize

    def unstack(tree, depth):
        return [
            jax.tree_util.tree_map(lambda x: x[i], tree) for i in range(depth)
        ]

    k1, k2 = jax.random.split(jax.random.fold_in(key, 1))
    d, dd = spec.embed_dim, spec.decoder_embed_dim
    params = dict(base)
    params["blocks"] = unstack(base["blocks"], spec.depth)
    params["decoder_blocks"] = unstack(base["decoder_blocks"], spec.decoder_depth)
    params["encoder_downsample"] = {
        "w": jax.random.normal(k1, (d, d, 3, 3)) * (1.0 / np.sqrt(9 * d)),
        "b": jnp.zeros((d,)),
    }
    params["decoder_upsample"] = {
        "w": jax.random.normal(k2, (dd, dd, 3, 3)) * (1.0 / np.sqrt(9 * dd)),
        "b": jnp.zeros((dd,)),
    }
    if "mask_token" not in params:
        params["mask_token"] = jax.random.normal(jax.random.fold_in(key, 2), (dd,)) * 0.02
    return params, downsize, upsize


class GradualConsts:
    """Positional tables for the gradual variant: encoder PE on the full
    (half-patch) grid, decoder PE on the /2 (post-Downsample) grid
    (models_mae.py:335-350 with gradual_resol)."""

    def __init__(self, spec: VMAESpec):
        from ..ops import get_2d_sincos_pos_embed

        self.pos_embed = jnp.asarray(
            get_2d_sincos_pos_embed(spec.embed_dim, spec.grid)
        )
        self.decoder_pos_embed = jnp.asarray(
            get_2d_sincos_pos_embed(spec.decoder_embed_dim, spec.grid // 2)
        )


def forward_vanilla_gradual(
    params: Params,
    spec: VMAESpec,
    consts,
    imgs: jnp.ndarray,
    key: jax.Array,
    downsample_after: int,
    upsample_after: int,
    mask_ratio: float = 0.75,
    visible_loss_ratio: float = 0.5,
    perceptual_loss_fn=None,
    compute_dtype=jnp.float32,
    attn_impl: str = "xla",
    mask_noise=None,
    latent_noise=None,
) -> Dict[str, jnp.ndarray]:
    """Stage-1 training forward for ``--gradual_resol``
    (models_mae.py:773-807 with the gradual encoder/decoder substituted at
    775/797; loss assembly identical to models/vmae.forward_vanilla).

    mask_noise / latent_noise: optional deterministic overrides of the two
    random draws for cross-framework parity tests."""
    from ..ops import patchify, unpatchify
    from ..ops.gaussian import diagonal_gaussian
    from .vmae import _to_latent

    k_mask, k_sample = jax.random.split(key)
    latent, mask, ids_restore = forward_encoder_with_mask(
        params, spec, consts, imgs.astype(compute_dtype), mask_ratio, k_mask,
        downsample_after, attn_impl=attn_impl, mask_noise=mask_noise,
    )
    latent = _to_latent(latent, params["to_latent"], spec)

    kl_loss = None
    if spec.kl_loss_weight is not None:
        n_tokens = latent.shape[1]
        moments = latent.astype(jnp.float32).transpose(0, 2, 1)
        posterior = diagonal_gaussian(moments, axis=1)
        kl = posterior.kl(fixed_std=spec.fixed_std)
        kl_loss = jnp.sum(kl) / kl.shape[0] / n_tokens
        latent = (
            posterior.sample(k_sample, noise=latent_noise)
            .transpose(0, 2, 1)
            .astype(compute_dtype)
        )

    latent = _to_latent(latent, params["from_latent"], spec)
    pred = forward_decoder_without_mask(
        params, spec, consts, latent, upsample_after, attn_impl=attn_impl
    )

    target = patchify(imgs, spec.patch_size)
    if spec.norm_pix_loss:
        mean = target.mean(axis=-1, keepdims=True)
        var = target.var(axis=-1, keepdims=True)
        target = (target - mean) / (var + 1e-6) ** 0.5
    loss = jnp.mean((pred.astype(jnp.float32) - target) ** 2, axis=-1)
    mask = mask.astype(jnp.float32)
    visible_loss = jnp.sum(loss * (1 - mask)) / jnp.sum(1 - mask)
    mask_loss = jnp.sum(loss * mask) / jnp.sum(mask)
    loss = (1 - visible_loss_ratio) * mask_loss + visible_loss_ratio * visible_loss

    if perceptual_loss_fn is not None:
        p_loss = jnp.mean(
            perceptual_loss_fn(imgs, unpatchify(pred.astype(jnp.float32), spec.patch_size, 3))
        )
        loss = loss + spec.perceptual_loss_ratio * p_loss
    else:
        p_loss = jnp.zeros_like(loss)
    if kl_loss is not None:
        loss = loss + spec.kl_loss_weight * kl_loss
    return {
        "loss": loss,
        "pred": pred,
        "mask": mask,
        "vis_loss": visible_loss,
        "mask_loss": mask_loss,
        "kl_loss": kl_loss if kl_loss is not None else jnp.zeros(()),
        "p_loss": p_loss,
    }


# ---------------------------------------------------------------------------
# Linear probes (models_mae.py:712-739)
# ---------------------------------------------------------------------------


def init_probe_head(key: jax.Array, latent_dim: int, num_classes: int) -> Params:
    return {
        "norm": {"scale": jnp.ones((latent_dim,)), "bias": jnp.zeros((latent_dim,))},
        "linear": {
            "w": jax.random.normal(key, (latent_dim, num_classes)) * (latent_dim**-0.5)
        },
    }


def linear_probe(
    params: Params, spec: VMAESpec, consts: VMAEConsts, head: Params,
    images: jnp.ndarray,
) -> jnp.ndarray:
    """Frozen-encoder classification probe: encode → global pool →
    LayerNorm → bias-free Linear (models_mae.py:727-739)."""
    from .vmae import ldmae_encode_moments
    from ..ops.gaussian import diagonal_gaussian

    moments = jax.lax.stop_gradient(
        ldmae_encode_moments(params, spec, consts, images)
    )
    if spec.kl_loss_weight is not None:
        z = diagonal_gaussian(moments, axis=1).mode()
    else:
        z = moments
    b, c, h, w = z.shape
    x = z.reshape(b, c, h * w).transpose(0, 2, 1)  # B N D
    x = x.mean(axis=1)
    x = layer_norm(x, head["norm"]["scale"], head["norm"]["bias"])
    return dense(x, head["linear"])


def linear_probe_seg(
    params: Params, spec: VMAESpec, consts: VMAEConsts, head: Params,
    images: jnp.ndarray,
) -> jnp.ndarray:
    """Per-token segmentation probe (models_mae.py:712-725): (B·N, classes)."""
    from .vmae import ldmae_encode_moments
    from ..ops.gaussian import diagonal_gaussian

    moments = jax.lax.stop_gradient(
        ldmae_encode_moments(params, spec, consts, images)
    )
    if spec.kl_loss_weight is not None:
        z = diagonal_gaussian(moments, axis=1).mode()
    else:
        z = moments
    b, c, h, w = z.shape
    x = z.reshape(b, c, h * w).transpose(0, 2, 1).reshape(b * h * w, c)
    x = layer_norm(x, head["norm"]["scale"], head["norm"]["bias"])
    return dense(x, head["linear"])
