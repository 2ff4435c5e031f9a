"""VMAE — variational masked-autoencoder tokenizer, TPU-native.

Functional re-design of ``MaskedAutoencoderViT``
(/root/reference/VMAE/models_mae.py:283-1010): ViT-MAE encoder + ViT decoder
with a variational low-dim bottleneck (to_latent → DiagonalGaussian →
from_latent), serving three roles:

  * MAE pretraining (stage 1): masked encoder, KL bottleneck, decoder
    reconstruction with visible/masked MSE split + optional LPIPS
  * decoder finetune (stage 3, ``ldmae_mode``): full-image round trip,
    pixel MSE + LPIPS
  * diffusers-style VAE docking (encode→moments / decode) used by feature
    extraction, diffusion sampling and tokenizer eval

TPU design: block loop is ``lax.scan`` over stacked params; the fixed sin-cos
positional tables are constants recomputed per resolution (this subsumes
pe_reset.py — resizing is free); patch embedding is patchify+matmul.

The production arch is ``mae_for_ldmae_f8d16_prev`` (models_mae.py:1029-1034):
patch 8, dims 192/192, depth 12/12, heads 12/12, latent 16, with
``no_cls=True, kl_loss_weight, smooth_output=True`` (linear pred + 3×3 conv
smoother on RGB — models_mae.py:244-281).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import (
    DiagonalGaussian,
    dense,
    diagonal_gaussian,
    get_2d_sincos_pos_embed,
    layer_norm,
    mlp_gelu,
    multi_head_attention,
    patchify,
    random_masking,
    unpatchify,
    unshuffle_with_mask_tokens,
)
from ..ops.patchify import patch_embed

Params = Dict[str, Any]


@dataclass(frozen=True)
class VMAESpec:
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 16
    mlp_ratio: float = 4.0
    norm_pix_loss: bool = False
    latent_dim: int = 32
    ldmae_mode: bool = False
    scaling_factor: float = 0.9654248952865601
    no_cls: bool = True
    down_nonlinear: bool = False
    kl_loss_weight: Optional[float] = None  # truthy flag AND loss weight
    smooth_output: bool = False
    pred_with_conv: bool = False
    perceptual_loss_ratio: float = 1.0
    fixed_std: Optional[float] = None
    use_checkpoint: bool = False  # per-block remat (memory knob; see _run_blocks)

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid**2

    @property
    def num_extra_tokens(self) -> int:
        return 0 if self.no_cls else 1

    @property
    def encoder_latent_dim(self) -> int:
        # kl head predicts mean & logvar (models_mae.py:306-309)
        return 2 * self.latent_dim if self.kl_loss_weight is not None else self.latent_dim

    @property
    def latent_resolution(self) -> int:
        return self.grid


class VMAEConsts:
    def __init__(self, spec: VMAESpec):
        self.pos_embed = jnp.asarray(
            get_2d_sincos_pos_embed(
                spec.embed_dim,
                spec.grid,
                cls_token=not spec.no_cls,
                extra_tokens=spec.num_extra_tokens,
            )
        )
        self.decoder_pos_embed = jnp.asarray(
            get_2d_sincos_pos_embed(
                spec.decoder_embed_dim,
                spec.grid,
                cls_token=not spec.no_cls,
                extra_tokens=spec.num_extra_tokens,
            )
        )


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _xavier(key, shape, fan_in, fan_out):
    a = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, minval=-a, maxval=a, dtype=jnp.float32)


def _init_blocks(keys, l: int, d: int, mlp_hidden: int) -> Params:
    def stack(f):
        return jnp.stack([f(next(keys)) for _ in range(l)])

    return {
        "norm1": {"scale": jnp.ones((l, d)), "bias": jnp.zeros((l, d))},
        "attn": {
            "qkv": {"w": stack(lambda k: _xavier(k, (d, 3, d), d, 3 * d)), "b": jnp.zeros((l, 3, d))},
            "proj": {"w": stack(lambda k: _xavier(k, (d, d), d, d)), "b": jnp.zeros((l, d))},
        },
        "norm2": {"scale": jnp.ones((l, d)), "bias": jnp.zeros((l, d))},
        "mlp": {
            "fc1": {"w": stack(lambda k: _xavier(k, (d, mlp_hidden), d, mlp_hidden)), "b": jnp.zeros((l, mlp_hidden))},
            "fc2": {"w": stack(lambda k: _xavier(k, (mlp_hidden, d), mlp_hidden, d)), "b": jnp.zeros((l, d))},
        },
    }


def init_vmae_params(key: jax.Array, spec: VMAESpec) -> Params:
    """Matches initialize_weights (models_mae.py:411-445): xavier linears,
    N(0,.02) cls/mask tokens, unit LayerNorms."""
    keys = iter(jax.random.split(key, 256))
    d, dd = spec.embed_dim, spec.decoder_embed_dim
    p = spec.patch_size
    pin = p * p * spec.in_chans

    params: Params = {
        "patch_embed": {"w": _xavier(next(keys), (pin, d), pin, d), "b": jnp.zeros((d,))},
        "blocks": _init_blocks(keys, spec.depth, d, int(d * spec.mlp_ratio)),
        "norm": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "decoder_embed": {"w": _xavier(next(keys), (d, dd), d, dd), "b": jnp.zeros((dd,))},
        "decoder_blocks": _init_blocks(keys, spec.decoder_depth, dd, int(dd * spec.mlp_ratio)),
        "decoder_norm": {"scale": jnp.ones((dd,)), "bias": jnp.zeros((dd,))},
    }
    if not spec.no_cls:
        params["cls_token"] = jax.random.normal(next(keys), (d,)) * 0.02
    if not spec.ldmae_mode:
        params["mask_token"] = jax.random.normal(next(keys), (dd,)) * 0.02

    eld = spec.encoder_latent_dim
    if spec.down_nonlinear:
        h = spec.latent_dim * 4
        params["to_latent"] = {
            "fc1": {"w": _xavier(next(keys), (d, h), d, h), "b": jnp.zeros((h,))},
            "fc2": {"w": _xavier(next(keys), (h, eld), h, eld), "b": jnp.zeros((eld,))},
        }
        params["from_latent"] = {
            "fc1": {"w": _xavier(next(keys), (spec.latent_dim, h), spec.latent_dim, h), "b": jnp.zeros((h,))},
            "fc2": {"w": _xavier(next(keys), (h, d), h, d), "b": jnp.zeros((d,))},
        }
    else:
        params["to_latent"] = {"w": _xavier(next(keys), (d, eld), d, eld), "b": jnp.zeros((eld,))}
        params["from_latent"] = {"w": _xavier(next(keys), (spec.latent_dim, d), spec.latent_dim, d), "b": jnp.zeros((d,))}

    if spec.smooth_output:
        if spec.pred_with_conv:
            # Conv2d(dec_dim, p²·3, k=2) on the token grid (models_mae.py:251)
            params["decoder_pred"] = {
                "conv_smoother": {
                    "w": _xavier(next(keys), (pin, dd, 2, 2), dd * 4, pin),
                    "b": jnp.zeros((pin,)),
                }
            }
        else:
            # linear pred + Conv2d(3,3,k=3,p=1) on RGB (models_mae.py:254-255)
            params["decoder_pred"] = {
                "linear_pred": {"w": _xavier(next(keys), (dd, pin), dd, pin), "b": jnp.zeros((pin,))},
                "conv_smoother": {
                    "w": _xavier(next(keys), (3, 3, 3, 3), 27, 3),
                    "b": jnp.zeros((3,)),
                },
            }
    else:
        params["decoder_pred"] = {"w": _xavier(next(keys), (dd, pin), dd, pin), "b": jnp.zeros((pin,))}
    return params


# ---------------------------------------------------------------------------
# Forward pieces
# ---------------------------------------------------------------------------


def _block(x: jnp.ndarray, bp: Params, num_heads: int, attn_impl: str) -> jnp.ndarray:
    """Pre-LN ViT block (models_mae.py:149-187), eps 1e-6."""
    h = layer_norm(x, bp["norm1"]["scale"], bp["norm1"]["bias"], eps=1e-6)
    x = x + multi_head_attention(h, bp["attn"], num_heads, impl=attn_impl)
    h = layer_norm(x, bp["norm2"]["scale"], bp["norm2"]["bias"], eps=1e-6)
    x = x + mlp_gelu(h, bp["mlp"], approximate=False)
    return x


def _run_blocks(
    x: jnp.ndarray, blocks: Params, num_heads: int, attn_impl: str,
    remat: bool = False,
) -> jnp.ndarray:
    block_fn = _block
    if remat:
        # per-block rematerialisation: stage-3 training at 256² (1024 tokens)
        # with the LPIPS VGG head needs 18.9 GB of activations unremat'd —
        # past v5e's 15.75 GB HBM (the reference trains on 80 GB A100s and
        # never hits this, train_ae.sh:84-106)
        block_fn = jax.checkpoint(_block, static_argnums=(2, 3))

    def body(carry, bp):
        return block_fn(carry, bp, num_heads, attn_impl), None

    out, _ = jax.lax.scan(body, x, blocks)
    return out


def _conv2d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, padding) -> jnp.ndarray:
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w.astype(jnp.float32),
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + b.reshape(1, -1, 1, 1)


def _decoder_pred(x: jnp.ndarray, p: Params, spec: VMAESpec) -> jnp.ndarray:
    """decoder head: (B, L, dd) -> (B, L, p²·3). Three variants
    (models_mae.py:244-281, 398-403)."""
    if not spec.smooth_output:
        return dense(x, p)
    ps = spec.patch_size
    b, l, _ = x.shape
    h = w = int(round(l**0.5))
    if spec.pred_with_conv:
        grid = x.reshape(b, h, w, -1).transpose(0, 3, 1, 2)  # B dd h w
        # pad right/bottom by 1, conv k=2 -> same h,w
        out = _conv2d(grid, p["conv_smoother"]["w"], p["conv_smoother"]["b"], [(0, 1), (0, 1)])
        return out.reshape(b, -1, h * w).transpose(0, 2, 1).astype(x.dtype)
    out = dense(x, p["linear_pred"])  # B L p²·3
    img = unpatchify(out.astype(jnp.float32), ps, 3)  # B 3 H W
    img = _conv2d(img, p["conv_smoother"]["w"], p["conv_smoother"]["b"], [(1, 1), (1, 1)])
    return patchify(img, ps).astype(x.dtype)


def _to_latent(x, p, spec):
    if spec.down_nonlinear:
        return mlp_gelu(x, p, approximate=False)
    return dense(x, p)


def _add_cls(x: jnp.ndarray, params: Params, consts: VMAEConsts, spec: VMAESpec) -> jnp.ndarray:
    cls = params["cls_token"].astype(x.dtype) + consts.pos_embed[0].astype(x.dtype)
    cls = jnp.broadcast_to(cls[None, None, :], (x.shape[0], 1, x.shape[-1]))
    return jnp.concatenate([cls, x], axis=1)


def _encoder_tokens(
    params: Params, spec: VMAESpec, consts: VMAEConsts, imgs: jnp.ndarray,
    compute_dtype, attn_impl: str,
) -> jnp.ndarray:
    """Full-image (unmasked) encoder: patch_embed -> +PE -> blocks -> norm."""
    x = patch_embed(imgs.astype(compute_dtype), params["patch_embed"], spec.patch_size, compute_dtype=compute_dtype)
    pe = consts.pos_embed.astype(compute_dtype)
    if spec.no_cls:
        x = x + pe[None]
    else:
        x = x + pe[None, 1:, :]
        x = _add_cls(x, params, consts, spec)
    x = _run_blocks(x, params["blocks"], spec.num_heads, attn_impl, spec.use_checkpoint)
    return layer_norm(x, params["norm"]["scale"], params["norm"]["bias"], eps=1e-6)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def forward_encoder(
    params: Params, spec: VMAESpec, consts: VMAEConsts, imgs: jnp.ndarray,
    mask_ratio: float, key: jax.Array,
    compute_dtype=jnp.float32, attn_impl: str = "xla",
    mask_noise=None,
):
    """Masked encoder (models_mae.py:502-526). Returns (x, mask, ids_restore)."""
    x = patch_embed(imgs.astype(compute_dtype), params["patch_embed"], spec.patch_size, compute_dtype=compute_dtype)
    pe = consts.pos_embed.astype(compute_dtype)
    x = x + (pe[None] if spec.no_cls else pe[None, 1:, :])
    x, mask, ids_restore = random_masking(key, x, mask_ratio, noise=mask_noise)
    if not spec.no_cls:
        x = _add_cls(x, params, consts, spec)
    x = _run_blocks(x, params["blocks"], spec.num_heads, attn_impl, spec.use_checkpoint)
    x = layer_norm(x, params["norm"]["scale"], params["norm"]["bias"], eps=1e-6)
    return x, mask, ids_restore


def forward_decoder(
    params: Params, spec: VMAESpec, consts: VMAEConsts,
    x: jnp.ndarray, ids_restore: jnp.ndarray, attn_impl: str = "xla",
) -> jnp.ndarray:
    """Decoder with mask-token unshuffle (models_mae.py:528-557)."""
    x = dense(x, params["decoder_embed"])
    if not spec.no_cls:
        cls, rest = x[:, :1], x[:, 1:]
        rest = unshuffle_with_mask_tokens(rest, params["mask_token"], ids_restore)
        x = jnp.concatenate([cls, rest], axis=1)
    else:
        x = unshuffle_with_mask_tokens(x, params["mask_token"], ids_restore)
    x = x + consts.decoder_pos_embed.astype(x.dtype)[None]
    x = _run_blocks(x, params["decoder_blocks"], spec.decoder_num_heads, attn_impl, spec.use_checkpoint)
    x = layer_norm(x, params["decoder_norm"]["scale"], params["decoder_norm"]["bias"], eps=1e-6)
    x = _decoder_pred(x, params["decoder_pred"], spec)
    if not spec.no_cls:
        x = x[:, 1:, :]
    return x


def ldmae_encode_moments(
    params: Params, spec: VMAESpec, consts: VMAEConsts, imgs: jnp.ndarray,
    compute_dtype=jnp.float32, attn_impl: str = "xla",
) -> jnp.ndarray:
    """Docking `_encode` (models_mae.py:836-853): raw to_latent output
    (2·latent_dim channels when variational) as (B, C, h, w)."""
    x = _encoder_tokens(params, spec, consts, imgs, compute_dtype, attn_impl)
    if not spec.no_cls:
        x = x[:, 1:, :]
    x = _to_latent(x, params["to_latent"], spec)
    r = spec.latent_resolution
    return x.transpose(0, 2, 1).reshape(x.shape[0], -1, r, r).astype(jnp.float32)


def encode(
    params: Params, spec: VMAESpec, consts: VMAEConsts, imgs: jnp.ndarray,
    compute_dtype=jnp.float32, attn_impl: str = "xla",
) -> DiagonalGaussian:
    """Docking `encode` → posterior over (B, latent_dim, h, w)."""
    moments = ldmae_encode_moments(params, spec, consts, imgs, compute_dtype, attn_impl)
    if spec.kl_loss_weight is not None:
        return diagonal_gaussian(moments, axis=1)
    return DiagonalGaussian(mean=moments, logvar=jnp.full_like(moments, -jnp.inf))


def decode(
    params: Params, spec: VMAESpec, consts: VMAEConsts, z: jnp.ndarray,
    compute_dtype=jnp.float32, attn_impl: str = "xla",
) -> jnp.ndarray:
    """Docking `decode` (models_mae.py:902-924): (B, latent_dim, h, w) -> imgs."""
    b, c, h, w = z.shape
    x = z.reshape(b, c, h * w).transpose(0, 2, 1).astype(compute_dtype)
    x = _to_latent(x, params["from_latent"], spec)  # from_latent
    x = dense(x, params["decoder_embed"])
    pe = consts.decoder_pos_embed.astype(x.dtype)
    x = x + (pe[None] if spec.no_cls else pe[None, 1:, :])
    x = _run_blocks(x, params["decoder_blocks"], spec.decoder_num_heads, attn_impl, spec.use_checkpoint)
    x = layer_norm(x, params["decoder_norm"]["scale"], params["decoder_norm"]["bias"], eps=1e-6)
    x = _decoder_pred(x, params["decoder_pred"], spec)
    return unpatchify(x.astype(jnp.float32), spec.patch_size, 3)


def forward_vanilla(
    params: Params, spec: VMAESpec, consts: VMAEConsts, imgs: jnp.ndarray,
    key: jax.Array, mask_ratio: float = 0.75, visible_loss_ratio: float = 0.5,
    perceptual_loss_fn=None, compute_dtype=jnp.float32, attn_impl: str = "xla",
    mask_noise=None, latent_noise=None,
) -> Dict[str, jnp.ndarray]:
    """Stage-1 training forward (models_mae.py:773-807).

    mask_noise / latent_noise: optional deterministic overrides of the two
    random draws (shuffle noise, posterior eps) so torch-side parity tests
    can share the exact stream (see tests/test_grad_parity.py)."""
    k_mask, k_sample = jax.random.split(key)
    latent, mask, ids_restore = forward_encoder(
        params, spec, consts, imgs, mask_ratio, k_mask, compute_dtype, attn_impl,
        mask_noise=mask_noise,
    )
    latent = _to_latent(latent, params["to_latent"], spec)

    kl_loss = None
    if spec.kl_loss_weight is not None:
        n_tokens = latent.shape[1]
        moments = latent.astype(jnp.float32).transpose(0, 2, 1)  # B D N
        posterior = diagonal_gaussian(moments, axis=1)
        kl = posterior.kl(fixed_std=spec.fixed_std)  # per-sample sum
        kl_loss = jnp.sum(kl) / kl.shape[0] / n_tokens  # per patch
        latent = (
            posterior.sample(k_sample, noise=latent_noise)
            .transpose(0, 2, 1)
            .astype(compute_dtype)
        )

    latent = _to_latent(latent, params["from_latent"], spec)
    pred = forward_decoder(params, spec, consts, latent, ids_restore, attn_impl)

    # loss (models_mae.py:741-771)
    target = patchify(imgs, spec.patch_size)
    if spec.norm_pix_loss:
        mean = target.mean(axis=-1, keepdims=True)
        var = target.var(axis=-1, keepdims=True)
        target = (target - mean) / (var + 1e-6) ** 0.5
    loss = jnp.mean((pred.astype(jnp.float32) - target) ** 2, axis=-1)  # B L
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


def reconstruct(
    params: Params, spec: VMAESpec, consts: VMAEConsts, imgs: jnp.ndarray,
    key: Optional[jax.Array] = None, use_mode: bool = True,
    compute_dtype=jnp.float32, attn_impl: str = "xla",
    stop_encoder_gradient: bool = True,
) -> jnp.ndarray:
    """Full-image encode→decode returning patched pred (models_mae.py:697-710).

    ``stop_encoder_gradient`` mirrors the reference's no_grad encode in
    stage-3 decoder tuning (there mask_ratio!=0 gates it; here explicit).
    """
    x = _encoder_tokens(params, spec, consts, imgs, compute_dtype, attn_impl)
    if not spec.no_cls:
        x = x[:, 1:, :]
    latent = _to_latent(x, params["to_latent"], spec)
    if spec.kl_loss_weight is not None:
        moments = latent.astype(jnp.float32).transpose(0, 2, 1)
        posterior = diagonal_gaussian(moments, axis=1)
        z = posterior.mode() if use_mode or key is None else posterior.sample(key)
        latent = z.transpose(0, 2, 1).astype(compute_dtype)
    if stop_encoder_gradient:
        latent = jax.lax.stop_gradient(latent)
    # ldmae_decoding (models_mae.py:661-695)
    x = _to_latent(latent, params["from_latent"], spec)
    x = dense(x, params["decoder_embed"])
    pe = consts.decoder_pos_embed.astype(x.dtype)
    x = x + (pe[None] if spec.no_cls else pe[None, 1:, :])
    x = _run_blocks(x, params["decoder_blocks"], spec.decoder_num_heads, attn_impl, spec.use_checkpoint)
    x = layer_norm(x, params["decoder_norm"]["scale"], params["decoder_norm"]["bias"], eps=1e-6)
    x = _decoder_pred(x, params["decoder_pred"], spec)
    if not spec.no_cls:
        x = x[:, 1:, :]
    return x


def forward_ldmae(
    params: Params, spec: VMAESpec, consts: VMAEConsts, imgs: jnp.ndarray,
    key: Optional[jax.Array] = None, perceptual_loss_fn=None,
    compute_dtype=jnp.float32, attn_impl: str = "xla",
) -> Dict[str, jnp.ndarray]:
    """Stage-3 decoder-tune forward (models_mae.py:809-826)."""
    pred = reconstruct(
        params, spec, consts, imgs, key=key, use_mode=key is None,
        compute_dtype=compute_dtype, attn_impl=attn_impl,
        stop_encoder_gradient=True,
    )
    recon = unpatchify(pred.astype(jnp.float32), spec.patch_size, 3)
    vis_loss = (recon - imgs) ** 2
    if perceptual_loss_fn is not None:
        p_loss = perceptual_loss_fn(imgs, recon)
        loss = jnp.mean(vis_loss) + spec.perceptual_loss_ratio * jnp.mean(p_loss)
    else:
        p_loss = jnp.zeros(())
        loss = jnp.mean(vis_loss)
    return {
        "loss": loss,
        "pred": pred,
        "vis_loss": jnp.mean(vis_loss),
        "p_loss": jnp.mean(p_loss),
    }


def decode_to_images(params, spec, consts, z, compute_dtype=jnp.float32, attn_impl="xla"):
    """decode → uint8 HWC (models_mae.py:1000-1010): clamp(127.5x+128, 0, 255)."""
    imgs = decode(params, spec, consts, z, compute_dtype, attn_impl)
    imgs = jnp.clip(127.5 * imgs + 128.0, 0, 255)
    return imgs.transpose(0, 2, 3, 1).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Factories (models_mae.py:1014-1134)
# ---------------------------------------------------------------------------

_BASE = dict(mlp_ratio=4.0)

_FACTORIES = {
    "mae_for_ldmae": dict(img_size=128, patch_size=8, embed_dim=192, depth=12, num_heads=12, decoder_embed_dim=192, decoder_depth=12, decoder_num_heads=12, latent_dim=32),
    "mae_for_ldmae_f8d32": dict(img_size=128, patch_size=8, embed_dim=192, depth=12, num_heads=12, decoder_embed_dim=192, decoder_depth=12, decoder_num_heads=12, latent_dim=32),
    "mae_for_ldmae_f8d16_prev": dict(patch_size=8, embed_dim=192, depth=12, num_heads=12, decoder_embed_dim=192, decoder_depth=12, decoder_num_heads=12, latent_dim=16),
    "mae_for_ldmae_f8d16_small": dict(patch_size=8, embed_dim=96, depth=12, num_heads=8, decoder_embed_dim=96, decoder_depth=12, decoder_num_heads=8, latent_dim=16),
    "mae_for_ldmae_f8d16_asym_small": dict(patch_size=8, embed_dim=96, depth=12, num_heads=8, decoder_embed_dim=192, decoder_depth=12, decoder_num_heads=12, latent_dim=16),
    "mae_for_ldmae_f8d16_prev_large": dict(patch_size=8, embed_dim=384, depth=12, num_heads=16, decoder_embed_dim=384, decoder_depth=12, decoder_num_heads=16, latent_dim=16),
    "mae_for_ldmae_f8d16": dict(patch_size=8, embed_dim=192, depth=12, num_heads=12, decoder_embed_dim=384, decoder_depth=12, decoder_num_heads=24, latent_dim=16, down_nonlinear=True),
    "mae_for_ldmae_f8d16_flexible": dict(patch_size=8, embed_dim=192, depth=12, num_heads=12, decoder_embed_dim=384, decoder_depth=12, decoder_num_heads=24, latent_dim=16, down_nonlinear=True),
    "mae_for_ldmae_f16d32": dict(img_size=128, patch_size=16, embed_dim=192, depth=12, num_heads=12, decoder_embed_dim=192, decoder_depth=12, decoder_num_heads=12, latent_dim=32),
    "mae_for_ldmae_f16d32_large": dict(img_size=128, patch_size=16, embed_dim=384, depth=12, num_heads=12, decoder_embed_dim=384, decoder_depth=12, decoder_num_heads=12, latent_dim=32),
    "mae_for_ldmae_f8d32_flexible": dict(patch_size=8, embed_dim=192, depth=12, num_heads=12, decoder_embed_dim=192, decoder_depth=12, decoder_num_heads=12, latent_dim=32),
    "mae_for_ldmae_16d": dict(img_size=128, patch_size=8, embed_dim=192, depth=12, num_heads=12, decoder_embed_dim=192, decoder_depth=12, decoder_num_heads=12, latent_dim=16),
    "mae_vit_base_patch16": dict(patch_size=16, embed_dim=768, depth=12, num_heads=12, decoder_embed_dim=512, decoder_depth=8, decoder_num_heads=16),
    "mae_vit_base_patch16_128": dict(patch_size=16, embed_dim=768, depth=12, num_heads=12, decoder_embed_dim=128, decoder_depth=8, decoder_num_heads=16),
    "mae_vit_large_patch16": dict(patch_size=16, embed_dim=1024, depth=24, num_heads=16, decoder_embed_dim=512, decoder_depth=8, decoder_num_heads=16),
    "mae_vit_huge_patch14": dict(patch_size=14, embed_dim=1280, depth=32, num_heads=16, decoder_embed_dim=512, decoder_depth=8, decoder_num_heads=16),
}


def vmae_spec(arch: str, **overrides) -> VMAESpec:
    base = dict(_BASE)
    base.update(_FACTORIES[arch])
    # factory defaults use img_size=224 unless overridden; the ldmae f8
    # factories rely on the ctor default 224 but every caller passes 256.
    base.update(overrides)
    # normalise the reference's truthy kl flag: callers pass
    # kl_loss_weight=True at inference time (extract_features.py:61)
    klw = base.get("kl_loss_weight")
    if klw is True:
        base["kl_loss_weight"] = 1.0
    return VMAESpec(**base)


def list_archs():
    return sorted(_FACTORIES)
