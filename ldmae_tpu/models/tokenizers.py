"""Tokenizer wrapper classes — the reference's user-facing VAE API.

Mirrors the interface of /root/reference/LDMAE/tokenizer/{vavae,marvae,sdvae}.py
and the VMAE docking functions: each wrapper exposes
``img_transform(p_hflip, img_size)``, ``encode_images(images)`` and
``decode_to_images(z)`` so code written against the reference tokenizers
ports directly.

``images`` are (N, 3, H, W) float arrays in [-1, 1] (the output of
img_transform); latents are NCHW; decoded images uint8 HWC.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


# the reference's SD-VAE family names (extract_features.py:67, inference.py:139,
# evaluate_tokenizer.py:64)
SDVAE_NAMES = ("ae", "dae", "vae", "sdv3")


class _Base:
    latent_dim: int

    def _next_key(self) -> "jax.Array":
        """Fresh per-call sampling key (the reference draws fresh Gaussian
        noise from torch's global RNG on every posterior.sample())."""
        if not hasattr(self, "_key"):
            self._key = jax.random.key(0)
        self._key, sub = jax.random.split(self._key)
        return sub

    def img_transform(
        self,
        p_hflip: float = 0,
        img_size: Optional[int] = None,
        seed: Optional[int] = None,
    ) -> Callable:
        """Returns fn(PIL) -> (3, S, S) float32 in [-1, 1] (ADM center-crop +
        random flip + Normalize(0.5, 0.5)). The extraction pipeline uses
        deterministic flips (p_hflip 0 or 1, extract_features.py:107-110);
        for 0<p<1 each transform gets a fresh RNG (or ``seed`` if given) —
        the reference draws from torch's per-process global RNG."""
        from ..data.images import center_crop_arr
        from PIL import Image

        size = img_size or self.img_size
        rng = np.random.default_rng(seed)

        def tf(pil_image: Image.Image) -> np.ndarray:
            img = center_crop_arr(pil_image, size)
            if p_hflip > 0 and rng.uniform() < p_hflip:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
            arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
            return ((arr - 0.5) / 0.5).transpose(2, 0, 1)

        return tf


class VMAE_Tokenizer(_Base):
    """The production VMAE f8d16 tokenizer (models_mae.py docking API)."""

    def __init__(
        self,
        weight_path: Optional[str] = None,
        img_size: int = 256,
        arch: str = "mae_for_ldmae_f8d16_prev",
    ):
        from . import vmae as vmae_mod
        from .vmae import VMAEConsts, init_vmae_params, vmae_spec
        from ..train import torch_import

        self.img_size = img_size
        self.spec = vmae_spec(
            arch, img_size=img_size, ldmae_mode=True, no_cls=True,
            kl_loss_weight=True, smooth_output=True,
        )
        self.consts = VMAEConsts(self.spec)
        self.params = _load_or_init(
            weight_path,
            lambda p: torch_import.import_vmae_checkpoint(p, self.spec),
            lambda: init_vmae_params(jax.random.key(0), self.spec),
            "VMAE",
        )
        self.latent_dim = self.spec.latent_dim
        self._vm = vmae_mod

        self._encode = jax.jit(
            lambda imgs, key: self._vm.encode(
                self.params, self.spec, self.consts, imgs, compute_dtype=jnp.bfloat16
            ).sample(key)
        )
        self._decode = jax.jit(
            lambda z: self._vm.decode_to_images(
                self.params, self.spec, self.consts, z, compute_dtype=jnp.bfloat16
            )
        )

    def encode_images(self, images, key: Optional[jax.Array] = None) -> jnp.ndarray:
        """posterior.sample() like models_mae.py:989-998."""
        key = key if key is not None else self._next_key()
        return self._encode(jnp.asarray(images), key)

    def decode_to_images(self, z) -> np.ndarray:
        return np.asarray(self._decode(jnp.asarray(z)))


class _ConvVAEWrapper(_Base):
    def __init__(self, params, spec, img_size=256):
        from . import conv_vae as cv

        self.params, self.spec = params, spec
        self.img_size = img_size
        self.latent_dim = spec.embed_dim
        self._encode = jax.jit(
            lambda x, key: cv.encode(self.params, self.spec, x).sample(key)
        )
        self._decode = jax.jit(lambda z: cv.decode_to_images(self.params, self.spec, z))

    def encode_images(self, images, key: Optional[jax.Array] = None) -> jnp.ndarray:
        key = key if key is not None else self._next_key()
        return self._encode(jnp.asarray(images), key)

    def decode_to_images(self, z) -> np.ndarray:
        return np.asarray(self._decode(jnp.asarray(z)))


class VA_VAE(_ConvVAEWrapper):
    """tokenizer/vavae.py equivalent (f16d32)."""

    def __init__(self, ckpt_path: Optional[str] = None, img_size: int = 256, embed_dim: int = 32):
        from . import conv_vae as cv

        if ckpt_path:
            if not os.path.exists(ckpt_path):
                raise FileNotFoundError(f"tokenizer checkpoint not found: {ckpt_path}")
            params, spec = cv.load_vavae(ckpt_path, embed_dim)
        else:
            spec = cv.vavae_spec(embed_dim)
            params = cv.init_conv_vae_params(jax.random.key(0), spec)
        super().__init__(params, spec, img_size)


class MAR_VAE(_ConvVAEWrapper):
    """tokenizer/marvae.py equivalent (f16d16, no decoder attention)."""

    def __init__(self, ckpt_path: Optional[str] = None, img_size: int = 256, embed_dim: int = 16):
        from . import conv_vae as cv

        if ckpt_path:
            if not os.path.exists(ckpt_path):
                raise FileNotFoundError(f"tokenizer checkpoint not found: {ckpt_path}")
            params, spec = cv.load_marvae(ckpt_path, embed_dim)
        else:
            spec = cv.marvae_spec(embed_dim)
            params = cv.init_conv_vae_params(jax.random.key(0), spec)
        super().__init__(params, spec, img_size)


class SD_VAE(_ConvVAEWrapper):
    """tokenizer/sdvae.py equivalent (diffusers AutoencoderKL, SD3 config).
    encode_images uses the posterior MODE like Diffusers_AutoencoderKL
    (sdvae.py:55-60)."""

    def __init__(self, ckpt_path: Optional[str] = None, img_size: int = 256):
        from . import conv_vae as cv
        from .sdvae_import import load_sdvae

        if ckpt_path:
            if not os.path.exists(ckpt_path):
                raise FileNotFoundError(f"tokenizer checkpoint not found: {ckpt_path}")
            params, spec = load_sdvae(ckpt_path)
        else:
            spec = cv.sdvae_spec()
            params = cv.init_conv_vae_params(jax.random.key(0), spec)
        super().__init__(params, spec, img_size)
        self._encode_mode = jax.jit(
            lambda x: cv.encode(self.params, self.spec, x).mode()
        )

    def encode_images(self, images, key=None) -> jnp.ndarray:
        return self._encode_mode(jnp.asarray(images))


class TokenizerFns:
    """Functional tokenizer interface for the jitted driver paths.

    The wrapper classes above hold their own jitted closures; the drivers
    (extract_features / inference / evaluate_tokenizer) instead build one
    fused XLA program around the tokenizer, so they need plain functions +
    a params pytree. All fns share the signature
    ``fn(params, x, compute_dtype=..., attn_impl=...)`` (conv tokenizers
    ignore the kwargs — they have no attention-impl switch and run fp32).

    - ``encode_moments`` → (B, 2·latent_dim, h, w) raw posterior moments,
      the reference's ``_encode`` (models_mae.py:836-853 / diffusers
      ``_encode``); mode/sample via ``ops.gaussian.diagonal_gaussian``.
    - ``decode`` → (B, 3, H, W) float in [-1, 1].
    - ``decode_to_images`` → uint8 HWC, clamp(127.5x+128).
    """

    def __init__(self, name, params, latent_dim, encode_moments, decode,
                 decode_to_images):
        self.name = name
        self.params = params
        self.latent_dim = latent_dim
        self.encode_moments = encode_moments
        self.decode = decode
        self.decode_to_images = decode_to_images


def _load_or_init(weight_path, load_fn, init_fn, what):
    """Given-but-missing checkpoint paths fail loudly (the reference crashes
    in torch.load, extract_features.py:62); an empty path means random init
    (tiny-config tests / dry runs)."""
    if weight_path:
        if not os.path.exists(weight_path):
            raise FileNotFoundError(f"tokenizer checkpoint not found: {weight_path}")
        return load_fn(weight_path)
    print(f"WARNING: no {what} tokenizer weights given, using random init")
    return init_fn()


def build_tokenizer_fns(
    model_name: str, weight_path: str = "", img_size: int = 256
) -> TokenizerFns:
    """Driver-level tokenizer dispatch on ``config.vae.model_name``,
    matching the reference's ``model_name.split('_')[0]`` families
    (inference.py:131-164, evaluate_tokenizer.py:57-95,
    extract_features.py:57-99): 'vmae*' → the production VMAE f8d16_prev,
    {'ae','dae','vae','sdv3'} → the diffusers SD-VAE config, plus the
    tokenizer/ wrappers 'vavae' and 'marvae'. Unknown names raise."""
    family = model_name.split("_")[0]
    if family == "vmae":
        from . import vmae as vmae_mod
        from .vmae import VMAEConsts, init_vmae_params, vmae_spec
        from ..train import torch_import

        # the reference always builds mae_for_ldmae_f8d16_prev for any
        # vmae* name (inference.py:133)
        spec = vmae_spec(
            "mae_for_ldmae_f8d16_prev", img_size=img_size, ldmae_mode=True,
            no_cls=True, kl_loss_weight=True, smooth_output=True,
        )
        consts = VMAEConsts(spec)
        params = _load_or_init(
            weight_path,
            lambda p: torch_import.import_vmae_checkpoint(p, spec),
            lambda: init_vmae_params(jax.random.key(0), spec),
            "VMAE",
        )
        return TokenizerFns(
            model_name, params, spec.latent_dim,
            encode_moments=lambda p, x, compute_dtype=jnp.bfloat16, attn_impl="xla":
                vmae_mod.ldmae_encode_moments(p, spec, consts, x, compute_dtype, attn_impl),
            decode=lambda p, z, compute_dtype=jnp.bfloat16, attn_impl="xla":
                vmae_mod.decode(p, spec, consts, z, compute_dtype, attn_impl),
            decode_to_images=lambda p, z, compute_dtype=jnp.bfloat16, attn_impl="xla":
                vmae_mod.decode_to_images(p, spec, consts, z, compute_dtype, attn_impl),
        )

    from . import conv_vae as cv

    if family in SDVAE_NAMES:
        from .sdvae_import import load_sdvae

        spec = cv.sdvae_spec()
        params = _load_or_init(
            weight_path,
            lambda p: load_sdvae(p)[0],
            lambda: cv.init_conv_vae_params(jax.random.key(0), spec),
            "SD-VAE",
        )
    elif family == "vavae":
        spec = cv.vavae_spec()
        params = _load_or_init(
            weight_path,
            lambda p: cv.load_vavae(p)[0],
            lambda: cv.init_conv_vae_params(jax.random.key(0), spec),
            "VA-VAE",
        )
    elif family == "marvae":
        spec = cv.marvae_spec()
        params = _load_or_init(
            weight_path,
            lambda p: cv.load_marvae(p)[0],
            lambda: cv.init_conv_vae_params(jax.random.key(0), spec),
            "MAR-VAE",
        )
    else:
        raise ValueError(f"unknown tokenizer {model_name!r}")
    return TokenizerFns(
        model_name, params, spec.embed_dim,
        encode_moments=lambda p, x, compute_dtype=None, attn_impl=None:
            cv.encode_moments(p, spec, x),
        decode=lambda p, z, compute_dtype=None, attn_impl=None:
            cv.decode(p, spec, z),
        decode_to_images=lambda p, z, compute_dtype=None, attn_impl=None:
            cv.decode_to_images(p, spec, z),
    )


def build_tokenizer(model_name: str, weight_path: str = "", img_size: int = 256):
    """Tokenizer factory matching the reference's model_name dispatch
    (extract_features.py:56-99): 'vmae*' → VMAE, 'vavae' → VA_VAE,
    'marvae' → MAR_VAE, {'ae','dae','vae','sdv3'} → SD_VAE."""
    if model_name.startswith("vmae"):
        from .vmae import _FACTORIES

        # 'vmae'/'vmae_f8d16' -> production arch; an explicit factory name
        # ('mae_for_ldmae_…' with or without the vmae_ prefix) selects it —
        # silently building the default arch for an unknown name would hand
        # back wrong-shaped latents
        arch = "mae_for_ldmae_f8d16_prev"
        if model_name not in ("vmae", "vmae_f8d16"):
            cand = model_name[len("vmae_"):] if model_name.startswith("vmae_") else model_name
            if cand in _FACTORIES:
                arch = cand
            else:
                raise ValueError(f"unknown VMAE tokenizer arch {model_name!r}")
        return VMAE_Tokenizer(weight_path, img_size, arch=arch)
    if model_name == "vavae":
        return VA_VAE(weight_path, img_size)
    if model_name == "marvae":
        return MAR_VAE(weight_path, img_size)
    if model_name in SDVAE_NAMES:
        return SD_VAE(weight_path, img_size)
    raise ValueError(f"unknown tokenizer {model_name!r}")
