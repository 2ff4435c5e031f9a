"""Patchify / unpatchify between NCHW images and token sequences.

Matches the einsum layout of the reference exactly
(/root/reference/VMAE/models_mae.py:447-473 and lightningdit.py:376-389):
patches flattened row-major over (h, w), channels ordered (ph, pw, c) within
a patch. Public tensors stay NCHW to match the reference's data formats
(latent safetensors shards are (N, C, h, w)).
"""

from __future__ import annotations

import jax.numpy as jnp


def patchify(imgs: jnp.ndarray, p: int) -> jnp.ndarray:
    """(N, C, H, W) -> (N, L, p*p*C) with L = (H/p)*(W/p)."""
    n, c, height, width = imgs.shape
    assert height % p == 0 and width % p == 0
    h, w = height // p, width // p
    x = imgs.reshape(n, c, h, p, w, p)
    x = jnp.einsum("nchpwq->nhwpqc", x)
    return x.reshape(n, h * w, p * p * c)


def unpatchify(x: jnp.ndarray, p: int, c: int) -> jnp.ndarray:
    """(N, L, p*p*C) -> (N, C, H, W), square grids only (like the reference)."""
    n, length, _ = x.shape
    h = w = int(round(length**0.5))
    assert h * w == length, "unpatchify expects a square token grid"
    x = x.reshape(n, h, w, p, p, c)
    x = jnp.einsum("nhwpqc->nchpwq", x)
    return x.reshape(n, c, h * p, w * p)


def patch_embed(imgs: jnp.ndarray, params, p: int, compute_dtype=None) -> jnp.ndarray:
    """PatchEmbed as patchify + matmul (conv-free; maps straight onto the MXU).

    ``params["w"]`` has shape (p*p*C_in, D) — a torch conv weight
    (D, C, p, p) is imported via permute(2,3,1,0).reshape(p*p*C, D).
    """
    from .linear import dense

    tokens = patchify(imgs, p)
    return dense(tokens, params, compute_dtype=compute_dtype)
