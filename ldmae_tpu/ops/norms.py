"""Normalisation ops.

RMSNorm matches the Llama-2 variant used by LightningDiT
(/root/reference/LDMAE/models/rmsnorm.py:34-77): the normalisation is
computed in float32 and cast back to the input dtype *before* the learned
scale is applied. LayerNorm covers both the affine (VMAE blocks, eps 1e-6)
and non-affine (DiT adaLN blocks, eps 1e-6) uses.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    normed = xf * lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return normed.astype(x.dtype) * weight.astype(x.dtype)


def layer_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """LayerNorm in fp32 internals, cast back to input dtype."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)
