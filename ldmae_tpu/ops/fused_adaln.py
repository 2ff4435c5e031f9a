"""Fused adaLN epilogue: norm (RMS or non-affine LayerNorm) + modulate in
one Pallas kernel.

The DiT block computes ``modulate(norm(x), shift, scale)`` twice per layer
(lightningdit.py:239-250). Unfused, the fp32 normalisation intermediate and
the (1+scale)/shift broadcast each cost an HBM round-trip of the (B, N, D)
activation; the kernel keeps the whole epilogue in VMEM per (batch,
token-block) tile. Numerics match ops.norms.rms_norm / layer_norm followed
by ops.linear.modulate exactly (fp32 internal, cast to the input dtype
before the learned scale / modulation, like the reference's fp32 RMSNorm
inside an autocast region).

Forward-only (sampling path): the training step keeps the XLA lowering,
which jax can differentiate and which remat handles well.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(x_ref, w_ref, shift_ref, scale_ref, o_ref, *, eps: float, kind: str):
    x = x_ref[0]  # (bn, D)
    b = pl.program_id(0)  # shift/scale are whole-array refs; pick the row
    xf = x.astype(jnp.float32)
    if kind == "layer":
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = (xc * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    else:
        ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
        y = (xf * jax.lax.rsqrt(ms + eps)).astype(x.dtype) * w_ref[0].astype(x.dtype)
    sc = scale_ref[b].astype(x.dtype)[None, :]
    sh = shift_ref[b].astype(x.dtype)[None, :]
    o_ref[0] = y * (1.0 + sc) + sh


def _pick_block_n(n: int) -> int:
    for bn in (512, 256, 128):
        if n % bn == 0:
            return bn
    return n


@functools.partial(jax.jit, static_argnames=("kind", "eps"))
def fused_norm_modulate(
    x: jnp.ndarray,
    weight: jnp.ndarray | None,
    shift: jnp.ndarray,
    scale: jnp.ndarray,
    *,
    kind: str = "rms",
    eps: float = 1e-6,
) -> jnp.ndarray:
    """x: (B, N, D); weight: (D,) RMSNorm scale (ignored for kind='layer');
    shift/scale: (B, D). Returns modulate(norm(x), shift, scale)."""
    b, n, d = x.shape
    bn = _pick_block_n(n)
    if weight is None:
        weight = jnp.ones((d,), jnp.float32)
    w2 = weight.reshape(1, d).astype(jnp.float32)
    grid = (b, n // bn)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, kind=kind),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bn, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            # whole-array (Pallas TPU needs (≥8, 128)-divisible or full
            # blocks; a (1, D) row slice of (B, D) is neither)
            pl.BlockSpec((b, d), lambda i, j: (0, 0)),
            pl.BlockSpec((b, d), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bn, d), lambda i, j: (i, j, 0)),
        interpret=_interpret(),
    )(x, w2, shift.astype(jnp.float32), scale.astype(jnp.float32))
