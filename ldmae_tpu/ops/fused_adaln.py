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


def _kernel_quant(
    x_ref, w_ref, shift_ref, scale_ref, o_ref, s_ref, *, eps: float, kind: str
):
    """Same epilogue, but emits int8 per-row-quantized output + fp32 row
    scales (ops/quant.py convention) — the activation quantization for the
    w8a8 sampling path rides the pass the epilogue already makes, so it is
    HBM-free (PERF.md round 2: a standalone XLA quantization pass costs more
    than the int8 matmul saves)."""
    x = x_ref[0]  # (bn, D)
    b = pl.program_id(0)
    xf = x.astype(jnp.float32)
    if kind == "layer":
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(var + eps)
    else:
        y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
        y = y * w_ref[0].astype(jnp.float32)
    o = y * (1.0 + scale_ref[b].astype(jnp.float32)[None, :])
    o = o + shift_ref[b].astype(jnp.float32)[None, :]
    qs = jnp.maximum(jnp.max(jnp.abs(o), axis=-1, keepdims=True) / 127.0, 1e-8)
    o_ref[0] = jnp.round(o / qs).astype(jnp.int8)
    s_ref[0] = qs


@functools.partial(jax.jit, static_argnames=("kind", "eps"))
def fused_norm_modulate_quant(
    x: jnp.ndarray,
    weight: jnp.ndarray | None,
    shift: jnp.ndarray,
    scale: jnp.ndarray,
    *,
    kind: str = "rms",
    eps: float = 1e-6,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Quantizing variant: returns (int8 (B, N, D), fp32 row scales (B, N, 1))
    such that o_q * scales ~= fused_norm_modulate(x, ...)."""
    b, n, d = x.shape
    bn = _pick_block_n(n)
    if weight is None:
        weight = jnp.ones((d,), jnp.float32)
    w2 = weight.reshape(1, d).astype(jnp.float32)
    grid = (b, n // bn)
    o_q, s = pl.pallas_call(
        functools.partial(_kernel_quant, eps=eps, kind=kind),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), jnp.int8),
            # 3D (B, N, 1) so the trailing block dims satisfy the TPU
            # (8, 128)-or-full tiling rule
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bn, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((b, d), lambda i, j: (0, 0)),
            pl.BlockSpec((b, d), lambda i, j: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, bn, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, bn, 1), lambda i, j: (i, j, 0)),
        ),
        interpret=_interpret(),
    )(x, w2, shift.astype(jnp.float32), scale.astype(jnp.float32))
    return o_q, s


def _kernel_silu_mul_quant(x12_ref, o_ref, s_ref):
    """hidden = silu(x1) * x2 (ops.linear.swiglu_ffn merged layout), emitted
    int8-quantized per row — the w3 input quantization rides the gating
    elementwise pass."""
    x12 = x12_ref[0].astype(jnp.float32)  # (bn, 2H)
    h = x12.shape[-1] // 2
    x1, x2 = x12[:, :h], x12[:, h:]
    o = (x1 * jax.nn.sigmoid(x1)) * x2
    qs = jnp.maximum(jnp.max(jnp.abs(o), axis=-1, keepdims=True) / 127.0, 1e-8)
    o_ref[0] = jnp.round(o / qs).astype(jnp.int8)
    s_ref[0] = qs


@jax.jit
def fused_silu_mul_quant(x12: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """x12: (B, N, 2H) packed SwiGLU pre-activation. Returns
    (int8 (B, N, H), fp32 row scales (B, N, 1))."""
    b, n, h2 = x12.shape
    h = h2 // 2
    bn = 256 if n % 256 == 0 else _pick_block_n(n)
    grid = (b, n // bn)
    o_q, s = pl.pallas_call(
        _kernel_silu_mul_quant,
        out_shape=(
            jax.ShapeDtypeStruct((b, n, h), jnp.int8),
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[pl.BlockSpec((1, bn, h2), lambda i, j: (i, j, 0))],
        out_specs=(
            pl.BlockSpec((1, bn, h), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, bn, 1), lambda i, j: (i, j, 0)),
        ),
        interpret=_interpret(),
    )(x12)
    return o_q, s


def _kernel_matmul_silu(x_ref, w_ref, b_ref, o_ref):
    """x @ w12 -> silu-gate, one kernel: the (M, 2H) pre-activation never
    reaches HBM. Measured on v5e at the B/1 sampling shape (73728x768x4096):
    XLA matmul 2.33 ms + separate silu pass = 4.29 ms; this kernel 2.77 ms
    (the Mosaic matmul is ~25% off XLA's peak but removing the 0.9 GB
    elementwise round-trip more than pays for it)."""
    acc = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.float32)
    acc = acc + b_ref[...]
    h = acc.shape[-1] // 2
    x1, x2 = acc[:, :h], acc[:, h:]
    o_ref[...] = ((x1 * jax.nn.sigmoid(x1)) * x2).astype(o_ref.dtype)


def _pick_block_m(m: int) -> int:
    for bm in (512, 256, 128):
        if m % bm == 0:
            return bm
    return 0


def fused_matmul_silu(x: jnp.ndarray, w12: jnp.ndarray, b12) -> jnp.ndarray:
    """SwiGLU first stage with the gate fused into the matmul epilogue
    (sampling path, forward-only). x: (B, N, D) or (M, D); w12: (D, 2H)
    merged layout; returns silu(x@w1)·(x@w2) with shape (..., H).

    Returns None when the shapes don't fit the kernel tiling (caller falls
    back to the XLA lowering)."""
    shape = x.shape
    d = shape[-1]
    m = 1
    for s in shape[:-1]:
        m *= s
    h2 = w12.shape[-1]
    bm = _pick_block_m(m)
    if bm == 0 or d % 128 != 0 or h2 % 256 != 0:
        return None
    if b12 is None:
        b12 = jnp.zeros((h2,), jnp.float32)
    out = pl.pallas_call(
        _kernel_matmul_silu,
        out_shape=jax.ShapeDtypeStruct((m, h2 // 2), x.dtype),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0)),
            pl.BlockSpec((d, h2), lambda i: (0, 0)),
            pl.BlockSpec((1, h2), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, h2 // 2), lambda i: (i, 0)),
        interpret=_interpret(),
    )(
        x.reshape(m, d),
        w12.astype(x.dtype),
        b12.reshape(1, h2).astype(jnp.float32),
    )
    return out.reshape(*shape[:-1], h2 // 2)


@functools.partial(jax.jit, static_argnames=("kind", "eps"))
def _fused_norm_modulate_kernel_call(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    shift: jnp.ndarray,
    scale: jnp.ndarray,
    *,
    kind: str = "rms",
    eps: float = 1e-6,
) -> jnp.ndarray:
    b, n, d = x.shape
    bn = _pick_block_n(n)
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


@functools.lru_cache(maxsize=None)
def _fnm_custom_vjp(kind: str, eps: float):
    """custom_vjp over the Pallas forward: the backward is hand-written
    fp32 XLA math (exactly what autodiff of the unfused lowering produces,
    fused freely by XLA), so the training step can run the fused forward —
    including the remat recompute of it — without Pallas autodiff support."""

    @jax.custom_vjp
    def f(x, w, shift, scale):
        return _fused_norm_modulate_kernel_call(x, w, shift, scale, kind=kind, eps=eps)

    def fwd(x, w, shift, scale):
        return f(x, w, shift, scale), (x, w, shift, scale)

    def bwd(res, g):
        x, w, shift, scale = res
        xf = x.astype(jnp.float32)
        gf = g.astype(jnp.float32)
        one_plus = (1.0 + scale.astype(jnp.float32))[:, None, :]
        if kind == "layer":
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            xc = xf - mu
            r = jax.lax.rsqrt(jnp.mean(xc * xc, axis=-1, keepdims=True) + eps)
            xhat = xc * r
            dxh = gf * one_plus
            dx = r * (
                dxh
                - jnp.mean(dxh, axis=-1, keepdims=True)
                - xhat * jnp.mean(dxh * xhat, axis=-1, keepdims=True)
            )
            dw = jnp.zeros_like(w)
        else:
            r = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
            u = xf * r  # normalized, pre-weight
            wf = w.astype(jnp.float32)
            xhat = u * wf
            dxh = gf * one_plus
            dw = jnp.sum(dxh * u, axis=(0, 1)).astype(w.dtype)
            du = dxh * wf
            dx = r * (u * (-jnp.mean(du * u, axis=-1, keepdims=True)) + du)
        dshift = jnp.sum(gf, axis=1).astype(shift.dtype)
        dscale = jnp.sum(gf * xhat, axis=1).astype(scale.dtype)
        return dx.astype(x.dtype), dw, dshift, dscale

    f.defvjp(fwd, bwd)
    return f


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
    shift/scale: (B, D). Returns modulate(norm(x), shift, scale).

    Differentiable: the forward is the Pallas kernel, the backward a
    custom-VJP fp32 XLA lowering (gradient-parity-tested against the
    unfused path), so ``adaln_impl='fused'`` works in training too."""
    if weight is None:
        weight = jnp.ones((x.shape[-1],), jnp.float32)
    return _fnm_custom_vjp(kind, eps)(x, weight, shift, scale)
