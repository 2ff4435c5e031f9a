"""Pallas TPU flash attention.

Replaces the reference's cuDNN fused SDPA (lightningdit.py:77
``F.scaled_dot_product_attention``) with a TPU kernel. Two paths:

  * ``flash_attention`` — our kernel: grid over (batch·heads, q-blocks);
    K/V for one head stay resident in VMEM (at N=1024, d=64 that's 256 KB),
    the q-block's logits are formed and softmaxed in VMEM and never touch
    HBM. Numerically-stable single-pass softmax (full K visible per
    q-block, so no online rescaling needed). Inference/forward only —
    training goes through the custom-VJP wrapper which recomputes with the
    same kernel for the forward and uses XLA einsums for the backward.
  * ``builtin`` — jax.experimental.pallas.ops.tpu.flash_attention for
    cross-checking.

Shapes: q, k, v: (B, H, N, d) with N multiple of the q-block and d a
multiple of 128 not required (d=64 works; the lane dim is d which Mosaic
pads). Non-causal only (the DiT/VMAE sequences are bidirectional).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (N, d)
    v = v_ref[0]  # (N, d)
    logits = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )  # (bq, N) fp32
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _interpret() -> bool:
    """Pallas TPU kernels only compile on TPU; interpret elsewhere (tests,
    CPU smoke runs)."""
    return jax.default_backend() != "tpu"


def _pick_block_q(n: int) -> int:
    for bq in (512, 256, 128):
        if n % bq == 0:
            return bq
    return n


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return _flash_forward(q, k, v)


def _flash_forward(q, k, v):
    b, h, n, d = q.shape
    scale = d**-0.5
    bq = _pick_block_q(n)
    bh = b * h
    qf = q.reshape(bh, n, d)
    kf = k.reshape(bh, n, d)
    vf = v.reshape(bh, n, d)

    out = pl.pallas_call(
        functools.partial(_flash_fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        interpret=_interpret(),
        grid=(bh, n // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n * n * d,
            bytes_accessed=3 * bh * n * d * q.dtype.itemsize + bh * n * d * q.dtype.itemsize,
            transcendentals=bh * n * n,
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, n, d)


def _flash_fwd_rule(q, k, v):
    out = _flash_forward(q, k, v)
    return out, (q, k, v)


def _flash_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *, scale: float):
    """One (batch·head) per program: recompute p in VMEM and form all three
    input grads without the (N, N) probabilities ever touching HBM."""
    q = q_ref[0]  # (N, d)
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0].astype(jnp.float32)

    logits = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )  # (N, N)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    # dv = pᵀ g
    dv_ref[0] = jax.lax.dot_general(
        p, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    # dp = g vᵀ ; dsoft = p ⊙ (dp − rowsum(dp ⊙ p))
    dp = jax.lax.dot_general(
        g, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dsoft = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq_ref[0] = (
        jnp.dot(dsoft, k.astype(jnp.float32), preferred_element_type=jnp.float32)
        * scale
    ).astype(dq_ref.dtype)
    dk_ref[0] = (
        jax.lax.dot_general(
            dsoft, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    ).astype(dk_ref.dtype)


def _flash_backward(q, k, v, g):
    b, h, n, d = q.shape
    scale = d**-0.5
    bh = b * h
    shape = jax.ShapeDtypeStruct((bh, n, d), q.dtype)
    spec_full = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_kernel, scale=scale),
        out_shape=(shape, shape, shape),
        interpret=_interpret(),
        grid=(bh,),
        in_specs=[spec_full] * 4,
        out_specs=(spec_full, spec_full, spec_full),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * n * n * d,
            bytes_accessed=7 * bh * n * d * q.dtype.itemsize,
            transcendentals=bh * n * n,
        ),
    )(
        q.reshape(bh, n, d),
        k.reshape(bh, n, d),
        v.reshape(bh, n, d),
        g.reshape(bh, n, d),
    )
    return (
        dq.reshape(b, h, n, d),
        dk.reshape(b, h, n, d),
        dv.reshape(b, h, n, d),
    )


def _flash_bwd_rule(res, g):
    """Backward as a Pallas kernel: recomputes the attention probabilities in
    VMEM per (batch·head) program — the (B, H, N, N) fp32 tensor the naive
    XLA backward materialises in HBM (3 GB at b=32, N=1024) never exists."""
    q, k, v = res
    return _flash_backward(q, k, v, g)


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


# ---------------------------------------------------------------------------
# flash kernel with in-kernel half-split RoPE, same (B, H, N, hd) layout and
# matmul structure as the proven kernel — saves the separate rope pass over
# q/k in HBM (~5 GB/forward at b=64 on B/1).
# ---------------------------------------------------------------------------


def _flash_rope_bhnd_kernel(
    q_ref, k_ref, v_ref, cosq_ref, sinq_ref, cosk_ref, sink_ref, o_ref,
    *, scale: float,
):
    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (N, d)
    v = v_ref[0]
    half = q.shape[-1] // 2

    def rope(x, cos, sin):
        xf = x.astype(jnp.float32)
        rot = jnp.concatenate([-xf[:, half:], xf[:, :half]], axis=-1)
        return (xf * cos + rot * sin).astype(x.dtype)

    q = rope(q, cosq_ref[:, :], sinq_ref[:, :])
    k = rope(k, cosk_ref[:, :], sink_ref[:, :])

    logits = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _flash_qknorm_rope_kernel(
    q_ref, k_ref, v_ref, qs_ref, ks_ref, cosq_ref, sinq_ref, cosk_ref, sink_ref,
    o_ref, *, scale: float, eps: float = 1e-6,
):
    """flash + in-kernel per-head RMS qk-norm + half-split RoPE."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    half = q.shape[-1] // 2

    def rmsnorm(x, w):
        xf = x.astype(jnp.float32)
        normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
        # match ops.norms.rms_norm: cast back to x dtype BEFORE the scale
        return normed.astype(x.dtype).astype(jnp.float32) * w

    def rope(xf, cos, sin):
        rot = jnp.concatenate([-xf[:, half:], xf[:, :half]], axis=-1)
        return (xf * cos + rot * sin).astype(q.dtype)

    qn = rope(rmsnorm(q, qs_ref[0, :]), cosq_ref[:, :], sinq_ref[:, :])
    kn = rope(rmsnorm(k, ks_ref[0, :]), cosk_ref[:, :], sink_ref[:, :])

    logits = (
        jax.lax.dot_general(
            qn, kn, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def flash_attention_qknorm_rope(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    q_scale: jnp.ndarray, k_scale: jnp.ndarray,
    cos: jnp.ndarray, sin: jnp.ndarray,
) -> jnp.ndarray:
    """(B, H, N, d) flash attention with RMS qk-norm AND half-split RoPE
    applied in-kernel. q_scale/k_scale: (d,). Forward-only (sampling)."""
    b, h, n, d = q.shape
    scale = d**-0.5
    bq = _pick_block_q(n)
    bh = b * h
    qf = q.reshape(bh, n, d)
    kf = k.reshape(bh, n, d)
    vf = v.reshape(bh, n, d)
    cos32 = cos.astype(jnp.float32)
    sin32 = sin.astype(jnp.float32)
    qs = q_scale.astype(jnp.float32).reshape(1, d)
    ks = k_scale.astype(jnp.float32).reshape(1, d)

    tq = pl.BlockSpec((bq, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
    tk = pl.BlockSpec((n, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    ts = pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_flash_qknorm_rope_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        interpret=_interpret(),
        grid=(bh, n // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            ts, ts, tq, tq, tk, tk,
        ],
        out_specs=pl.BlockSpec(
            (1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n * n * d,
            bytes_accessed=4 * bh * n * d * q.dtype.itemsize,
            transcendentals=bh * n * n,
        ),
    )(qf, kf, vf, qs, ks, cos32, sin32, cos32, sin32)
    return out.reshape(b, h, n, d)


def flash_attention_rope(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    cos: jnp.ndarray, sin: jnp.ndarray,
) -> jnp.ndarray:
    """(B, H, N, d) flash attention with half-split RoPE applied in-kernel.
    cos/sin: (N, d) HALF-SPLIT tables. Forward-only (sampling)."""
    b, h, n, d = q.shape
    scale = d**-0.5
    bq = _pick_block_q(n)
    bh = b * h
    qf = q.reshape(bh, n, d)
    kf = k.reshape(bh, n, d)
    vf = v.reshape(bh, n, d)
    cos32 = cos.astype(jnp.float32)
    sin32 = sin.astype(jnp.float32)

    tq = pl.BlockSpec((bq, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
    tk = pl.BlockSpec((n, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_flash_rope_bhnd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        interpret=_interpret(),
        grid=(bh, n // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            tq, tq, tk, tk,
        ],
        out_specs=pl.BlockSpec(
            (1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n * n * d,
            bytes_accessed=4 * bh * n * d * q.dtype.itemsize,
            transcendentals=bh * n * n,
        ),
    )(qf, kf, vf, cos32, sin32, cos32, sin32)
    return out.reshape(b, h, n, d)


# --- trainable wrapper: rope in-kernel fwd AND bwd --------------------------
#
# RoPE is a linear map q_r = C·q + S·R·q with diagonal C=diag(cos),
# S=diag(sin) and R the half-split rotation (R x = [-x2 | x1]). Its
# transpose is Jᵀ y = C·y + Rᵀ·(S·y) with Rᵀ y = [y2 | -y1], which the
# backward kernel applies to dq_r/dk_r before writing dq/dk.


def _flash_rope_bwd_kernel(
    q_ref, k_ref, v_ref, g_ref, cos_ref, sin_ref, dq_ref, dk_ref, dv_ref,
    *, scale: float,
):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0].astype(jnp.float32)
    cos = cos_ref[:, :]
    sin = sin_ref[:, :]
    half = q.shape[-1] // 2

    def rope(x):
        xf = x.astype(jnp.float32)
        rot = jnp.concatenate([-xf[:, half:], xf[:, :half]], axis=-1)
        return (xf * cos + rot * sin).astype(x.dtype)

    def rope_t(y):  # transposed rope jacobian
        sy = y * sin
        rt = jnp.concatenate([sy[:, half:], -sy[:, :half]], axis=-1)
        return y * cos + rt

    qr = rope(q)
    kr = rope(k)

    logits = (
        jax.lax.dot_general(
            qr, kr, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    dv_ref[0] = jax.lax.dot_general(
        p, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        g, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dsoft = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dqr = (
        jnp.dot(dsoft, kr.astype(jnp.float32), preferred_element_type=jnp.float32)
        * scale
    )
    dkr = (
        jax.lax.dot_general(
            dsoft, qr.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    dq_ref[0] = rope_t(dqr).astype(dq_ref.dtype)
    dk_ref[0] = rope_t(dkr).astype(dk_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def flash_attention_rope_trainable(q, k, v, cos, sin):
    return flash_attention_rope(q, k, v, cos, sin)


def _far_fwd(q, k, v, cos, sin):
    return flash_attention_rope(q, k, v, cos, sin), (q, k, v, cos, sin)


def _far_bwd(res, g):
    q, k, v, cos, sin = res
    b, h, n, d = q.shape
    scale = d**-0.5
    bh = b * h
    shape = jax.ShapeDtypeStruct((bh, n, d), q.dtype)
    spec_full = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    tk = pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_rope_bwd_kernel, scale=scale),
        out_shape=(shape, shape, shape),
        interpret=_interpret(),
        grid=(bh,),
        in_specs=[spec_full] * 4 + [tk, tk],
        out_specs=(spec_full, spec_full, spec_full),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * n * n * d,
            bytes_accessed=7 * bh * n * d * q.dtype.itemsize,
            transcendentals=bh * n * n,
        ),
    )(
        q.reshape(bh, n, d),
        k.reshape(bh, n, d),
        v.reshape(bh, n, d),
        g.reshape(bh, n, d),
        cos.astype(jnp.float32),
        sin.astype(jnp.float32),
    )
    return (
        dq.reshape(b, h, n, d),
        dk.reshape(b, h, n, d),
        dv.reshape(b, h, n, d),
        jnp.zeros_like(cos),
        jnp.zeros_like(sin),
    )


flash_attention_rope_trainable.defvjp(_far_fwd, _far_bwd)


# ---------------------------------------------------------------------------
# Fused transpose-free path: (B, N, H, hd) layout with half-split RoPE
# applied inside the kernel.
#
# Avoids the (B,N,H,hd) <-> (B,H,N,hd) HBM shuffles around attention (the
# layout produced by the packed qkv projection is used directly; the head
# axis is a grid dimension) and folds the RoPE elementwise work onto data
# already resident in VMEM. Requires half-split rope tables/params
# (ops/rope.py to_half_layout + models/lightningdit.permute_qk_for_half_rope).
# ---------------------------------------------------------------------------


def _flash_rope_kernel(
    q_ref, k_ref, v_ref, cosq_ref, sinq_ref, cosk_ref, sink_ref, o_ref,
    *, scale: float, hd: int,
):
    """Processes ``hpb = block_cols // hd`` heads laid out side-by-side in the
    last (lane) dimension. Mosaic requires ≥128 lanes per block; hd=64 →
    2 heads per block. cos/sin tables are pre-tiled to block_cols lanes."""
    half = hd // 2
    cols = q_ref.shape[-1]
    hpb = cols // hd

    def rope(x, cos, sin, h0):
        xc = x.astype(jnp.float32)
        rot = jnp.concatenate([-xc[:, h0 + half : h0 + hd], xc[:, h0 : h0 + half]], axis=-1)
        return xc[:, h0 : h0 + hd] * cos[:, h0 : h0 + hd] + rot * sin[:, h0 : h0 + hd]

    q_all = q_ref[0]
    k_all = k_ref[0]
    v_all = v_ref[0]
    cq, sq = cosq_ref[:, :], sinq_ref[:, :]
    ck, sk = cosk_ref[:, :], sink_ref[:, :]

    for hi in range(hpb):
        h0 = hi * hd
        q = rope(q_all, cq, sq, h0).astype(q_all.dtype)  # (bq, hd)
        k = rope(k_all, ck, sk, h0).astype(k_all.dtype)  # (N, hd)
        v = v_all[:, h0 : h0 + hd]
        logits = (
            jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
        )
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
        out = jnp.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[0, :, h0 : h0 + hd] = out.astype(o_ref.dtype)


def flash_attention_fused_rope(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    num_heads: Optional[int] = None,
) -> jnp.ndarray:
    """q, k, v: (B, N, H, hd) or (B, N, H*hd); cos/sin: (N, hd) HALF-SPLIT
    tables. Returns the same shape as q. Forward-only (sampling path)."""
    orig_shape = q.shape
    if q.ndim == 4:
        b, n, h, hd = q.shape
        q = q.reshape(b, n, h * hd)
        k = k.reshape(b, n, h * hd)
        v = v.reshape(b, n, h * hd)
    else:
        assert num_heads is not None
        b, n, d = q.shape
        h = num_heads
        hd = d // h
    scale = hd**-0.5
    bq = _pick_block_q(n)
    hpb = max(128 // hd, 1)  # heads per block (lane alignment)
    while h % hpb != 0:
        hpb //= 2
    cols = hpb * hd

    # tile the rope tables across the heads within a block
    cos_t = jnp.tile(cos.astype(jnp.float32), (1, hpb))
    sin_t = jnp.tile(sin.astype(jnp.float32), (1, hpb))

    qspec = pl.BlockSpec((1, bq, cols), lambda bi, hi, j: (bi, j, hi), memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, n, cols), lambda bi, hi, j: (bi, 0, hi), memory_space=pltpu.VMEM)
    tq = pl.BlockSpec((bq, cols), lambda bi, hi, j: (j, 0), memory_space=pltpu.VMEM)
    tk = pl.BlockSpec((n, cols), lambda bi, hi, j: (0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_flash_rope_kernel, scale=scale, hd=hd),
        out_shape=jax.ShapeDtypeStruct((b, n, h * hd), q.dtype),
        interpret=_interpret(),
        grid=(b, h // hpb, n // bq),
        in_specs=[qspec, kvspec, kvspec, tq, tq, tk, tk],
        out_specs=qspec,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * hd,
            bytes_accessed=4 * b * h * n * hd * q.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
    )(q, k, v, cos_t, sin_t, cos_t, sin_t)
    return out.reshape(orig_shape)


def builtin_flash_attention(q, k, v):
    """jax's shipped TPU flash-attention kernel (for cross-checks/perf A-B)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as _fa,
    )

    d = q.shape[-1]
    return _fa(q, k, v, causal=False, sm_scale=d**-0.5)
