"""Multi-head attention.

Computation matches the reference modules:
  * LightningDiT Attention (/root/reference/LDMAE/models/lightningdit.py:32-91):
    packed qkv projection, optional per-head QK-norm (LayerNorm or RMSNorm on
    head_dim), optional rotary embedding on q and k, SDPA, output projection.
  * VMAE Attention (/root/reference/VMAE/models_mae.py:117-147): same without
    qk-norm/rope.

Parameter layout:
  {"qkv": {"w": (D, 3, D), "b": (3, D)},        # packed, head-aligned last dim
   "proj": {"w": (D, D), "b": (D,)},
   "q_norm": {"scale": (head_dim,)} | None,      # rmsnorm weight, or
   "q_norm": {"scale": (hd,), "bias": (hd,)}     # layernorm affine
  }

``impl`` selects the inner softmax(QK^T)V computation:
  * "xla":    einsum + softmax — XLA fuses this well at N=1024
  * "cudnn"/"sdpa": jax.nn.dot_product_attention (uses the best lowering)
  * "flash":  Pallas TPU flash-attention kernel (ldmae_tpu.ops.flash_attention)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .norms import layer_norm, rms_norm
from .rope import apply_rope, apply_rope_half

Params = Dict[str, Any]


def _apply_head_norm(x: jnp.ndarray, p: Optional[Params], kind: str) -> jnp.ndarray:
    """Per-head q/k norm over head_dim. kind: 'rms' | 'layer'."""
    if p is None:
        return x
    if kind == "rms":
        return rms_norm(x, p["scale"])
    return layer_norm(x, p.get("scale"), p.get("bias"))


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    impl: str = "xla",
) -> jnp.ndarray:
    """softmax(q k^T / sqrt(d)) v for (B, H, N, hd) operands."""
    if impl in ("flash", "flash_rope", "flash_fused", "flash_qkr"):
        # rope-fused impls fall back to the plain kernel when no rope/half
        # layout is in play (e.g. VMAE attention, celeba no-qknorm configs)
        from .flash_attention import flash_attention

        return flash_attention(q, k, v)
    if impl in ("sdpa", "cudnn"):
        # jax.nn.dot_product_attention expects (B, N, H, hd)
        out = jax.nn.dot_product_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
        )
        return out.transpose(0, 2, 1, 3)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v, preferred_element_type=jnp.float32).astype(v.dtype)


def multi_head_attention(
    x: jnp.ndarray,
    p: Params,
    num_heads: int,
    *,
    rope: Optional[tuple[jnp.ndarray, jnp.ndarray]] = None,
    rope_layout: str = "interleaved",
    qk_norm_kind: str = "rms",
    impl: str = "xla",
    quant_mode: Optional[str] = None,
    x_quant: Optional[tuple[jnp.ndarray, jnp.ndarray]] = None,
    out_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Full attention module: qkv proj -> [qk-norm] -> [rope] -> sdpa -> proj.

    x: (B, N, D). Returns (B, N, D) in x.dtype.

    x_quant: optional (int8 x, fp32 row scales) from a fused producer kernel
    — used for the qkv matmul instead of x when the qkv weights are
    quantized (the w8a8 fused sampling path). x may then be None (the block
    never materialises the bf16 activation); out_dtype sets the compute/
    output dtype (default bfloat16).
    """
    if x is None:
        assert x_quant is not None
        b, n, d = x_quant[0].shape
        dtype = out_dtype or jnp.bfloat16
    else:
        b, n, d = x.shape
        dtype = x.dtype
    hd = d // num_heads

    if "w_q" in p["qkv"] and x_quant is not None:
        from .quant import qdense_pre

        qkv = qdense_pre(x_quant[0], x_quant[1], p["qkv"], compute_dtype=dtype)
    elif "w_q" in p["qkv"]:
        # quantized layout (ops/quant.py): weights pre-flattened to (D, 3D)
        from .quant import qdense

        qkv = qdense(x, p["qkv"], mode=quant_mode or "w8a8")
    else:
        w = p["qkv"]["w"].reshape(d, 3 * d).astype(dtype)
        qkv = jnp.dot(x, w, preferred_element_type=jnp.float32)
        bias = p["qkv"].get("b")
        if bias is not None:
            qkv = qkv + bias.reshape(3 * d).astype(jnp.float32)
    qkv = qkv.astype(dtype).reshape(b, n, 3, num_heads, hd)

    if rope is not None and rope_layout == "half" and impl == "flash_fused":
        # transpose-free fused path: stay in (B, N, H, hd); heads become a
        # kernel grid axis, rope applied in-kernel on VMEM-resident q/k.
        # Measured SLOWER than transpose+flash on v5e at hd=64 (the per-head
        # K=64 matmuls underutilise the MXU) — kept as an opt-in for larger
        # head dims.
        from .flash_attention import flash_attention_fused_rope

        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = _apply_head_norm(q, p.get("q_norm"), qk_norm_kind)
        k = _apply_head_norm(k, p.get("k_norm"), qk_norm_kind)
        cos, sin = rope
        out = flash_attention_fused_rope(q, k, v, cos, sin).reshape(b, n, d)
        from .quant import maybe_qdense

        return maybe_qdense(out, p["proj"], quant_mode, compute_dtype=dtype)

    q, k, v = (
        qkv[:, :, 0].transpose(0, 2, 1, 3),
        qkv[:, :, 1].transpose(0, 2, 1, 3),
        qkv[:, :, 2].transpose(0, 2, 1, 3),
    )  # (B, H, N, hd)

    if (
        rope is not None and rope_layout == "half" and impl == "flash_qkr"
        and qk_norm_kind == "rms"
        and p.get("q_norm") is not None and "bias" not in p["q_norm"]
    ):
        # fully fused: RMS qk-norm + rope + attention in one kernel. Measured
        # SLOWER than flash_rope on v5e (lane-dim reductions in-kernel cost
        # more than the saved HBM traffic) — opt-in only.
        from .flash_attention import flash_attention_qknorm_rope

        cos, sin = rope
        out = flash_attention_qknorm_rope(
            q, k, v, p["q_norm"]["scale"], p["k_norm"]["scale"], cos, sin
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        from .quant import maybe_qdense

        return maybe_qdense(out, p["proj"], quant_mode, compute_dtype=dtype)

    q = _apply_head_norm(q, p.get("q_norm"), qk_norm_kind)
    k = _apply_head_norm(k, p.get("k_norm"), qk_norm_kind)

    if rope is not None and rope_layout == "half" and impl == "flash_rope":
        # in-kernel rope: q/k never take the extra HBM round-trip; the
        # trainable wrapper adds a Pallas backward with rope fwd+transpose
        from .flash_attention import flash_attention_rope_trainable

        cos, sin = rope
        out = flash_attention_rope_trainable(q, k, v, cos, sin)
    else:
        if rope is not None:
            cos, sin = rope
            rope_fn = apply_rope_half if rope_layout == "half" else apply_rope
            q = rope_fn(q, cos, sin)
            k = rope_fn(k, cos, sin)
        out = sdpa(q, k, v, impl=impl)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, d)

    from .quant import maybe_qdense

    return maybe_qdense(out, p["proj"], quant_mode, compute_dtype=dtype)
