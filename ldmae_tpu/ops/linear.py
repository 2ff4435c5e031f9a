"""Linear / MLP primitives over explicit parameter dicts.

Parameter convention used throughout the framework:
  linear params = {"w": (in, out), "b": (out,)}  (bias optional)
PyTorch ``nn.Linear.weight`` is (out, in); the importer transposes.

All matmuls go through ``dense`` which casts operands to the compute dtype
and asks XLA for fp32 accumulation on the MXU.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def dense(x: jnp.ndarray, p: Params, compute_dtype: Optional[jnp.dtype] = None) -> jnp.ndarray:
    w = p["w"]
    if compute_dtype is None:
        compute_dtype = x.dtype
    out = jnp.dot(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    b = p.get("b")
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(compute_dtype)


def _dense_any(x: jnp.ndarray, p: Params, quant_mode: Optional[str]) -> jnp.ndarray:
    """dense() over either a full-precision or a quantized (ops/quant.py)
    linear param dict."""
    if "w_q" in p:
        from .quant import qdense

        return qdense(x, p, mode=quant_mode or "w8a8")
    return dense(x, p)


def mlp_gelu(
    x: jnp.ndarray, p: Params, approximate: bool = False,
    quant_mode: Optional[str] = None,
) -> jnp.ndarray:
    """timm-style Mlp: fc1 -> GELU -> fc2.

    VMAE blocks use exact GELU (timm default); DiT's non-SwiGLU path uses
    tanh-approximate GELU (lightningdit.py:214).
    """
    h = _dense_any(x, p["fc1"], quant_mode)
    h = jax.nn.gelu(h, approximate=approximate)
    return _dense_any(h, p["fc2"], quant_mode)


def swiglu_ffn(
    x: jnp.ndarray, p: Params, quant_mode: Optional[str] = None,
    impl: str = "xla",
) -> jnp.ndarray:
    """SwiGLU FFN matching swiglu_ffn.py:31-36.

    The torch module packs w1/w2 into one ``w12`` Linear and chunks the
    output: x1 = first hidden_features columns, x2 = the rest. We store the
    two halves separately ({"w1","w2","w3"}) so tensor-parallel sharding over
    the hidden dim stays aligned; the importer splits ``w12``. An optional
    pre-merged {"w12","w3"} layout (models/lightningdit.merge_swiglu) does
    one (D, 2H) matmul instead of two (D, H) ones.
    """
    if "w12" in p:
        if impl == "fused" and "w" in p["w12"]:
            # forward-only Pallas kernel: silu gate fused into the w12
            # matmul epilogue (ops/fused_adaln.fused_matmul_silu); None =
            # shapes outside the kernel tiling -> XLA fallback
            from .fused_adaln import fused_matmul_silu

            hidden = fused_matmul_silu(x, p["w12"]["w"], p["w12"].get("b"))
            if hidden is not None:
                return _dense_any(hidden, p["w3"], quant_mode)
        x12 = _dense_any(x, p["w12"], quant_mode)
        h = x12.shape[-1] // 2
        hidden = jax.nn.silu(x12[..., :h]) * x12[..., h:]
        return _dense_any(hidden, p["w3"], quant_mode)
    x1 = _dense_any(x, p["w1"], quant_mode)
    x2 = _dense_any(x, p["w2"], quant_mode)
    hidden = jax.nn.silu(x1) * x2
    return _dense_any(hidden, p["w3"], quant_mode)


def modulate(x: jnp.ndarray, shift: Optional[jnp.ndarray], scale: jnp.ndarray) -> jnp.ndarray:
    """adaLN modulation (lightningdit.py:26-30).

    x: (B, N, D); shift/scale: (B, D) broadcast over tokens. shift=None is
    the ``wo_shift`` variant.
    """
    scale = scale[:, None, :].astype(x.dtype)
    if shift is None:
        return x * (1.0 + scale)
    return x * (1.0 + scale) + shift[:, None, :].astype(x.dtype)
