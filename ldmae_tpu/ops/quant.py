"""int8 quantization for inference-time matmuls.

Round-2 perf lever for the sampling path (PERF.md "next levers" 4): the DiT
sampling step is MXU-bound and v5e's MXU runs int8 at 2x the bf16 rate
(394 TOPS vs 197 TFLOPS). Two modes, both inference-only transforms — the
training/checkpoint format stays fp32, exactly like ``merge_swiglu`` /
``permute_qk_for_half_rope``:

  * ``w8`` (weight-only): weights stored int8 + per-output-channel fp scale,
    dequantized to bf16 right before the matmul. Halves HBM weight traffic;
    the matmul itself stays bf16. Numerically this is just bf16 matmul
    against a slightly-perturbed weight (max |dw| <= scale/2), so accuracy
    risk is minimal. Wins only where weight reads matter (small M, e.g.
    the per-sample adaLN projections).
  * ``w8a8`` (dynamic): per-output-channel int8 weights and per-row
    (per-token) dynamic int8 activations feed an int8xint8->int32 MXU
    matmul, dequantized by (row_scale x col_scale). This is the 2x-MXU
    path; accuracy is gated by tests/test_quant.py and an FID-proxy A/B
    (EVAL_NOTES.md).

The reference has no quantized path (torch fp32/TF32 end to end) — this is
a TPU-native addition, opt-in via ``--quant {w8,w8a8}`` on cli/inference.py,
default off.

Param convention: a quantized linear is a dict
  {"w_q": int8 (..., in, out), "w_scale": fp32 (..., out), "b": optional}
produced by ``quantize_linear``. ``qdense`` consumes it; ``dense`` callers
route here when they see "w_q".
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

_EPS = 1e-8


def quantize_linear(p: Params) -> Params:
    """{"w": (..., in, out) fp, "b": ...} -> {"w_q", "w_scale", "b"}.

    Symmetric per-output-channel (last axis) int8: scale = absmax/127 over
    the contraction (second-to-last) axis. Leading stacked-layer axes are
    preserved (the DiT stores block weights as (L, in, out)).
    """
    w = jnp.asarray(p["w"], jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)  # (..., 1, out)
    scale = jnp.maximum(absmax / 127.0, _EPS)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out: Params = {"w_q": w_q, "w_scale": scale.squeeze(-2)}
    if p.get("b") is not None:
        out["b"] = p["b"]
    return out


def _quantize_rows(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic symmetric per-row int8 quantization of activations.

    x: (..., K). Returns (int8 x, fp32 per-row scale (..., 1))."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, _EPS)
    x_q = jnp.round(xf / scale).astype(jnp.int8)
    return x_q, scale


def qdense(
    x: jnp.ndarray,
    p: Params,
    mode: str = "w8a8",
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Quantized counterpart of ``linear.dense`` for params from
    ``quantize_linear``. Output dtype follows the input (like dense)."""
    if compute_dtype is None:
        compute_dtype = x.dtype
    w_q, w_scale = p["w_q"], p["w_scale"]
    if mode == "w8":
        w = w_q.astype(compute_dtype) * w_scale.astype(compute_dtype)[..., None, :]
        out = jnp.dot(x.astype(compute_dtype), w, preferred_element_type=jnp.float32)
    elif mode == "w8a8":
        x_q, x_scale = _quantize_rows(x)
        acc = jnp.dot(x_q, w_q, preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * x_scale * w_scale[..., None, :].astype(jnp.float32)
    else:
        raise ValueError(f"unknown quant mode: {mode}")
    b = p.get("b")
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(compute_dtype)


def qdense_pre(
    x_q: jnp.ndarray,
    x_scale: jnp.ndarray,
    p: Params,
    compute_dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """w8a8 matmul over an activation already quantized by a producer kernel
    (ops/fused_adaln.fused_norm_modulate_quant / fused_silu_mul_quant).

    x_q: int8 (..., K); x_scale: fp32 (..., 1)."""
    acc = jnp.dot(x_q, p["w_q"], preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * x_scale * p["w_scale"][..., None, :].astype(jnp.float32)
    b = p.get("b")
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(compute_dtype)


def swiglu_ffn_quant(
    x_q: jnp.ndarray,
    x_scale: jnp.ndarray,
    p: Params,
    compute_dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """SwiGLU FFN over a pre-quantized input with the silu-gate + w3-input
    quantization fused into one Pallas pass. Requires the merged {"w12","w3"}
    quantized layout (models/lightningdit.merge_swiglu then
    quantize_dit_params)."""
    from .fused_adaln import fused_silu_mul_quant

    x12 = qdense_pre(x_q, x_scale, p["w12"], compute_dtype)
    h_q, h_s = fused_silu_mul_quant(x12)
    return qdense_pre(h_q, h_s, p["w3"], compute_dtype)


def maybe_qdense(
    x: jnp.ndarray,
    p: Params,
    mode: Optional[str],
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """dense() that transparently takes either layout. Used by model code so
    one forward serves quantized and full-precision param trees."""
    from .linear import dense

    if "w_q" in p:
        return qdense(x, p, mode=mode or "w8a8", compute_dtype=compute_dtype)
    return dense(x, p, compute_dtype=compute_dtype)
