"""LightningDiT — diffusion transformer, TPU-native.

Functional re-design of /root/reference/LDMAE/models/lightningdit.py:
adaLN-zero DiT with optional RoPE (EVA 2-D axial), QK-RMSNorm, SwiGLU FFN and
RMSNorm, matching the reference math block-for-block while organising the
computation for XLA:

  * parameters for all blocks are stacked on a leading depth axis and the
    block loop is a single ``lax.scan`` (one compiled block program, optional
    ``jax.checkpoint`` rematerialisation = the reference's use_checkpoint)
  * the fixed sin-cos positional table and RoPE cos/sin tables are constants
    (not parameters; recomputed for any resolution — replaces pe_reset)
  * patch embedding is patchify+matmul on the MXU (no conv)
  * compute in bf16 with fp32 accumulation; LayerNorm/RMSNorm in fp32

Registry names and all hyperparameters mirror lightningdit.py:498-531.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import (
    build_rope_table,
    dense,
    get_2d_sincos_pos_embed,
    layer_norm,
    mlp_gelu,
    modulate,
    multi_head_attention,
    rms_norm,
    swiglu_ffn,
    timestep_embedding_freqs,
    unpatchify,
)
from ..ops.patchify import patch_embed

Params = Dict[str, Any]


@dataclass(frozen=True)
class DiTSpec:
    input_size: int = 32
    patch_size: int = 2
    in_channels: int = 32
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    class_dropout_prob: float = 0.1
    num_classes: int = 1000
    learn_sigma: bool = False
    use_qknorm: bool = False
    use_swiglu: bool = False
    use_rope: bool = False
    use_rmsnorm: bool = False
    wo_shift: bool = False
    use_checkpoint: bool = False
    freq_embed_size: int = 256
    # remat granularity when use_checkpoint (trades HBM for recompute):
    #   'full'  — save only block boundaries, recompute everything (min HBM)
    #   'attn'  — additionally save the flash-attention outputs (~B·N·D per
    #             block): the backward never re-runs the attention kernel
    #   'dots'  — save all matmul outputs too; the backward only recomputes
    #             cheap elementwise ops (largest HBM footprint)
    remat_policy: str = "full"
    # lax.scan unroll factor for the block loop (1 = rolled). Unrolling
    # constant-folds the per-layer dynamic-slice of the stacked params and
    # lets XLA schedule across block boundaries, at higher compile time.
    scan_unroll: int = 1

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    @property
    def num_patches(self) -> int:
        return (self.input_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def num_adaln(self) -> int:
        return 4 if self.wo_shift else 6

    @property
    def mlp_hidden(self) -> int:
        return int(self.hidden_size * self.mlp_ratio)

    @property
    def swiglu_hidden(self) -> int:
        # lightningdit.py:217 — int(2/3 * mlp_hidden)
        return int(2 / 3 * self.mlp_hidden)


class DiTConsts:
    """Non-trainable tables derived from the spec."""

    def __init__(self, spec: DiTSpec):
        grid = spec.input_size // spec.patch_size
        self.pos_embed = jnp.asarray(
            get_2d_sincos_pos_embed(spec.hidden_size, grid)
        )
        self.t_freqs = jnp.asarray(timestep_embedding_freqs(spec.freq_embed_size))
        if spec.use_rope:
            from ..ops.rope import to_half_layout

            cos, sin = build_rope_table(spec.head_dim // 2, grid)
            self.rope = (jnp.asarray(cos), jnp.asarray(sin))
            self.rope_half = (
                jnp.asarray(to_half_layout(cos)),
                jnp.asarray(to_half_layout(sin)),
            )
        else:
            self.rope = None
            self.rope_half = None


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _xavier(key, shape, fan_in, fan_out):
    a = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, minval=-a, maxval=a, dtype=jnp.float32)


def init_dit_params(key: jax.Array, spec: DiTSpec) -> Params:
    """Initialisation matching LightningDiT.initialize_weights
    (lightningdit.py:340-374): xavier-uniform linears (patch-embed viewed as
    linear), N(0,0.02) embeddings and t-MLP, zero adaLN and final linear."""
    # 3 embedder keys + up to 6 stacked-weight draws per block (qkv, proj,
    # w1/w2/w3 or fc1/fc2) — sized for the deepest registry entries (the
    # old fixed 64 overflowed for depth > 12, e.g. XL/1)
    keys = iter(jax.random.split(key, 8 + 6 * spec.depth))
    d = spec.hidden_size
    p = spec.patch_size
    pin = p * p * spec.in_channels
    hd = spec.head_dim
    l = spec.depth

    params: Params = {}
    params["x_embedder"] = {
        "w": _xavier(next(keys), (pin, d), pin, d),
        "b": jnp.zeros((d,)),
    }
    params["t_embedder"] = {
        "fc1": {
            "w": jax.random.normal(next(keys), (spec.freq_embed_size, d)) * 0.02,
            "b": jnp.zeros((d,)),
        },
        "fc2": {
            "w": jax.random.normal(next(keys), (d, d)) * 0.02,
            "b": jnp.zeros((d,)),
        },
    }
    n_embed = spec.num_classes + (1 if spec.class_dropout_prob > 0 else 0)
    params["y_embedder"] = {
        "table": jax.random.normal(next(keys), (n_embed, d)) * 0.02
    }

    def stack(f):
        return jnp.stack([f(next(keys)) for _ in range(l)])

    attn: Params = {
        "qkv": {
            "w": stack(lambda k: _xavier(k, (d, 3, d), d, 3 * d)),
            "b": jnp.zeros((l, 3, d)),
        },
        "proj": {
            "w": stack(lambda k: _xavier(k, (d, d), d, d)),
            "b": jnp.zeros((l, d)),
        },
    }
    if spec.use_qknorm:
        if spec.use_rmsnorm:
            attn["q_norm"] = {"scale": jnp.ones((l, hd))}
            attn["k_norm"] = {"scale": jnp.ones((l, hd))}
        else:  # LayerNorm(head_dim) with affine (torch default)
            attn["q_norm"] = {"scale": jnp.ones((l, hd)), "bias": jnp.zeros((l, hd))}
            attn["k_norm"] = {"scale": jnp.ones((l, hd)), "bias": jnp.zeros((l, hd))}

    if spec.use_swiglu:
        h = spec.swiglu_hidden
        mlp: Params = {
            "w1": {"w": stack(lambda k: _xavier(k, (d, h), d, 2 * h)), "b": jnp.zeros((l, h))},
            "w2": {"w": stack(lambda k: _xavier(k, (d, h), d, 2 * h)), "b": jnp.zeros((l, h))},
            "w3": {"w": stack(lambda k: _xavier(k, (h, d), h, d)), "b": jnp.zeros((l, d))},
        }
    else:
        h = spec.mlp_hidden
        mlp = {
            "fc1": {"w": stack(lambda k: _xavier(k, (d, h), d, h)), "b": jnp.zeros((l, h))},
            "fc2": {"w": stack(lambda k: _xavier(k, (h, d), h, d)), "b": jnp.zeros((l, d))},
        }

    blocks: Params = {
        "attn": attn,
        "mlp": mlp,
        "adaln": {
            "w": jnp.zeros((l, d, spec.num_adaln, d)),
            "b": jnp.zeros((l, spec.num_adaln, d)),
        },
    }
    if spec.use_rmsnorm:
        blocks["norm1"] = {"scale": jnp.ones((l, d))}
        blocks["norm2"] = {"scale": jnp.ones((l, d))}
    params["blocks"] = blocks

    params["final_layer"] = {
        "adaln": {"w": jnp.zeros((d, 2, d)), "b": jnp.zeros((2, d))},
        "linear": {
            "w": jnp.zeros((d, p * p * spec.out_channels)),
            "b": jnp.zeros((p * p * spec.out_channels,)),
        },
    }
    if spec.use_rmsnorm:
        params["final_layer"]["norm"] = {"scale": jnp.ones((d,))}
    return params


def permute_qk_for_half_rope(
    params: Params, spec: DiTSpec, inverse: bool = False
) -> Params:
    """Permute q/k head-dim channels (weights, biases, qk-norm scales) from
    EVA-interleaved to half-split so apply_rope_half computes the identical
    attention (logits are permutation-invariant). Safe for training too: the
    transform is a reparametrisation and AdamW/EMA are elementwise, so the
    permuted trajectory is exactly the permutation of the canonical one.
    ``inverse=True`` undoes it (for exporting torch checkpoints)."""
    import numpy as _np

    from ..ops.rope import rope_channel_permutation

    if not spec.use_rope:
        return params
    hd = spec.head_dim
    nh = spec.num_heads
    d = spec.hidden_size
    perm = rope_channel_permutation(hd)
    if inverse:
        perm = _np.argsort(perm)

    perm = jnp.asarray(perm)

    def permute_w(w):
        # (L, D, 3, D): last dim = (H, hd); permute hd for q (idx 0), k (1)
        l = w.shape[0]
        w = w.reshape(l, d, 3, nh, hd)
        w = w.at[:, :, 0].set(jnp.take(w[:, :, 0], perm, axis=-1))
        w = w.at[:, :, 1].set(jnp.take(w[:, :, 1], perm, axis=-1))
        return w.reshape(l, d, 3, d)

    def permute_b(b):
        l = b.shape[0]
        b = b.reshape(l, 3, nh, hd)
        b = b.at[:, 0].set(jnp.take(b[:, 0], perm, axis=-1))
        b = b.at[:, 1].set(jnp.take(b[:, 1], perm, axis=-1))
        return b.reshape(l, 3, d)

    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree
    attn = dict(out["blocks"]["attn"])
    qkv = dict(attn["qkv"])
    qkv["w"] = permute_w(qkv["w"])
    if "b" in qkv:
        qkv["b"] = permute_b(qkv["b"])
    attn["qkv"] = qkv
    for nk in ("q_norm", "k_norm"):
        if nk in attn:
            node = dict(attn[nk])
            node["scale"] = node["scale"][:, perm]
            if "bias" in node:
                node["bias"] = node["bias"][:, perm]
            attn[nk] = node
    blocks = dict(out["blocks"])
    blocks["attn"] = attn
    out = dict(out)
    out["blocks"] = blocks
    return out


def merge_swiglu(params: Params, spec: DiTSpec) -> Params:
    """Merge the SwiGLU w1/w2 halves into a single (L, D, 2H) ``w12`` matmul
    weight (one MXU pass instead of two). Inference-time transform; the
    canonical split layout stays the training/checkpoint format."""
    if not spec.use_swiglu:
        return params
    blocks = dict(params["blocks"])
    mlp = blocks["mlp"]
    if "w12" in mlp:
        return params
    w12 = {
        "w": jnp.concatenate([mlp["w1"]["w"], mlp["w2"]["w"]], axis=-1),
        "b": jnp.concatenate([mlp["w1"]["b"], mlp["w2"]["b"]], axis=-1),
    }
    blocks["mlp"] = {"w12": w12, "w3": mlp["w3"]}
    out = dict(params)
    out["blocks"] = blocks
    return out


def quantize_dit_params(params: Params, spec: DiTSpec) -> Params:
    """int8-quantize the block matmul weights (qkv, mlp, adaLN) for
    sampling — see ops/quant.py. Inference-time transform like merge_swiglu;
    apply AFTER permute_qk_for_half_rope/merge_swiglu (it quantizes whatever
    weight layout it finds). Embedders/final layer stay fp (tiny matmuls,
    and the final projection sets the output's numerical floor). The
    attention out-projection also stays fp: on v5e its int8 matmul saves
    less than the activation-quantization pass costs (PERF.md round 2).

    The stacked qkv (L, D, 3, D) and adaln (L, D, na, D) weights are
    flattened to (L, D, out) here so the per-output-channel scales line up;
    ``_block``/attention consume the flat layout directly when they see
    ``w_q``.
    """
    from ..ops.quant import quantize_linear

    d = spec.hidden_size
    na = spec.num_adaln
    blocks = dict(params["blocks"])

    attn = dict(blocks["attn"])
    qkv = attn["qkv"]
    l = qkv["w"].shape[0]
    flat_qkv = {"w": qkv["w"].reshape(l, d, 3 * d)}
    if qkv.get("b") is not None:
        flat_qkv["b"] = qkv["b"].reshape(l, 3 * d)
    attn["qkv"] = quantize_linear(flat_qkv)
    blocks["attn"] = attn

    blocks["mlp"] = {
        k: (quantize_linear(v) if "w" in v else v)
        for k, v in blocks["mlp"].items()
    }

    adaln = blocks["adaln"]
    flat_adaln = {
        "w": adaln["w"].reshape(l, d, na * d),
        "b": adaln["b"].reshape(l, na * d),
    }
    blocks["adaln"] = quantize_linear(flat_adaln)

    out = dict(params)
    out["blocks"] = blocks
    return out


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def timestep_embedding(
    t: jnp.ndarray, freqs: jnp.ndarray, dim: int
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (lightningdit.py:108-131): [cos | sin]."""
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def _norm(x, p, use_rmsnorm):
    if use_rmsnorm:
        return rms_norm(x, p["scale"])
    return layer_norm(x, eps=1e-6)


def _norm_modulate(x, p, shift, scale, use_rmsnorm, adaln_impl):
    """norm → modulate; adaln_impl='fused' uses the Pallas epilogue kernel
    (sampling path — forward-only), 'xla' the differentiable lowering."""
    if adaln_impl == "fused" and shift is not None:
        from ..ops.fused_adaln import fused_norm_modulate

        return fused_norm_modulate(
            x,
            p["scale"] if use_rmsnorm else None,
            shift,
            scale,
            kind="rms" if use_rmsnorm else "layer",
        )
    return modulate(_norm(x, p, use_rmsnorm), shift, scale)


def _block(
    x: jnp.ndarray,
    c_mod: jnp.ndarray,
    bp: Params,
    spec: DiTSpec,
    rope,
    attn_impl: str,
    rope_layout: str = "interleaved",
    adaln_impl: str = "xla",
    quant_mode: Optional[str] = None,
    mlp_impl: str = "xla",
) -> jnp.ndarray:
    """One LightningDiT block (lightningdit.py:239-250).

    c_mod: precomputed SiLU(c) (B, D) — the adaLN projection happens here
    per block (batching all layers' projections before the scan measured
    neutral for sampling and slower for training: the (L,B,na,D) tensor
    becomes a saved remat residual).
    """
    d = spec.hidden_size
    na = spec.num_adaln
    if "w_q" in bp["adaln"]:
        from ..ops.quant import qdense

        mod = qdense(c_mod, bp["adaln"], mode=quant_mode or "w8a8")
    else:
        mod = dense(c_mod, {"w": bp["adaln"]["w"].reshape(d, na * d), "b": bp["adaln"]["b"].reshape(na * d)})
    mod = mod.reshape(-1, na, d)
    if spec.wo_shift:
        scale_msa, gate_msa, scale_mlp, gate_mlp = [mod[:, i] for i in range(4)]
        shift_msa = shift_mlp = None
    else:
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
            mod[:, i] for i in range(6)
        ]

    # w8a8 + fused epilogue: the adaLN kernel emits the int8 activation and
    # row scales directly (no bf16 h in HBM, no standalone quantization
    # pass) and the int8 matmuls ride the MXU's 2x int8 rate.
    fused_quant = (
        quant_mode == "w8a8"
        and adaln_impl == "fused"
        and shift_msa is not None
        and "w_q" in bp["attn"]["qkv"]
        and "w12" in bp["mlp"]
    )
    if fused_quant:
        from ..ops.fused_adaln import fused_norm_modulate_quant
        from ..ops.quant import swiglu_ffn_quant

        kind = "rms" if spec.use_rmsnorm else "layer"
        norm1 = bp.get("norm1")
        h_q, h_s = fused_norm_modulate_quant(
            x, norm1["scale"] if norm1 else None, shift_msa, scale_msa, kind=kind
        )
        attn_out = multi_head_attention(
            None,
            bp["attn"],
            spec.num_heads,
            rope=rope,
            rope_layout=rope_layout,
            qk_norm_kind=kind,
            impl=attn_impl,
            x_quant=(h_q, h_s),
            out_dtype=x.dtype,
        )
        x = x + gate_msa[:, None, :].astype(x.dtype) * attn_out

        norm2 = bp.get("norm2")
        h_q, h_s = fused_norm_modulate_quant(
            x, norm2["scale"] if norm2 else None, shift_mlp, scale_mlp, kind=kind
        )
        mlp_out = swiglu_ffn_quant(h_q, h_s, bp["mlp"], compute_dtype=x.dtype)
        x = x + gate_mlp[:, None, :].astype(x.dtype) * mlp_out
        return x

    h = _norm_modulate(
        x, bp.get("norm1"), shift_msa, scale_msa, spec.use_rmsnorm, adaln_impl
    )
    attn_out = multi_head_attention(
        h,
        bp["attn"],
        spec.num_heads,
        rope=rope,
        rope_layout=rope_layout,
        qk_norm_kind="rms" if spec.use_rmsnorm else "layer",
        impl=attn_impl,
        quant_mode=quant_mode,
    )
    from jax.ad_checkpoint import checkpoint_name

    attn_out = checkpoint_name(attn_out, "attn_out")
    x = x + gate_msa[:, None, :].astype(x.dtype) * attn_out

    h = _norm_modulate(
        x, bp.get("norm2"), shift_mlp, scale_mlp, spec.use_rmsnorm, adaln_impl
    )
    if spec.use_swiglu:
        mlp_out = swiglu_ffn(h, bp["mlp"], quant_mode=quant_mode, impl=mlp_impl)
    else:
        mlp_out = mlp_gelu(h, bp["mlp"], approximate=True, quant_mode=quant_mode)
    x = x + gate_mlp[:, None, :].astype(x.dtype) * mlp_out
    return x


def dit_forward(
    params: Params,
    spec: DiTSpec,
    consts: DiTConsts,
    x: jnp.ndarray,
    t: jnp.ndarray,
    y: jnp.ndarray,
    *,
    train: bool = False,
    label_drop_key: Optional[jax.Array] = None,
    force_drop_ids: Optional[jnp.ndarray] = None,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    attn_impl: str = "xla",
    rope_layout: str = "interleaved",
    adaln_impl: str = "xla",
    quant_mode: Optional[str] = None,
    mlp_impl: str = "xla",
) -> jnp.ndarray:
    """Forward pass. x: (N, C, H, W) NCHW latents; t, y: (N,).

    rope_layout='half' requires params transformed by
    permute_qk_for_half_rope (exact same function, faster rope on TPU).

    quant_mode ('w8' | 'w8a8') requires params transformed by
    quantize_dit_params (inference only).

    Returns (N, out_channels or in_channels, H, W) in float32.
    """
    b = x.shape[0]
    d = spec.hidden_size

    tokens = patch_embed(
        x.astype(compute_dtype), params["x_embedder"], spec.patch_size,
        compute_dtype=compute_dtype,
    )
    tokens = tokens + consts.pos_embed.astype(compute_dtype)[None]

    # timestep embedding (fp32 freqs, then MLP in compute dtype)
    t_freq = timestep_embedding(t, consts.t_freqs, spec.freq_embed_size)
    t_emb = dense(t_freq.astype(compute_dtype), params["t_embedder"]["fc1"])
    t_emb = jax.nn.silu(t_emb)
    t_emb = dense(t_emb, params["t_embedder"]["fc2"])

    # label embedding with CFG dropout (lightningdit.py:152-169)
    use_dropout = spec.class_dropout_prob > 0
    labels = y
    if (train and use_dropout) or (force_drop_ids is not None):
        if force_drop_ids is not None:
            drop = force_drop_ids == 1
        else:
            assert label_drop_key is not None, "label dropout needs an rng key"
            drop = (
                jax.random.uniform(label_drop_key, (b,)) < spec.class_dropout_prob
            )
        labels = jnp.where(drop, spec.num_classes, labels)
    y_emb = params["y_embedder"]["table"].astype(compute_dtype)[labels]

    c = t_emb + y_emb
    c_mod = jax.nn.silu(c)

    rope_tables = (
        consts.rope_half if (rope_layout == "half" and consts.rope is not None)
        else consts.rope
    )
    block_fn = partial(
        _block, spec=spec, rope=rope_tables, attn_impl=attn_impl,
        rope_layout=rope_layout, adaln_impl=adaln_impl, quant_mode=quant_mode,
        mlp_impl=mlp_impl,
    )
    if spec.use_checkpoint:
        if spec.remat_policy == "dots":
            # matmul outputs are saved; the Pallas flash-attention output is
            # not a dot_general so it must be named to be saveable
            policy = jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                jax.checkpoint_policies.save_only_these_names("attn_out"),
            )
            block_fn = jax.checkpoint(block_fn, policy=policy)
        elif spec.remat_policy == "attn":
            policy = jax.checkpoint_policies.save_only_these_names("attn_out")
            block_fn = jax.checkpoint(block_fn, policy=policy)
        else:
            block_fn = jax.checkpoint(block_fn)

    def scan_body(carry, bp):
        return block_fn(carry, c_mod, bp), None

    tokens, _ = jax.lax.scan(
        scan_body, tokens, params["blocks"], unroll=spec.scan_unroll
    )

    # final layer (lightningdit.py:267-272): chunk(2) -> (shift, scale)
    fl = params["final_layer"]
    mod = dense(c_mod, {"w": fl["adaln"]["w"].reshape(d, 2 * d), "b": fl["adaln"]["b"].reshape(2 * d)})
    mod = mod.reshape(b, 2, d)
    shift, scale = mod[:, 0], mod[:, 1]
    h = modulate(_norm(tokens, fl.get("norm"), spec.use_rmsnorm), shift, scale)
    h = dense(h, fl["linear"])

    out = unpatchify(h.astype(jnp.float32), spec.patch_size, spec.out_channels)
    if spec.learn_sigma:
        out = out[:, : spec.in_channels]
    return out


# ---------------------------------------------------------------------------
# Registry (lightningdit.py:498-531)
# ---------------------------------------------------------------------------

_REGISTRY = {
    "LightningDiT-XL/1": dict(depth=28, hidden_size=1152, patch_size=1, num_heads=16),
    "LightningDiT-XL/2": dict(depth=28, hidden_size=1152, patch_size=2, num_heads=16),
    "LightningDiT-L/2": dict(depth=24, hidden_size=1024, patch_size=2, num_heads=16),
    "LightningDiT-B/1": dict(depth=12, hidden_size=768, patch_size=1, num_heads=12),
    "LightningDiT-B/2": dict(depth=12, hidden_size=768, patch_size=2, num_heads=12),
    "LightningDiT-1p0B/1": dict(depth=24, hidden_size=1536, patch_size=1, num_heads=24),
    "LightningDiT-1p0B/2": dict(depth=24, hidden_size=1536, patch_size=2, num_heads=24),
    "LightningDiT-1p6B/1": dict(depth=28, hidden_size=1792, patch_size=1, num_heads=28),
    "LightningDiT-1p6B/2": dict(depth=28, hidden_size=1792, patch_size=2, num_heads=28),
    # tiny config for CPU smoke tests / CI (not in the reference registry)
    "LightningDiT-debug": dict(depth=2, hidden_size=64, patch_size=1, num_heads=4),
}


def dit_spec(model_type: str, **overrides) -> DiTSpec:
    base = dict(_REGISTRY[model_type])
    base.update(overrides)
    return DiTSpec(**base)


def list_models():
    return sorted(_REGISTRY)
