"""Profiling hooks.

The reference has only wall-clock timing (SURVEY.md §5.1); here we expose
``jax.profiler`` traces (viewable in TensorBoard/Perfetto) plus an MFU
estimate helper for the DiT forward.
"""

from __future__ import annotations

import contextlib
import os
import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/ldmae_trace"):
    """Capture a profiler trace around a block:

        with profiling.trace("/tmp/trace"):
            step(state, batch, rng); jax.block_until_ready(...)
    """
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside traced code (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


def dit_forward_flops(spec, batch: int, with_cfg: bool = False) -> float:
    """Analytic FLOPs of one LightningDiT forward (2·params·tokens matmul
    cost + attention) for MFU accounting."""
    d = spec.hidden_size
    n = spec.num_patches
    l = spec.depth
    if spec.use_swiglu:
        mlp = 3 * d * spec.swiglu_hidden
    else:
        mlp = 2 * d * spec.mlp_hidden
    per_layer_params = 4 * d * d + mlp
    matmul_flops = 2 * l * per_layer_params * n
    attn_flops = l * 4 * n * n * d
    # adaLN projections act on the (B, D) conditioning vector, once per
    # SAMPLE per layer — not per token (counting them per-token overstated
    # B/1 FLOPs by ~46% and inflated reported MFU in round 1)
    adaln_flops = 2 * l * spec.num_adaln * d * d
    embed = 2 * n * spec.patch_size**2 * spec.in_channels * d
    total = (matmul_flops + attn_flops + adaln_flops + embed) * batch
    return total * (2 if with_cfg else 1)


def _vit_stack_flops(n: int, d: int, depth: int, mlp_ratio: float) -> float:
    """Matmul + attention FLOPs of `depth` standard pre-LN ViT blocks on
    `n` tokens of width `d` (qkv+proj = 4d², MLP = 2·d·(d·mlp_ratio))."""
    per_layer_params = 4 * d * d + 2 * d * int(d * mlp_ratio)
    return depth * (2 * n * per_layer_params + 4 * n * n * d)


def vmae_forward_flops(spec, batch: int, mask_ratio: float = 0.0) -> float:
    """Analytic FLOPs of one VMAE forward (encoder on visible tokens +
    decoder on the full grid) for MFU accounting. Matches the reference
    architecture (models_mae.py:283-408): encoder keeps
    ``L·(1-mask_ratio)`` tokens, the decoder always runs all ``L``."""
    L = spec.num_patches
    n_vis = int(L * (1 - mask_ratio)) + spec.num_extra_tokens
    enc = _vit_stack_flops(n_vis, spec.embed_dim, spec.depth, spec.mlp_ratio)
    dec = _vit_stack_flops(
        L + spec.num_extra_tokens,
        spec.decoder_embed_dim,
        spec.decoder_depth,
        spec.mlp_ratio,
    )
    p2c = spec.patch_size**2 * spec.in_chans
    heads = (
        2 * L * p2c * spec.embed_dim  # patch embed
        + 2 * n_vis * spec.embed_dim * spec.encoder_latent_dim  # to_latent
        + 2 * L * spec.latent_dim * spec.embed_dim  # from_latent
        + 2 * L * spec.embed_dim * spec.decoder_embed_dim  # decoder_embed
        + 2 * L * spec.decoder_embed_dim * p2c  # decoder_pred
    )
    return (enc + dec + heads) * batch
