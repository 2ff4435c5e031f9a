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
