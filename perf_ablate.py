"""Ablation probe: which DiT-forward features cost how much on TPU."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from ldmae_tpu.models.lightningdit import DiTConsts, dit_spec, init_dit_params, dit_forward
from ldmae_tpu.utils.profiling import dit_forward_flops


def _force(out):
    """Forced host readback: axon block_until_ready can return before the
    device execution finishes; a scalar fetch cannot."""
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))


def timeit(name, fn, *args, iters=5, flops=None):
    out = fn(*args)
    _force(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    dt = (time.time() - t0) / iters
    extra = f"  {flops / dt / 1e12:.1f} TF/s ({flops / dt / 197e12 * 100:.0f}% MFU)" if flops else ""
    print(f"{name:44s} {dt * 1000:8.2f} ms{extra}", flush=True)
    return dt


def bench_config(name, db=64, attn="flash", **overrides):
    kwargs = dict(
        input_size=32, in_channels=16, num_classes=1000,
        use_qknorm=True, use_swiglu=True, use_rope=True, use_rmsnorm=True,
    )
    kwargs.update(overrides)
    spec = dit_spec("LightningDiT-B/1", **kwargs)
    consts = DiTConsts(spec)
    params = init_dit_params(jax.random.key(0), spec)
    x = jax.random.normal(jax.random.key(1), (db, 16, 32, 32), jnp.bfloat16)
    t = jnp.full((db,), 0.5)
    y = (jnp.arange(db) % 1000).astype(jnp.int32)
    fwd = jax.jit(lambda p, x, t, y: dit_forward(
        p, spec, consts, x, t, y, compute_dtype=jnp.bfloat16, attn_impl=attn
    ).astype(jnp.bfloat16))
    flops = dit_forward_flops(spec, db)
    timeit(name, fwd, params, x, t, y, flops=flops)


if __name__ == "__main__":
    bench_config("baseline flash")
    bench_config("xla attention", attn="xla")
    bench_config("sdpa attention", attn="sdpa")
    bench_config("no qknorm", use_qknorm=False)
    bench_config("no rope", use_rope=False)
    bench_config("layernorm (no rmsnorm, no qknorm)", use_rmsnorm=False, use_qknorm=False)
    bench_config("gelu mlp (no swiglu)", use_swiglu=False)
