"""Component-level timing of the sampling step on real TPU.

Measures per-step cost of: bare DiT forward (doubled batch), forward+CFG
wrapper, a 16-step scan of each, and the VMAE decode — to locate overhead
beyond the model FLOPs. Not part of the test suite; a perf scratch tool.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from ldmae_tpu.models.lightningdit import DiTConsts, dit_spec, init_dit_params, dit_forward
from ldmae_tpu.models.vmae import VMAEConsts, init_vmae_params, vmae_spec, decode_to_images
from ldmae_tpu.transport.samplers import forward_with_cfg
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
    extra = ""
    if flops:
        extra = f"  {flops / dt / 1e12:.1f} TF/s ({flops / dt / 197e12 * 100:.0f}% MFU)"
    print(f"{name:40s} {dt * 1000:8.2f} ms{extra}")
    return dt


def main(batch=32, attn="flash"):
    spec = dit_spec(
        "LightningDiT-B/1", input_size=32, in_channels=16, num_classes=1000,
        use_qknorm=True, use_swiglu=True, use_rope=True, use_rmsnorm=True,
    )
    consts = DiTConsts(spec)
    params = init_dit_params(jax.random.key(0), spec)
    db = 2 * batch  # CFG-doubled

    x = jax.random.normal(jax.random.key(1), (db, 16, 32, 32), jnp.bfloat16)
    t = jnp.full((db,), 0.5)
    y = jnp.concatenate([jnp.arange(batch) % 1000, jnp.full((batch,), 1000)]).astype(jnp.int32)

    fwd = jax.jit(lambda p, x, t, y: dit_forward(
        p, spec, consts, x, t, y, compute_dtype=jnp.bfloat16, attn_impl=attn
    ).astype(jnp.bfloat16))
    flops = dit_forward_flops(spec, db)
    timeit(f"dit_forward bf16 {attn} (b={db})", fwd, params, x, t, y, flops=flops)

    cfg = jax.jit(lambda p, x, t, y: forward_with_cfg(
        lambda xx, tt, yy: dit_forward(
            p, spec, consts, xx, tt, yy, compute_dtype=jnp.bfloat16, attn_impl=attn
        ).astype(xx.dtype),
        x, t, y, 10.0, cfg_interval=True, cfg_interval_start=0.10, cfg_channels=3,
    ))
    timeit(f"forward_with_cfg (b={db})", cfg, params, x, t, y, flops=flops)

    def scan16(p, x0, y):
        def step(carry, i):
            tt = jnp.full((db,), 0.5)
            out = forward_with_cfg(
                lambda xx, t2, yy: dit_forward(
                    p, spec, consts, xx, t2, yy, compute_dtype=jnp.bfloat16, attn_impl=attn
                ).astype(xx.dtype),
                carry, tt, y, 10.0, cfg_interval=True, cfg_interval_start=0.10,
            )
            return (carry + 0.004 * out).astype(carry.dtype), None

        out, _ = jax.lax.scan(step, x0, jnp.arange(16))
        return out

    scan_jit = jax.jit(scan16)
    dt = timeit(f"16-step cfg scan (b={db})", scan_jit, params, x, y, flops=None)
    print(f"  -> per-step {dt / 16 * 1000:.2f} ms, implied img/s/chip over 249 steps: "
          f"{batch / (dt / 16 * 249):.3f} (sans decode)")

    vspec = vmae_spec("mae_for_ldmae_f8d16_prev", img_size=256, ldmae_mode=True,
                      no_cls=True, kl_loss_weight=True, smooth_output=True)
    vconsts = VMAEConsts(vspec)
    vparams = init_vmae_params(jax.random.key(2), vspec)
    z = jax.random.normal(jax.random.key(3), (batch, 16, 32, 32))
    dec = jax.jit(lambda p, z: decode_to_images(p, vspec, vconsts, z, compute_dtype=jnp.bfloat16))
    timeit(f"vmae decode_to_images (b={batch})", dec, vparams, z)


if __name__ == "__main__":
    import sys

    attn = sys.argv[1] if len(sys.argv) > 1 else "flash"
    main(attn=attn)
