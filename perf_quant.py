"""A/B: int8-quantized vs bf16 sampling on real TPU.

Measures end-to-end sampling throughput (same pipeline as bench.py) for
bf16, w8 (weight-only) and w8a8 (fused dynamic activation quant), and the
quality gate: pixel-level agreement of the decoded images against the bf16
pipeline for the SAME latent noise, plus an FID-proxy between image sets
(deterministic random-weight Inception — see EVAL_NOTES.md for why that is
a meaningful distribution-shift probe without the published weights).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ldmae_tpu.eval.sampling import make_sample_fn
from ldmae_tpu.models.lightningdit import (
    DiTConsts, dit_spec, init_dit_params, merge_swiglu,
    permute_qk_for_half_rope, quantize_dit_params,
)
from ldmae_tpu.models.vmae import VMAEConsts, init_vmae_params, vmae_spec
from ldmae_tpu.transport import create_transport


def build(batch, num_steps, quant_mode):
    # param prep = hundreds of small eager ops; on the remote-compiled axon
    # backend each is a remote compile — build on the local CPU backend
    # (PERF.md "Driver startup"), then commit once via place_pytree
    from ldmae_tpu.utils.placement import cpu_prep_context

    with cpu_prep_context():
        fn, bundle = _build(batch, num_steps, quant_mode)
    # Commit the bundle to the accelerator once — host-committed params
    # re-upload on every call through the tunnel (PERF.md round 4)
    from ldmae_tpu.utils.placement import place_pytree

    return fn, place_pytree(bundle)


def _build(batch, num_steps, quant_mode):
    spec = dit_spec(
        "LightningDiT-B/1", input_size=32, in_channels=16, num_classes=1000,
        use_qknorm=True, use_swiglu=True, use_rope=True, use_rmsnorm=True,
    )
    consts = DiTConsts(spec)
    params = init_dit_params(jax.random.key(0), spec)
    # zero-init adaLN gates would make the blocks identity (quality gate
    # vacuous): give every weight signal so quantization error propagates
    params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(jax.random.key(1), p.shape, p.dtype),
        params,
    )
    params = merge_swiglu(permute_qk_for_half_rope(params, spec), spec)
    if quant_mode:
        params = quantize_dit_params(params, spec)

    vspec = vmae_spec("mae_for_ldmae_f8d16_prev", img_size=256, ldmae_mode=True,
                      no_cls=True, kl_loss_weight=True, smooth_output=True)
    vconsts = VMAEConsts(vspec)
    vparams = init_vmae_params(jax.random.key(1), vspec)
    transport = create_transport("Linear", "velocity", use_lognorm=True)

    fn = make_sample_fn(
        spec, consts, transport, num_steps=num_steps, sampling_method="euler",
        timestep_shift=0.3, cfg_scale=10.0, cfg_interval=True,
        cfg_interval_start=0.10, cfg_channels=3,
        vae_spec=vspec, vae_consts=vconsts, compute_dtype=jnp.bfloat16,
        attn_impl="flash_rope", rope_layout="half", adaln_impl="fused",
        quant_mode=quant_mode,
    )
    bundle = {"dit": params, "vae": vparams,
              "latent_mean": jnp.zeros((1, 16, 1, 1)),
              "latent_std": jnp.ones((1, 16, 1, 1))}
    return jax.jit(fn), bundle


def main(batch=36, num_steps=250, iters=2):
    y = jnp.arange(batch, dtype=jnp.int32) % 1000
    results = {}
    images = {}
    for mode in (None, "w8", "w8a8"):
        name = mode or "bf16"
        fn, bundle = build(batch, num_steps, mode)
        t0 = time.time()
        imgs = fn(bundle, jax.random.key(42), y)
        imgs_h = np.asarray(imgs)  # host fetch = hard sync
        print(f"{name}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)
        images[name] = imgs_h
        times = []
        for i in range(iters):
            t0 = time.time()
            imgs = fn(bundle, jax.random.key(i), y)
            np.asarray(imgs)
            times.append(time.time() - t0)
        best = min(times)
        results[name] = batch / best
        print(f"{name}: times={['%.2f' % t for t in times]} "
              f"-> {batch/best:.4f} img/s/chip", flush=True)

    # quality gate: same key, same noise -> pixel agreement vs bf16
    ref = images["bf16"].astype(np.float32)
    for name in ("w8", "w8a8"):
        d = images[name].astype(np.float32) - ref
        mae = np.abs(d).mean()
        psnr = 10 * np.log10(255.0**2 / np.maximum((d**2).mean(), 1e-9))
        print(f"{name} vs bf16 (same noise): MAE={mae:.3f}/255  PSNR={psnr:.1f} dB")
    for name in ("w8", "w8a8"):
        print(f"speedup {name}: {results[name]/results['bf16']:.3f}x")


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 36
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 250
    main(batch, steps)
