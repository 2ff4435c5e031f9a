"""Benchmark: end-to-end class-conditional sampling throughput.

Measures images/sec/chip for the reference's production inference config
(LDMAE/configs/imagenet/lightningdit_b_vmae_f8d16_cfg.yaml:62-80):
LightningDiT-B/1 at 256² (32²×16 latents), 250-step Euler ODE,
timestep_shift 0.3, CFG 10.0 with batch doubling + cfg-interval 0.10,
decoded through the VMAE f8d16 tokenizer to uint8 images — the whole
pipeline as one jitted XLA program on one chip.

Dual headline: the pipeline is measured twice — bf16 (the numerics-exact
config, `value`/`vs_baseline`, comparable to BENCH_r01-r04) and w8a8
(int8-quantized DiT matmuls, `w8a8_value`/`w8a8_vs_baseline`; passed its
distribution-level FID gate on 1024 real-chip images in round 4,
EVAL_NOTES.md "quant gate").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"w8a8_value", "w8a8_vs_baseline"}.
vs_baseline is vs. an analytic A100 reference estimate of the same pipeline
(~0.40 img/s/GPU — 106 TFLOPs/image on the TF32 fp32 pipeline as shipped at
~28% MFU; full derivation in BASELINE.md "A100 sampling-throughput
estimate"; north star is ≥2×).

Note: the per-iteration checksums exist to force device-side completion
(anti-fabrication sync through the async axon runtime), not to compare
modes — with bench's zero-init adaLN gates the blocks are ~identity, so
the bf16 and w8a8 legs decode the same images and their checksums match;
the w8a8 numerics/FID gate lives in perf_quant.py / perf_quant_fid.py.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

A100_BASELINE_IMGS_PER_SEC = 0.40  # analytic estimate, see module docstring


def _preempt_dress_run():
    """Stop a live dress-rehearsal sampling client before timing.

    The round-5 dress rehearsal (runs/dress_watchdog.sh) can hold the single
    chip for hours; a bench run sharing the device would record a depressed,
    contention-tainted number. If a dress client is alive (exact recorded
    PID in /tmp/dress_inference.pid — never pattern-matched), expire the
    watchdog's deadline file so it (and the stall-killer/monitor loops)
    exits instead of relaunching, then TERM the recorded wrapper (GNU
    timeout forwards to the python child) and escalate to KILL on the exact
    child PID if it wedges. Costs at most the in-flight batch; batch-level
    resume keeps the sample set consistent. Opt out with
    LDMAE_BENCH_PREEMPT_DRESS=0 (e.g. the prelude, which benches before the
    dress run starts).
    """
    if os.environ.get("LDMAE_BENCH_PREEMPT_DRESS", "1") == "0":
        return
    pid_file = os.environ.get("LDMAE_DRESS_PID_FILE", "/tmp/dress_inference.pid")
    try:
        with open(pid_file) as f:
            pid = int(f.read().strip())
        os.kill(pid, 0)  # raises if not alive
    except (OSError, ValueError):
        return
    deadline_file = os.environ.get(
        "LDMAE_DRESS_DEADLINE_FILE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "runs", "dress_deadline"),
    )
    try:
        with open(deadline_file, "w") as f:
            f.write(str(int(time.time()) - 61))
    except OSError:
        pass
    children = []
    try:
        import glob as _glob
        for cf in _glob.glob(f"/proc/{pid}/task/*/children"):
            with open(cf) as f:
                children += [int(c) for c in f.read().split()]
    except (OSError, ValueError):
        pass
    print(f"# preempting live dress-rehearsal client pid={pid} "
          f"children={children} (deadline expired)", file=sys.stderr)
    try:
        os.kill(pid, 15)
    except OSError:
        return
    for _ in range(30):
        time.sleep(1)
        try:
            os.kill(pid, 0)
        except OSError:
            break
    else:
        for c in children + [pid]:
            try:
                os.kill(c, 9)
            except OSError:
                pass
    time.sleep(5)  # let the runtime release the device


def main(batch: int = 36, iters: int = 3, num_steps: int = 250):
    _preempt_dress_run()
    # param prep = hundreds of small eager ops; on the remote-compiled axon
    # backend each can be its own remote compile (they sit below the
    # persistent-cache threshold) — BUILD on the local CPU backend like the
    # drivers do, then leave the context so the timed sampling calls run on
    # the accelerator (jit moves the uncommitted pytree there once)
    results = {}
    # LDMAE_QUANT pins a single leg (legacy knob); default is both headlines
    forced = os.environ.get("LDMAE_QUANT")
    modes = [forced or None] if "LDMAE_QUANT" in os.environ else [None, "w8a8"]
    from ldmae_tpu.utils.placement import cpu_prep_context

    for quant_mode in modes:
        with cpu_prep_context():
            sample_jit, bundle = _build(num_steps, quant_mode)
        # Commit the bundle to the accelerator ONCE (flatten-concat
        # transfer); a host-committed bundle would silently re-upload
        # ~565 MB of params on every timed call (-19% measured through the
        # tunnel, round 4).
        from ldmae_tpu.utils.placement import place_pytree

        bundle = place_pytree(bundle)
        results[quant_mode or "bf16"] = _run(
            sample_jit, bundle, batch, iters, num_steps, name=quant_mode or "bf16"
        )
        del sample_jit, bundle

    # headline = the bf16 leg; when LDMAE_QUANT pins a single non-bf16 leg,
    # that leg IS the headline (reporting 0.0 would record a bogus
    # zero-throughput datapoint for a run that measured fine)
    headline_key = "bf16" if "bf16" in results else next(iter(results))
    rec = {
        "metric": "sampling_throughput_imagenet256_lightningdit_b1_cfg",
        "value": round(results[headline_key], 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(results[headline_key] / A100_BASELINE_IMGS_PER_SEC, 3),
    }
    if headline_key != "bf16":
        rec["mode"] = headline_key
    for k, v in results.items():
        if k != headline_key:
            rec[f"{k}_value"] = round(v, 4)
            rec[f"{k}_vs_baseline"] = round(v / A100_BASELINE_IMGS_PER_SEC, 3)
    print(json.dumps(rec))
    return rec


def _build(num_steps: int, quant_mode=None):
    from ldmae_tpu.eval.sampling import make_sample_fn
    from ldmae_tpu.models.lightningdit import DiTConsts, dit_spec, init_dit_params
    from ldmae_tpu.models.vmae import VMAEConsts, init_vmae_params, vmae_spec
    from ldmae_tpu.transport import create_transport

    spec = dit_spec(
        "LightningDiT-B/1",
        input_size=32,
        in_channels=16,
        num_classes=1000,
        use_qknorm=True,
        use_swiglu=True,
        use_rope=True,
        use_rmsnorm=True,
    )
    consts = DiTConsts(spec)
    params = init_dit_params(jax.random.key(0), spec)
    # one-time q/k channel permutation -> cheap half-split RoPE (identical
    # attention; see ops/rope.py)
    from ldmae_tpu.models.lightningdit import merge_swiglu, permute_qk_for_half_rope

    params = merge_swiglu(permute_qk_for_half_rope(params, spec), spec)
    # int8 sampling (ops/quant.py): w8a8 is the second headline — its
    # distribution-level FID gate passed on 1024 real-chip images (round 4,
    # EVAL_NOTES.md); the bf16 leg stays the numerics-exact primary.
    if quant_mode:
        from ldmae_tpu.models.lightningdit import quantize_dit_params

        params = quantize_dit_params(params, spec)

    vspec = vmae_spec(
        "mae_for_ldmae_f8d16_prev",
        img_size=256,
        ldmae_mode=True,
        no_cls=True,
        kl_loss_weight=True,
        smooth_output=True,
    )
    vconsts = VMAEConsts(vspec)
    vparams = init_vmae_params(jax.random.key(1), vspec)

    transport = create_transport("Linear", "velocity", use_lognorm=True)
    latent_std = jnp.ones((1, 16, 1, 1))
    latent_mean = jnp.zeros((1, 16, 1, 1))

    sample_fn = make_sample_fn(
        spec,
        consts,
        transport,
        num_steps=num_steps,
        sampling_method="euler",
        timestep_shift=0.3,
        cfg_scale=10.0,
        cfg_interval=True,
        cfg_interval_start=0.10,
        cfg_channels=3,
        vae_spec=vspec,
        vae_consts=vconsts,
        compute_dtype=jnp.bfloat16,
        attn_impl=os.environ.get("LDMAE_ATTN_IMPL", "flash_rope"),
        rope_layout="half",
        adaln_impl=os.environ.get("LDMAE_ADALN_IMPL", "fused"),
        quant_mode=quant_mode,
        mlp_impl=os.environ.get("LDMAE_MLP_IMPL", "fused"),
    )
    sample_jit = jax.jit(sample_fn)
    bundle = {
        "dit": params,
        "vae": vparams,
        "latent_mean": latent_mean,
        "latent_std": latent_std,
    }
    return sample_jit, bundle


def _run(sample_jit, bundle, batch: int, iters: int, num_steps: int, name: str = "bf16"):
    y = jnp.arange(batch, dtype=jnp.int32) % 1000

    # The axon remote runtime's block_until_ready can return before the
    # device execution has actually finished (deep async dispatch queue),
    # which once made this loop time dispatch-only (~40x optimistic).
    # Force completion with a device-side reduce + 4-byte host readback;
    # the sum itself is negligible (one pass over 7 MB of uint8).
    _checksum = jax.jit(lambda a: jnp.sum(a, dtype=jnp.uint32))

    def _sync(x):
        return int(_checksum(x))

    # warmup / compile (also compiles _checksum)
    t0 = time.time()
    imgs = sample_jit(bundle, jax.random.key(42), y)
    _sync(imgs)
    compile_time = time.time() - t0
    assert imgs.shape == (batch, 256, 256, 3) and imgs.dtype == jnp.uint8

    times = []
    checksums = []
    for i in range(iters):
        t0 = time.time()
        imgs = sample_jit(bundle, jax.random.key(i), y)
        checksums.append(_sync(imgs))
        times.append(time.time() - t0)
    assert len(set(checksums)) == len(checksums), "identical outputs across keys"

    best = min(times)
    ips = batch / best
    print(
        f"# [{name}] batch={batch} steps={num_steps} compile={compile_time:.1f}s "
        f"times={['%.2f' % t for t in times]} checksums={checksums} "
        f"-> {ips:.4f} img/s/chip device={jax.devices()[0]}",
        file=sys.stderr,
    )
    return ips


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=36)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--num_steps", type=int, default=250)
    a = p.parse_args()
    main(a.batch, a.iters, a.num_steps)
