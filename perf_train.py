"""Train-step throughput on real TPU (LightningDiT-B/1 production config)."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from ldmae_tpu.models.lightningdit import DiTConsts, dit_spec, init_dit_params
from ldmae_tpu.train.state import init_train_state
from ldmae_tpu.train.train_dit import make_optimizer, make_train_step
from ldmae_tpu.transport import create_transport
from ldmae_tpu.utils.profiling import dit_forward_flops

def run(batch, attn, rope_layout="interleaved", remat="full", use_checkpoint=True,
        adaln="xla", merged_w12=False, unroll=1):
    spec = dit_spec("LightningDiT-B/1", input_size=32, in_channels=16,
                    num_classes=1000, use_qknorm=True, use_swiglu=True,
                    use_rope=True, use_rmsnorm=True,
                    use_checkpoint=use_checkpoint, remat_policy=remat,
                    scan_unroll=unroll)
    consts = DiTConsts(spec)
    params = init_dit_params(jax.random.key(0), spec)
    transport = create_transport("Linear", "velocity", use_lognorm=True)
    tx = make_optimizer(2e-4, 0.95)
    if rope_layout == "half":
        from ldmae_tpu.models.lightningdit import permute_qk_for_half_rope

        params = permute_qk_for_half_rope(params, spec)
    if merged_w12:
        from ldmae_tpu.models.lightningdit import merge_swiglu

        params = merge_swiglu(params, spec)
    step = jax.jit(make_train_step(spec, consts, transport, tx,
                                   compute_dtype=jnp.bfloat16, attn_impl=attn,
                                   rope_layout=rope_layout, adaln_impl=adaln),
                   donate_argnums=(0,))
    state = init_train_state(params, tx)
    batch_d = {"x": jax.random.normal(jax.random.key(1), (batch, 16, 32, 32)),
               "y": (jnp.arange(batch) % 1000).astype(jnp.int32)}
    rng = jax.random.key(2)
    state, m = step(state, batch_d, rng)
    float(m["loss"])  # forced readback: axon block_until_ready may return early
    t0 = time.time(); iters = 5
    for _ in range(iters):
        state, m = step(state, batch_d, rng)
    float(m["loss"])  # steps chain through donated state; forcing the last forces all
    dt = (time.time() - t0) / iters
    flops = 3 * dit_forward_flops(spec, batch)  # fwd + ~2x bwd
    print(f"train step b={batch} attn={attn} rope={rope_layout} remat={remat} "
          f"ckpt={use_checkpoint} adaln={adaln}: "
          f"{dt*1000:.1f} ms, {batch/dt:.1f} img/s, "
          f"~{flops/dt/1e12:.0f} TF/s ({flops/dt/197e12*100:.0f}% MFU)",
          flush=True)

if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "half":
        run(32, "flash", rope_layout="half")
    elif len(sys.argv) > 1 and sys.argv[1] == "noremat":
        # no rematerialisation at all: every recomputed FLOP becomes useful
        # work, if the activations fit (b=32 needs 25.8 GB; scale down)
        batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
        try:
            run(batch, "flash_rope", rope_layout="half", use_checkpoint=False)
        except Exception as e:
            print(f"noremat b={batch}: {type(e).__name__}: {str(e)[:200]}")
    elif len(sys.argv) > 1 and sys.argv[1] == "adaln":
        batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
        for impl in ("xla", "fused"):
            run(batch, "flash_rope", rope_layout="half", adaln=impl)
    elif len(sys.argv) > 1 and sys.argv[1] == "unroll":
        # block-scan unroll sweep: unrolling constant-folds the per-layer
        # dynamic-slices and scan-carry copies the trace shows at ~20% of
        # step time (PERF.md round-3 trace breakdown)
        batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
        for unroll in (1, 3, 12):
            run(batch, "flash_rope", rope_layout="half", remat="attn",
                adaln="fused", unroll=unroll)
    elif len(sys.argv) > 1 and sys.argv[1] == "w12":
        # merged-w12 SwiGLU layout for TRAINING (autodiff provides the
        # backward; layout-only change, same math)
        batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
        for merged in (False, True):
            run(batch, "flash_rope", rope_layout="half", remat="attn",
                adaln="fused", merged_w12=merged)
    elif len(sys.argv) > 1 and sys.argv[1] == "remat":
        # remat-policy sweep at the production config (flash_rope + half)
        batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
        for remat in ("full", "attn", "dots"):
            try:
                run(batch, "flash_rope", rope_layout="half", remat=remat)
            except Exception as e:  # OOM at larger batches is informative
                print(f"remat={remat} b={batch}: {type(e).__name__}: {str(e)[:200]}")
    else:
        run(32, "flash")
        run(32, "xla")
        run(64, "flash")
