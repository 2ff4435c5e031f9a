"""DiT training driver.

CLI equivalent of /root/reference/LDMAE/train_accum.py (accelerate launch →
do_train): loads a reference-layout YAML, builds the model/transport/optim,
streams latent shards, runs the jitted SPMD train step, logs every
``log_every`` optimizer steps with steps/sec, checkpoints every
``ckpt_every``, supports resume-from-latest and torch warm-start.

Usage:
    python -m ldmae_tpu.cli.train_dit --config configs/imagenet/lightningdit_b_vmae_f8d16.yaml
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import jax
import jax.numpy as jnp


def setup_logger(exp_dir: str) -> logging.Logger:
    """Rank-0 logger with timestamped lines → stdout + log.txt
    (train_accum.py:362-377)."""
    os.makedirs(exp_dir, exist_ok=True)
    logger = logging.getLogger("ldmae_tpu")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter(
        "[\033[34m%(asctime)s\033[0m] %(message)s", datefmt="%Y-%m-%d %H:%M:%S"
    )
    if jax.process_index() == 0:
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        fh = logging.FileHandler(os.path.join(exp_dir, "log.txt"))
        fh.setFormatter(logging.Formatter("[%(asctime)s] %(message)s"))
        logger.addHandler(sh)
        logger.addHandler(fh)
    return logger


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--dp", type=int, default=-1)
    parser.add_argument("--fsdp", type=int, default=1)
    parser.add_argument("--tp", type=int, default=1)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument(
        "--profile_dir", type=str, default=None,
        help="capture a jax.profiler trace (TensorBoard/Perfetto) into this "
        "directory around --profile_steps steps (SURVEY §5.1: the reference "
        "has only wall-clock timing; this is the TPU-native equivalent)",
    )
    parser.add_argument("--profile_start", type=int, default=10,
                        help="optimizer step at which the trace starts")
    parser.add_argument("--profile_steps", type=int, default=5,
                        help="number of steps to trace")
    parser.add_argument(
        "--peak_tflops", type=float, default=None,
        help="per-chip peak bf16 TFLOP/s for the live MFU log (default: "
             "resolved from the TPU device kind, e.g. 197 for v5e; unknown "
             "backends log 'MFU n/a')",
    )
    args = parser.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

    # multi-process rendezvous (env:// RANK/WORLD_SIZE, SLURM, or TPU pod);
    # must precede any backend touch (reference: misc.py:367-402 at driver top)
    from ..parallel import init_distributed_mode

    init_distributed_mode()

    from ..core.config import LDMAEConfig
    from ..data.latent_dataset import ImgLatentDataset
    from ..parallel import create_mesh, shard_batch, shard_params
    from ..train.state import init_train_state, restore_checkpoint, save_checkpoint
    from ..train.train_dit import build_from_config
    from ..train import torch_import

    config = LDMAEConfig.from_yaml(args.config)
    if args.max_steps is not None:
        config.train.max_steps = args.max_steps

    exp_dir = os.path.join(config.train.output_dir, config.train.exp_name)
    logger = setup_logger(exp_dir)
    logger.info(f"Experiment directory: {exp_dir}")
    logger.info(f"devices: {jax.device_count()} ({jax.devices()[0].platform})")

    # TensorBoard: Loss/train scalars + config text (train_accum.py:62-66, 266)
    writer = None
    if jax.process_index() == 0:
        try:
            from torch.utils.tensorboard import SummaryWriter

            writer = SummaryWriter(os.path.join(exp_dir, "tensorboard"))
            import yaml as _yaml

            writer.add_text("config", _yaml.safe_dump(config.to_dict()))
        except ImportError:
            logger.info("tensorboard unavailable; scalar logs go to log.txt only")

    mesh = create_mesh(dp=args.dp, fsdp=args.fsdp, tp=args.tp)
    key = jax.random.key(config.train.global_seed)

    # Param init/import/permutation is many small ops; on a remote-compiled
    # TPU backend each becomes its own remote compile (minutes of startup).
    # Prep on the local CPU backend; shard_params below does the one
    # host->device placement.
    from ..utils.placement import cpu_prep_context

    with cpu_prep_context():
        spec, consts, params, transport, tx, step_fn = build_from_config(config, key)

        # warm start from a torch checkpoint (train_accum.py:95-103,
        # 308-334); MUST precede the half-rope permutation — imported
        # weights are in the canonical interleaved layout, so permuting
        # first would let the warm start silently overwrite the permutation
        # (inference.py orders the same way)
        if config.train.weight_init:
            loaded = torch_import.import_dit_checkpoint(
                config.train.weight_init, spec, key="model"
            )
            params = torch_import.warm_start_filter(params, loaded)
            logger.info(f"warm-started from {config.train.weight_init}")

        if config.parallel.rope_layout == "half":
            from ..models.lightningdit import permute_qk_for_half_rope

            params = permute_qk_for_half_rope(params, spec)
            logger.info("using half-split RoPE layout (export applies the inverse)")

    params = shard_params(mesh, params, use_fsdp=args.fsdp > 1, use_tp=args.tp > 1)
    state = init_train_state(params, tx)

    restored = restore_checkpoint(exp_dir, state)
    if restored is not None:
        state = restored
        logger.info(f"resumed from step {int(state.step)}")

    # data (sample-at-load semantics per data.sample; flip 50/50)
    data_path = config.data.data_path
    if config.data.sample and not data_path.endswith("_sample"):
        # reference appends _sample to the data dir name (train_accum.py:124)
        cand = data_path + "_sample"
        if os.path.isdir(cand):
            data_path = cand
    dataset = ImgLatentDataset(
        data_path,
        latent_norm=config.data.latent_norm,
        latent_multiplier=config.data.latent_multiplier,
        sample=config.data.sample,
        seed=config.train.global_seed,
    )
    logger.info(f"dataset: {len(dataset)} latents from {data_path}")

    accum = config.train.gradient_accumulation_steps
    micro = config.train.global_batch_size // accum
    n_proc = jax.process_count()
    assert micro % n_proc == 0, (
        f"per-accum batch {micro} must divide across {n_proc} processes"
    )
    micro_local = micro // n_proc  # this host's slice of the global batch
    from ..utils.prefetch import Prefetcher

    # resume the data stream where the restored step left off (each epoch
    # reshuffles with seed+epoch, so step -> (epoch, batch offset) is exact)
    n_host = len(range(jax.process_index(), len(dataset), n_proc))
    batches_per_epoch = max(n_host // (micro_local * accum), 1)
    start_epoch = int(state.step) // batches_per_epoch
    skip = int(state.step) % batches_per_epoch

    batches = Prefetcher(
        dataset.iter_batches(
            micro_local * accum,
            shuffle=True,
            seed=config.train.global_seed,
            process_index=jax.process_index(),
            process_count=n_proc,
            start_epoch=start_epoch,
            skip_batches=skip,
        ),
        buffer_size=4,
    )

    step_jit = jax.jit(step_fn, donate_argnums=(0,))
    rng = jax.random.key(config.train.global_seed + 1)

    val_batch = val_step = None
    if config.data.valid_path and os.path.isdir(config.data.valid_path):
        from ..train.train_dit import evaluate_step

        vds = ImgLatentDataset(
            config.data.valid_path,
            latent_norm=config.data.latent_norm,
            latent_multiplier=config.data.latent_multiplier,
            sample=config.data.sample,
        )
        vb = min(micro_local, len(vds))  # small validation sets must not crash
        vraw = next(vds.iter_batches(vb, shuffle=False, epochs=1, drop_last=False))
        val_batch = {"x": jnp.asarray(vraw["x"]), "y": jnp.asarray(vraw["y"])}
        val_dtype = (
            jnp.bfloat16 if config.parallel.compute_dtype == "bfloat16" else jnp.float32
        )
        val_step = jax.jit(lambda p, b, k: evaluate_step(
            spec, consts, transport, p, b, k,
            compute_dtype=val_dtype,
            attn_impl=config.parallel.train_attention_impl,
            rope_layout=config.parallel.rope_layout,
        ))

    # Losses stay on device between logs (the reference syncs only at
    # log_every, train_accum.py:255-259) — a per-step float() would block
    # the host and serialise batch prep against device compute.
    pending_losses, log_steps = [], 0
    train_steps = int(state.step)
    # live MFU accounting (PERF.md convention: useful FLOPs = fwd + ~2x bwd
    # of the *forward* count; remat recompute is not useful work)
    from ..utils.profiling import (
        dit_forward_flops, format_tflops_mfu, resolve_peak_flops,
        trace as profiler_trace,
    )

    step_useful_flops = 3 * dit_forward_flops(spec, config.train.global_batch_size)
    assert step_useful_flops > 0, "flops-per-step accounting returned zero"
    peak = resolve_peak_flops(args.peak_tflops)
    chip_peak = peak * jax.device_count() if peak else None
    profile_ctx = None
    start = time.time()
    logger.info(f"training for {config.train.max_steps} steps "
                f"(global_batch={config.train.global_batch_size}, accum={accum})")

    # graceful preemption (no reference equivalent — the reference loses up
    # to ckpt_every steps on SIGTERM): save a checkpoint and exit cleanly.
    # On multi-host runs this relies on every process receiving the signal
    # (the normal TPU-pod preemption behavior) since the Orbax save is a
    # collective.
    import signal

    stop_signal = []

    def _request_stop(signum, frame):
        if stop_signal:
            # second signal: give up on the graceful path (a hung step or
            # a long Orbax save) and die with default semantics
            signal.signal(signum, signal.SIG_DFL)
            os.kill(os.getpid(), signum)
        stop_signal.append(signum)

    for _sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(_sig, _request_stop)
        except ValueError:
            pass  # not the main thread (embedded use)
    while train_steps < config.train.max_steps:
        host = next(batches)
        batch = {
            "x": host["x"].reshape(accum, micro_local, *host["x"].shape[1:]),
            "y": host["y"].reshape(accum, micro_local),
        }
        batch = shard_batch(mesh, batch, axis=1)
        if args.profile_dir and train_steps == args.profile_start:
            jax.block_until_ready(state.params)
            profile_ctx = profiler_trace(args.profile_dir)
            profile_ctx.__enter__()
            logger.info(f"profiler trace started -> {args.profile_dir}")
        state, metrics = step_jit(state, batch, rng)
        pending_losses.append(metrics["loss"])
        log_steps += 1
        train_steps += 1
        if profile_ctx is not None and (
            train_steps >= args.profile_start + args.profile_steps
        ):
            jax.block_until_ready(metrics["loss"])
            profile_ctx.__exit__(None, None, None)
            profile_ctx = None
            logger.info(f"profiler trace written to {args.profile_dir}")

        if train_steps % config.train.log_every == 0:
            jax.block_until_ready(pending_losses[-1])
            dt = time.time() - start
            avg_loss = float(jnp.mean(jnp.stack(pending_losses)))
            flops_done = step_useful_flops * log_steps
            logger.info(
                f"(step={train_steps:07d}) Train Loss: {avg_loss:.4f}, "
                f"Train Steps/Sec: {log_steps / dt:.2f}, "
                + format_tflops_mfu(flops_done, dt, chip_peak)
            )
            if writer is not None:
                writer.add_scalar("Loss/train", avg_loss, train_steps)
                writer.add_scalar("Perf/tflops", flops_done / dt / 1e12, train_steps)
                if chip_peak:
                    writer.add_scalar("Perf/mfu", flops_done / dt / chip_peak, train_steps)
            pending_losses, log_steps = [], 0
            start = time.time()

        if stop_signal:
            if profile_ctx is not None:  # close + flush an in-flight trace
                profile_ctx.__exit__(None, None, None)
                profile_ctx = None
            logger.info(
                f"received signal {stop_signal[0]}; saving preemption "
                f"checkpoint at step {train_steps}"
            )
            path = save_checkpoint(exp_dir, state, config=config.to_dict())
            logger.info(f"Saved preemption checkpoint to {path}")
            return

        if train_steps % config.train.ckpt_every == 0 and train_steps > 0:
            # every process participates: Orbax save on sharded arrays is a
            # collective (rank-0-only would deadlock multi-host runs)
            path = save_checkpoint(exp_dir, state, config=config.to_dict())
            logger.info(f"Saved checkpoint to {path}")
            # validation loss at fixed t-range (train_accum.py:287-297; the
            # reference references an undefined evaluate() — ours works)
            if val_batch is not None:
                val_loss = float(val_step(state.params, val_batch, jax.random.key(0)))
                logger.info(f"Validation Loss: {val_loss:.4f}")
                if writer is not None:
                    writer.add_scalar("Loss/validation", val_loss, train_steps)

    if profile_ctx is not None:  # max_steps ended inside the trace window
        profile_ctx.__exit__(None, None, None)
    path = save_checkpoint(exp_dir, state, config=config.to_dict())
    logger.info(f"Saved final checkpoint to {path}")


if __name__ == "__main__":
    main()
