"""VMAE tokenizer pretraining driver (3 stages).

CLI equivalent of /root/reference/VMAE/main_pretrain.py + train_ae.sh:
  * stage 1: masked pretrain at low res (train_ae.sh:26-46: bs 128/dev,
    accum 2, 400 ep, blr 1e-4, mask 0.25, kl 1e-6, smooth_output, no_cls)
  * stage 2 (pe_reset): in this framework a no-op beyond changing
    --input_size — positional tables are recomputed constants at any
    resolution (pe_reset.py is subsumed; see models/vmae.py docstring)
  * stage 3: --tune_decoder --mask_ratio 0.0 at 256² (train_ae.sh:84-106)

lr = blr · eff_batch/256 (main_pretrain.py:241-243); per-step fractional-
epoch cosine schedule; JSON log lines appended to log.txt
(main_pretrain.py:293-297). Checkpoints via Orbax every --save_epochs.

Usage:
    python -m ldmae_tpu.cli.train_vmae --model mae_for_ldmae_f8d16_prev \
        --data_path /data/imagenet --input_size 256 --mask_ratio 0.25 \
        --kl_loss_weight 1e-6 --smooth_output --no_cls
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def get_args_parser():
    p = argparse.ArgumentParser("VMAE pretraining")
    # reference flags (main_pretrain.py:38-93)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--accum_iter", type=int, default=1)
    p.add_argument("--model", type=str, default="mae_vit_large_patch16")
    p.add_argument("--input_size", type=int, default=256)
    p.add_argument("--mask_ratio", type=float, default=0.75)
    p.add_argument("--visible_loss_ratio", type=float, default=0.5)
    p.add_argument("--norm_pix_loss", action="store_true")
    p.add_argument("--no_cls", action="store_true")
    p.add_argument("--kl_loss_weight", type=float, default=None)
    p.add_argument("--fixed_std", type=float, default=None)
    p.add_argument("--smooth_output", action="store_true")
    p.add_argument("--pred_with_conv", action="store_true")
    p.add_argument("--down_nonlinear", action="store_true")
    # the reference enables LPIPS whenever this is SET (default None —
    # main_pretrain.py:50,189-192); --use_lpips forces it with the default
    # ratio 1.0 (models_mae.py:292)
    p.add_argument("--perceptual_loss_ratio", type=float, default=None)
    p.add_argument("--use_lpips", action="store_true")
    p.add_argument("--tune_decoder", action="store_true")
    p.add_argument("--gradual_resol", action="store_true",
                   help="gradual-resolution variant (halved patch, "
                        "mid-encoder Downsample / mid-decoder Upsample — "
                        "main_pretrain.py --gradual_resol)")
    p.add_argument("--use_checkpoint", action="store_true",
                   help="per-block remat (needed for stage-3 256² + LPIPS "
                        "on 16 GB-HBM chips)")
    p.add_argument("--fixed_lr", action="store_true")
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--blr", type=float, default=1e-3)
    p.add_argument("--min_lr", type=float, default=0.0)
    p.add_argument("--warmup_epochs", type=int, default=40)
    p.add_argument("--data_path", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="./output_dir")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", type=str, default="")
    p.add_argument("--save_epochs", type=int, default=10)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--steps_per_epoch", type=int, default=None,
                   help="override for small datasets / smoke runs")
    p.add_argument("--dp", type=int, default=-1)
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace into this directory "
                        "around --profile_steps steps (SURVEY §5.1)")
    p.add_argument("--profile_start", type=int, default=10,
                   help="step (within this run) at which the trace starts")
    p.add_argument("--profile_steps", type=int, default=5)
    p.add_argument("--peak_tflops", type=float, default=None,
                   help="per-chip peak bf16 TFLOP/s for MFU logs (default: "
                        "resolved from the TPU device kind, e.g. 197 for "
                        "v5e; unknown backends report mfu: null)")
    return p


def local_batch_indices(order, step, per_step, process_index, process_count):
    """This process's slice of global batch ``step``: the global batch is
    ``order[step·per_step:][:per_step]`` (wrapping), split contiguously
    across processes — concatenating all processes' slices reconstructs
    exactly the global batch ``shard_batch`` expects to assemble."""
    idx = order[(step * per_step) % len(order):][:per_step]
    if len(idx) < per_step:
        idx = np.concatenate([idx, order[: per_step - len(idx)]])
    local_bs = per_step // process_count
    return idx[process_index * local_bs:(process_index + 1) * local_bs]


def main(args):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

    # multi-process rendezvous (env:// RANK/WORLD_SIZE, SLURM, or TPU pod);
    # must precede any backend touch (reference: misc.py:367-402 at driver top)
    from ..parallel import init_distributed_mode

    init_distributed_mode()

    from ..data.augment import train_augment
    from ..data.images import ImageFolderDataset
    from ..models.vmae import VMAEConsts, init_vmae_params, vmae_spec
    from ..parallel import create_mesh, shard_batch, shard_params
    from ..train.state import init_train_state, restore_checkpoint, save_checkpoint
    from ..train.train_vmae import make_vmae_optimizer, make_vmae_train_step
    from ..train import torch_import

    os.makedirs(args.output_dir, exist_ok=True)
    mesh = create_mesh(dp=args.dp)
    n_dev = jax.device_count()

    spec = vmae_spec(
        args.model,
        img_size=args.input_size,
        no_cls=args.no_cls,
        kl_loss_weight=args.kl_loss_weight,
        fixed_std=args.fixed_std,
        smooth_output=args.smooth_output,
        pred_with_conv=args.pred_with_conv,
        down_nonlinear=args.down_nonlinear,
        norm_pix_loss=args.norm_pix_loss,
        perceptual_loss_ratio=(
            1.0 if args.perceptual_loss_ratio is None else args.perceptual_loss_ratio
        ),
        ldmae_mode=args.tune_decoder,
        use_checkpoint=args.use_checkpoint,
    )
    # param init/import/merge is many small ops; on a remote-compiled TPU
    # backend each becomes its own remote compile (minutes of startup) —
    # prep on the local CPU backend, then place once via shard_params
    from ..utils.placement import cpu_prep_context

    _prep_ctx = cpu_prep_context()

    def _prep_params(spec):
        gradual = None
        if args.gradual_resol:
            # the reference halves patch_size in the ctor for this variant
            # (models_mae.py:310-312); PE tables: encoder on the full half-patch
            # grid, decoder on the post-Downsample /2 grid
            import dataclasses

            from ..models.vmae_variants import GradualConsts, init_gradual_params

            spec = dataclasses.replace(spec, patch_size=spec.patch_size // 2)
            consts = GradualConsts(spec)
            params, down_after, up_after = init_gradual_params(
                jax.random.key(args.seed), spec
            )
            gradual = (down_after, up_after)
        else:
            consts = VMAEConsts(spec)
            params = init_vmae_params(jax.random.key(args.seed), spec)

        if args.resume:
            if args.resume.endswith((".pth", ".pt")):
                if gradual is not None:
                    # gradual checkpoints interleave the Down/Upsample convs
                    # inside the block lists (models_mae.py:352-395)
                    sd = torch_import.load_torch_state_dict(args.resume)
                    params = torch_import.import_vmae_state_dict_gradual(
                        sd, spec, gradual[0], gradual[1]
                    )
                else:
                    params = torch_import.import_vmae_checkpoint(args.resume, spec)
                print(f"resumed weights from torch checkpoint {args.resume}")
            elif os.path.isdir(args.resume):
                # cross-stage warm start from an Orbax checkpoint: either a step
                # dir / 'checkpoint-{epoch}' alias, or a stage output dir (take
                # its latest). Loads model weights only — the reference's stage-3
                # handoff restores the state_dict but NOT optimizer/epoch when
                # tune_decoder is set (misc.py:501-531, train_ae.sh:106).
                import orbax.checkpoint as ocp

                from ..train.state import list_checkpoints

                path = os.path.abspath(args.resume)
                if not os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA")):
                    steps = list_checkpoints(path)
                    if not steps:
                        raise FileNotFoundError(
                            f"--resume {args.resume}: no Orbax checkpoint found"
                        )
                    path = os.path.join(path, "checkpoints", f"{steps[-1]:07d}")
                with ocp.PyTreeCheckpointer() as ckptr:
                    restored_tree = ckptr.restore(os.path.realpath(path))

                # strict=False merge like the reference's load_state_dict
                # (misc.py:522): stage 1 checkpoints carry mask_token which the
                # ldmae_mode stage-3 model doesn't have, and vice versa
                missing, unexpected = [], []

                def merge(dst, src, prefix=""):
                    if isinstance(dst, dict):
                        out = {}
                        for k, v in dst.items():
                            if isinstance(src, dict) and k in src:
                                out[k] = merge(v, src[k], f"{prefix}{k}.")
                            else:
                                missing.append(prefix + k)
                                out[k] = v
                        if isinstance(src, dict):
                            unexpected.extend(prefix + k for k in src if k not in dst)
                        return out
                    arr = jnp.asarray(src)
                    if arr.shape != dst.shape:
                        missing.append(f"{prefix[:-1]} (shape {arr.shape} != {dst.shape})")
                        return dst
                    return arr.astype(dst.dtype)

                params = merge(params, restored_tree["params"])
                print(
                    f"resumed weights from Orbax checkpoint {path} "
                    f"(missing={missing}, unexpected={unexpected})"
                )
            else:
                raise FileNotFoundError(f"--resume {args.resume}: not found")

        return spec, consts, params, gradual

    with _prep_ctx:
        spec, consts, params, gradual = _prep_params(spec)
    params = shard_params(mesh, params)

    # n_dev = jax.device_count() is already GLOBAL across processes — don't
    # multiply by process_count again (reference: batch * accum * world_size,
    # main_pretrain.py:241)
    eff_batch = args.batch_size * args.accum_iter * n_dev
    lr = args.lr if args.lr is not None else args.blr * eff_batch / 256
    print(f"actual lr: {lr:.2e}  effective batch size: {eff_batch}")

    dataset = ImageFolderDataset(args.data_path, args.input_size)
    # one optimizer step consumes accum_iter micro-batches of batch_size/dev
    # (engine_pretrain.py:72-76) — per_step counts ALL of them, so the lr
    # above is scaled for the batch that actually hits each update
    per_step = args.batch_size * args.accum_iter * n_dev
    steps_per_epoch = args.steps_per_epoch or max(len(dataset) // per_step, 1)

    tx = make_vmae_optimizer(
        params,
        steps_per_epoch,
        base_lr=lr,
        min_lr=args.min_lr,
        warmup_epochs=args.warmup_epochs,
        total_epochs=args.epochs,
        weight_decay=args.weight_decay,
        fixed_lr=args.fixed_lr,
        tune_decoder=args.tune_decoder,
    )
    perceptual = None
    if args.use_lpips or args.perceptual_loss_ratio is not None:
        from ..models.lpips import load_lpips_params, make_lpips_fn

        perceptual = make_lpips_fn(load_lpips_params())

    step_fn = jax.jit(
        make_vmae_train_step(
            spec, consts, tx,
            mask_ratio=args.mask_ratio,
            visible_loss_ratio=args.visible_loss_ratio,
            tune_decoder=args.tune_decoder,
            perceptual_loss_fn=perceptual,
            compute_dtype=jnp.bfloat16,
            gradual=gradual,
            grad_accum=args.accum_iter,
        ),
        donate_argnums=(0,),
    )
    state = init_train_state(params, tx)
    restored = restore_checkpoint(args.output_dir, state)
    if restored is not None:
        # a checkpoint in THIS stage's output_dir always represents later
        # progress than an --resume warm start (e.g. the stage-3 relaunch
        # after a preemption: --resume points at stage 1's checkpoint-90,
        # but the preemption checkpoint carries this stage's steps)
        state = restored
        print(f"resumed from step {int(state.step)}"
              + (" (overrides --resume warm start)" if args.resume else ""))

    rng = jax.random.key(args.seed + 1)
    data_rng = np.random.default_rng(args.seed)
    log_path = os.path.join(args.output_dir, "log.txt")

    # TensorBoard scalars at the reference's epoch_1000x x-axis
    # (engine_pretrain.py:90-105); rank-0 only like the reference's
    # SummaryWriter/log.txt gating (main_pretrain.py:204-206, 291-297)
    writer = None
    if jax.process_index() == 0:
        try:
            from torch.utils.tensorboard import SummaryWriter

            writer = SummaryWriter(os.path.join(args.output_dir, "tensorboard"))
        except ImportError:
            pass

    from concurrent.futures import ThreadPoolExecutor

    from ..utils.prefetch import Prefetcher
    from PIL import Image

    pool = ThreadPoolExecutor(max_workers=args.num_workers)

    def epoch_batches(order, skip_steps=0):
        def load_one(i):
            local_rng = np.random.default_rng(data_rng.integers(2**31))
            # uint8 HWC: 4x less host->device traffic; the train step
            # normalizes on device with load_image's exact arithmetic
            return train_augment(
                Image.open(dataset.samples[int(i)][0]), local_rng,
                args.input_size, raw_uint8=True,
            )

        # pre-transfer on the prefetch thread only when there is a single
        # local device and process — with dp>1 the batch must go through
        # shard_batch's one-shot placement (a device-0 copy first would add
        # a hop and a memory spike; multi-process needs
        # make_array_from_process_local_data on host data)
        pre_put = jax.process_count() == 1 and jax.local_device_count() == 1
        # each process loads ONLY ITS SLICE of the global batch —
        # shard_batch's multiprocess path assembles the global array from
        # per-process shards (parallel/mesh.py:56-61); loading the full
        # batch everywhere would double it with duplicated rows
        for s in range(skip_steps, steps_per_epoch):
            idx = local_batch_indices(
                order, s, per_step, jax.process_index(), jax.process_count()
            )
            batch = np.stack(list(pool.map(load_one, idx)))
            yield jnp.asarray(batch) if pre_put else batch

    # graceful preemption: checkpoint + clean exit on SIGTERM/SIGINT (the
    # reference loses up to save_epochs of work)
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
            pass

    # useful-FLOP accounting for the epoch MFU log (PERF.md convention:
    # fwd + ~2x bwd of the forward count; LPIPS/VGG FLOPs uncounted, so
    # stage-1/3 MFU with --use_lpips is a slight underestimate)
    from ..utils.profiling import (
        resolve_peak_flops, trace as profiler_trace, vmae_forward_flops,
    )

    step_flops = 3 * vmae_forward_flops(
        spec, per_step, mask_ratio=0.0 if args.tune_decoder else args.mask_ratio
    )
    assert step_flops > 0, "flops-per-step accounting returned zero"
    peak = resolve_peak_flops(args.peak_tflops)
    chip_peak = peak * n_dev if peak else None
    profile_ctx = None
    run_steps = 0

    start_epoch = int(state.step) // steps_per_epoch
    # mid-epoch preemption checkpoints resume inside the epoch instead of
    # replaying it (which would overshoot epochs*steps_per_epoch and run
    # the lr schedule past its end)
    resume_skip = int(state.step) % steps_per_epoch
    for epoch in range(start_epoch, args.epochs):
        meters = {k: 0.0 for k in ("loss", "vis_loss", "mask_loss", "kl_loss", "p_loss")}
        t0 = time.time()
        order = data_rng.permutation(len(dataset))
        n_steps = 0
        skip = resume_skip if epoch == start_epoch else 0
        for imgs in Prefetcher(epoch_batches(order, skip), buffer_size=2):
            if args.profile_dir and run_steps == args.profile_start:
                jax.block_until_ready(state.params)
                profile_ctx = profiler_trace(args.profile_dir)
                profile_ctx.__enter__()
                print(f"profiler trace started -> {args.profile_dir}")
            imgs = jnp.asarray(imgs)
            if args.accum_iter > 1:
                # (A·m, H, W, C) -> (A, m, ...): micro-batches scanned inside
                # the step; batch dim (axis 1) sharded over the mesh
                imgs = imgs.reshape(args.accum_iter, -1, *imgs.shape[1:])
                batch = shard_batch(mesh, {"x": imgs}, axis=1)
            else:
                batch = shard_batch(mesh, {"x": imgs})
            state, metrics = step_fn(state, batch, rng)
            run_steps += 1
            if profile_ctx is not None and (
                run_steps >= args.profile_start + args.profile_steps
            ):
                jax.block_until_ready(metrics["loss"])
                profile_ctx.__exit__(None, None, None)
                profile_ctx = None
                print(f"profiler trace written to {args.profile_dir}")
            # one transfer for all scalars (a float() per meter is a device
            # round-trip each — expensive over a remote-chip tunnel)
            host_metrics = jax.device_get(metrics)
            for k in meters:
                meters[k] += float(host_metrics[k])
            n_steps += 1
            if not bool(host_metrics["loss_finite"]):
                print(f"WARNING: non-finite loss at step {int(state.step)} (update skipped)")
            if stop_signal:
                if profile_ctx is not None:
                    profile_ctx.__exit__(None, None, None)
                path = save_checkpoint(args.output_dir, state, config=vars(args))
                print(f"received signal {stop_signal[0]}; saved preemption "
                      f"checkpoint {path}")
                return
        if profile_ctx is not None:  # epoch ended inside the trace window
            profile_ctx.__exit__(None, None, None)
            profile_ctx = None
            print(f"profiler trace written to {args.profile_dir}")

        stats = {k: v / n_steps for k, v in meters.items()}
        # the reference's lr meter (engine_pretrain.py:95-105 logs it to TB
        # alongside the losses): per-step fractional-epoch cosine value at
        # the epoch midpoint
        from ..train.train_vmae import cosine_lr

        lr_fn = cosine_lr(lr, args.min_lr, args.warmup_epochs, args.epochs,
                          args.fixed_lr)
        stats["lr"] = float(lr_fn(jnp.asarray(epoch + 0.5)))
        stats.update(epoch=epoch, time=time.time() - t0)
        stats["img_per_sec"] = n_steps * per_step / stats["time"]
        stats["tflops"] = step_flops * n_steps / stats["time"] / 1e12
        # null (not 0) when the backend's peak is unknown — a printed 0%
        # must always mean genuinely zero work (VERDICT r4 weak #3)
        stats["mfu"] = (
            step_flops * n_steps / stats["time"] / chip_peak if chip_peak else None
        )
        if writer is not None:
            x = int((epoch + 1) * 1000)  # epoch_1000x axis
            for name, tb in [("loss", "train_loss"), ("vis_loss", "vis_loss"),
                             ("mask_loss", "mask_loss"), ("kl_loss", "kl_loss"),
                             ("p_loss", "p_loss"), ("lr", "lr")]:
                writer.add_scalar(tb, stats[name], x)
        if jax.process_index() == 0:
            print(json.dumps({f"train_{k}": v for k, v in stats.items()}))
            with open(log_path, "a") as f:
                f.write(json.dumps({f"train_{k}": v for k, v in stats.items()}) + "\n")

        # reference cadence (main_pretrain.py:286): epochs 0, S, 2S, ...
        # plus the final epoch — train_ae.sh's stage-3 handoff depends on
        # checkpoint-90 existing at the default save_epochs=10
        if epoch % args.save_epochs == 0 or epoch + 1 == args.epochs:
            path = save_checkpoint(args.output_dir, state, config=vars(args))
            # epoch alias mirroring the reference's checkpoint-{epoch}.pth
            # naming (misc.py:468-485) — train_ae.sh hands checkpoint-90 to
            # stage 3 by this name
            # rank-0 only (like the log.txt/TB writes): every process runs
            # the collective Orbax save above, but a shared filesystem makes
            # the exists-check -> symlink window a cross-rank race
            if jax.process_index() == 0:
                alias = os.path.join(os.path.dirname(path), f"checkpoint-{epoch}")
                if os.path.islink(alias):
                    os.unlink(alias)
                try:
                    if not os.path.exists(alias):
                        os.symlink(os.path.basename(path), alias)
                except FileExistsError:
                    pass
            print(f"saved checkpoint {path} (checkpoint-{epoch})")


if __name__ == "__main__":
    main(get_args_parser().parse_args())
