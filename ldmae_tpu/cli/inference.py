"""Sampling / FID-50k driver.

CLI equivalent of /root/reference/LDMAE/inference.py: loads a trained DiT
(Orbax EMA or a torch .pt checkpoint), builds the jitted end-to-end sampler
(250-step Euler + CFG + VMAE decode in one XLA program), writes PNGs with a
threaded writer overlapped with the next batch's device compute, supports the
8-class demo grid and skip-if-enough-pngs resume.

Usage:
    python -m ldmae_tpu.cli.inference --config configs/imagenet/....yaml [--demo]
"""

from __future__ import annotations

import argparse
import os
import threading
import queue
import time

import jax
import jax.numpy as jnp
import numpy as np


def folder_name(config) -> str:
    """Sample-folder naming, byte-identical to the reference
    (inference.py:45-52) so `eval.save_npz --config` and resume find the
    same directory."""
    from ..eval.save_npz import folder_name_from_config

    return folder_name_from_config(config)


class AsyncPngWriter:
    """Async PNG writer (inference.py:32-38's save_images_async): batches go
    to the native C++ threaded encoder (ldmae_io.png_encode_batch) from a
    single dispatcher thread, overlapping with device compute."""

    def __init__(self, out_dir: str, workers: int = 8):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.workers = workers
        self.q: "queue.Queue" = queue.Queue(maxsize=8)
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        from ..data.native_io import write_pngs

        while True:
            item = self.q.get()
            if item is None:
                self.q.task_done()
                break
            images, indices = item
            # crash-atomic: encode to .tmp then rename, so a kill mid-write
            # can never leave a truncated .png — the batch-level resume
            # (do_sample) treats any existing .png as complete
            names = [f"{int(i):06d}.png" for i in indices]
            tmp = [os.path.join(self.out_dir, n + ".tmp") for n in names]
            write_pngs(images, tmp, level=1, num_threads=self.workers)
            for t, n in zip(tmp, names):
                os.replace(t, os.path.join(self.out_dir, n))
            self.q.task_done()

    def submit(self, images: np.ndarray, indices):
        self.q.put((np.ascontiguousarray(images), np.asarray(indices)))

    def close(self):
        self.q.put(None)
        self.q.join()
        self.thread.join()


def build_pipeline(config, ckpt_path=None, dit_params=None, demo=False):
    """Build (sample_fn, spec) from config; loads DiT weights from Orbax
    (ema) or a torch .pt, and the VMAE tokenizer from vae.weight_path.

    demo=True reproduces the reference's demo_sample_mode overrides
    (inference.py:54-57, 239): cfg_interval off, timestep_shift 0."""
    # All the param prep inside (init, checkpoint load, layout permutations,
    # quantization) is many small ops — on a remote-compiled TPU backend
    # each would be its own sub-second remote compile (minutes of wall
    # clock on a slow compile service). Run them on the local CPU backend;
    # the sampling loop commits the bundle to the accelerator via
    # place_pytree (a host-committed bundle re-uploads on every call).
    from ..utils.placement import cpu_prep_context

    with cpu_prep_context():
        return _build_pipeline(config, ckpt_path, dit_params, demo)


def _build_pipeline(config, ckpt_path, dit_params, demo):
    from ..core.config import LDMAEConfig
    from ..eval.sampling import make_sample_fn
    from ..models.tokenizers import build_tokenizer_fns
    from ..train.train_dit import build_from_config
    from ..train import torch_import
    from ..data.latent_dataset import ImgLatentDataset

    key = jax.random.key(config.train.global_seed)
    spec, consts, params, transport, _, _ = build_from_config(config, key)

    ckpt = ckpt_path or config.ckpt_path
    params_layout = "interleaved"  # canonical unless an Orbax ckpt says half
    if dit_params is not None:
        params = dit_params
    elif ckpt and os.path.exists(str(ckpt)) and str(ckpt).endswith((".pt", ".pth")):
        params = torch_import.import_dit_checkpoint(str(ckpt), spec, key="ema")
    elif ckpt and os.path.isdir(str(ckpt)):
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as c:
            restored = c.restore(os.path.abspath(str(ckpt)))
        params = restored["ema"] if "ema" in restored else restored["params"]
        cfg_yaml = os.path.abspath(str(ckpt)) + ".config.yaml"
        if os.path.exists(cfg_yaml):
            import yaml as _yaml

            saved = _yaml.safe_load(open(cfg_yaml)) or {}
            params_layout = saved.get("parallel", {}).get("rope_layout", "interleaved")
        else:
            params_layout = "interleaved"

    # tokenizer dispatch on config.vae.model_name (inference.py:131-164)
    tok = build_tokenizer_fns(
        config.vae.model_name, config.vae.weight_path, config.data.image_size
    )
    vparams = tok.params

    # latent stats (inference.py:207-217 — requires the training latents dir)
    latent_mean = latent_std = None
    if config.data.latent_norm and os.path.isdir(config.data.data_path):
        try:
            ds = ImgLatentDataset(
                config.data.data_path,
                latent_norm=True,
                sample=config.data.sample,
            )
            latent_mean = jnp.asarray(ds._latent_mean)
            latent_std = jnp.asarray(ds._latent_std)
        except FileNotFoundError:
            pass

    from ..models.lightningdit import merge_swiglu, permute_qk_for_half_rope

    # sampling always runs in the fast half layout; permute unless the
    # checkpoint is already stored that way, then merge the SwiGLU halves
    if params_layout != "half":
        params = permute_qk_for_half_rope(params, spec)
    params = merge_swiglu(params, spec)
    quant = getattr(config.parallel, "quant", None)
    if quant:
        from ..models.lightningdit import quantize_dit_params

        params = quantize_dit_params(params, spec)
    s = config.sample
    sample_fn = make_sample_fn(
        spec, consts, transport,
        num_steps=s.num_sampling_steps,
        sampling_method=s.sampling_method,
        timestep_shift=0.0 if demo else s.timestep_shift,
        cfg_scale=s.cfg_scale,
        cfg_interval=not demo,
        cfg_interval_start=s.cfg_interval_start,
        cfg_channels=s.cfg_channels,
        truncation=s.truncation_bound,
        mode=s.mode,
        latent_multiplier=config.data.latent_multiplier,
        vae_decode_images_fn=lambda p, z: tok.decode_to_images(
            p, z, compute_dtype=jnp.bfloat16,
            attn_impl=config.parallel.attention_impl,
        ),
        compute_dtype=jnp.bfloat16,
        attn_impl=config.parallel.attention_impl,
        rope_layout="half",
        adaln_impl=getattr(config.parallel, "adaln_impl", "fused"),
        quant_mode=quant,
        mlp_impl=getattr(config.parallel, "mlp_impl", "fused"),
    )
    bundle = {
        "dit": params,
        "vae": vparams,
        "latent_mean": latent_mean,
        "latent_std": latent_std,
    }
    return sample_fn, bundle, spec


def do_sample(config, demo: bool = False, out_root: str = None, demo_out: str = None,
              tp: int = 1):
    from ..eval.sampling import demo_labels

    exp_dir = os.path.join(config.train.output_dir, config.train.exp_name)
    out_dir = os.path.join(out_root or exp_dir, folder_name(config))
    s = config.sample

    # resume BEFORE the (checkpoint-loading) pipeline build: skip if enough
    # pngs exist (inference.py:67-77). Beyond the reference's all-or-nothing
    # skip, completed BATCHES are also skipped below (hours-scale 50k runs
    # must survive preemption without resampling from batch 0).
    fid_num = s.fid_num
    have = set()
    if not demo and os.path.isdir(out_dir):
        have = {
            int(f[:-4]) for f in os.listdir(out_dir)
            if f.endswith(".png") and f[:-4].isdigit()
        }
        if len(have) >= fid_num:
            print(f"{out_dir} already has {len(have)} >= {fid_num} pngs, skipping")
            return out_dir

    # Stream-identity manifest: the batch-level resume is byte-identical
    # ONLY if the batch grid, world size and seed are unchanged across
    # legs (the folder name pins model/solver/cfg/shift, but not these).
    # A mismatched resume would silently mix two label streams — fail fast
    # instead. Written on the first leg; delete it to override knowingly.
    if not demo:
        import json

        manifest_path = os.path.join(out_dir, "resume_manifest.json")
        stream_id = {
            "per_proc_batch_size": int(s.per_proc_batch_size),
            "world": int(jax.process_count()),
            "global_seed": int(config.train.global_seed),
            "num_classes": int(config.data.num_classes),
        }
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                recorded = json.load(f)
            diff = {
                k: (recorded.get(k), v)
                for k, v in stream_id.items()
                if recorded.get(k) != v
            }
            if diff:
                raise SystemExit(
                    f"resume settings mismatch in {out_dir}: "
                    + ", ".join(
                        f"{k} was {a}, now {b}" for k, (a, b) in diff.items()
                    )
                    + f" — existing pngs were sampled from a different "
                    f"label stream; delete {manifest_path} (and the pngs) "
                    f"to restart, or rerun with the recorded settings"
                )
        elif jax.process_index() == 0:
            os.makedirs(out_dir, exist_ok=True)
            tmp = manifest_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(stream_id, f)
            os.replace(tmp, manifest_path)

    sample_fn, bundle, spec = build_pipeline(config, demo=demo)
    sample_jit = jax.jit(sample_fn)

    if demo:
        # 8 fixed labels under CFG, label 0 x8 unconditional
        # (inference.py:248-272); shift/interval off per build_pipeline
        y = demo_labels() if s.cfg_scale > 1.0 else jnp.zeros((8,), jnp.int32)
        imgs = np.asarray(sample_jit(bundle, jax.random.key(config.train.global_seed), y))
        demo_dir = demo_out or "demo_images"
        os.makedirs(demo_dir, exist_ok=True)
        from PIL import Image

        grid = imgs.reshape(2, 4, *imgs.shape[1:]).transpose(0, 2, 1, 3, 4)
        grid = grid.reshape(2 * imgs.shape[1], 4 * imgs.shape[2], 3)
        # reference naming (inference.py:258-260)
        ckpt_iter = os.path.basename(str(config.ckpt_path or "random"))
        ckpt_iter = ckpt_iter[:-3] if ckpt_iter.endswith(".pt") else os.path.splitext(ckpt_iter)[0]
        exp_name = os.path.basename(config.train.exp_name)
        path = os.path.join(
            demo_dir, f"{exp_name}_cfg{s.cfg_scale}_{ckpt_iter}_demo_samples.png"
        )
        Image.fromarray(grid).save(path)
        print(f"demo grid -> {path}")
        return demo_dir

    writer = AsyncPngWriter(out_dir)
    per_batch = s.per_proc_batch_size
    n_batches = (fid_num + per_batch - 1) // per_batch
    rank, world = jax.process_index(), jax.process_count()
    rng = np.random.default_rng(config.train.global_seed + rank)

    # per-host multi-chip: shard the label batch over a dp mesh of THIS
    # PROCESS's devices; XLA propagates the sharding through z and the
    # whole pipeline. The mesh must be local — ranks sample disjoint
    # batches independently (the reference runs one process per GPU), and
    # a global mesh with process-local data would scatter wrongly.
    # --tp N additionally shards the DiT weights over a tensor-parallel
    # axis (parallel/mesh.py rules: qkv/proj/swiglu/adaLN and the
    # merged/quantized layouts) — for models whose weights or doubled-CFG
    # activations don't fit one chip; dp shrinks to n_local/tp.
    mesh = None
    n_local = jax.local_device_count()
    tp = max(1, int(tp))
    if n_local > 1 and n_local % tp == 0 and per_batch % (n_local // tp) == 0:
        from ..parallel import create_mesh, shard_params

        mesh = create_mesh(dp=-1, tp=tp, devices=jax.local_devices())
        from jax.sharding import NamedSharding, PartitionSpec as P

        y_sharding = NamedSharding(mesh, P(("dp", "fsdp")))
        # Commit the WHOLE bundle to the mesh devices once: dit via the
        # tp sharding rules (replicated when tp == 1), everything else
        # (vae, latent stats) replicated via the one-buffer placement —
        # an un-committed leaf re-uploads on every jitted call (the -19%
        # single-device bug, PERF.md round 4, applies per-leaf here too).
        from ..utils.placement import place_pytree

        bundle = dict(bundle)
        if tp > 1:
            bundle["dit"] = shard_params(mesh, bundle["dit"], use_tp=True)
            rest = {k: v for k, v in bundle.items() if k != "dit"}
            bundle.update(place_pytree(rest, device=NamedSharding(mesh, P())))
        else:
            # tp==1: everything is replicated — commit the WHOLE bundle via
            # the one-buffer-per-dtype path (shard_params' per-leaf
            # device_put costs one transfer RPC per leaf, ~1 s each through
            # a tunneled link; advisor r4)
            bundle = place_pytree(bundle, device=NamedSharding(mesh, P()))
    elif tp > 1:
        print(f"WARNING: --tp {tp} ignored (n_local={n_local}, "
              f"per_proc_batch_size={per_batch} not divisible)")
    if mesh is None and jax.default_backend() != "cpu":
        # Single-device: commit the CPU-prepped bundle to the accelerator
        # ONCE. Left host-committed, jit would re-upload the ~565 MB of
        # params on EVERY batch (measured -19% sampling throughput through
        # the tunneled rig, PERF.md round 4).
        from ..utils.placement import place_pytree

        bundle = place_pytree(bundle)
    done = skipped = 0
    t0 = time.time()
    for i in range(rank, n_batches, world):
        key = jax.random.key(config.train.global_seed * 100003 + i)
        # labels are drawn for EVERY batch index this rank owns — even
        # skipped ones — so the label stream (and hence every image) is
        # identical whether the run is fresh or resumed mid-way
        y_host = rng.integers(0, config.data.num_classes, size=per_batch)
        indices = np.arange(i * per_batch, i * per_batch + per_batch)
        keep = indices < fid_num
        if have and all(int(j) in have for j in indices[keep]):
            skipped += int(keep.sum())
            continue
        y = jnp.asarray(y_host, jnp.int32)
        if mesh is not None:
            y = jax.device_put(y, y_sharding)
        tb = time.time()
        imgs = np.asarray(sample_jit(bundle, key, y))
        dt = time.time() - tb
        writer.submit(imgs[keep], indices[keep])
        done += int(keep.sum())
        print(
            f"[rank {rank}] batch {i + 1}/{n_batches} "
            f"({done} imgs, {done / (time.time() - t0):.2f} img/s, "
            f"last {per_batch / dt:.2f} img/s"
            + (f", {skipped} resumed" if skipped else "")
            + f") {time.strftime('%H:%M:%S')}",
            flush=True,
        )
    writer.close()
    dt = time.time() - t0
    print(
        f"[rank {rank}] sampling done: {done} generated"
        + (f" + {skipped} resumed" if skipped else "")
        + f" in {dt / 3600:.2f} h ({done / dt:.3f} img/s sustained incl. compile)",
        flush=True,
    )
    return out_dir


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--demo", action="store_true")
    parser.add_argument("--demo_out", default=None,
                        help="demo grid dir (default ./demo_images, like the reference)")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--skip_fid", action="store_true")
    parser.add_argument(
        "--quant", default=None, choices=["w8", "w8a8"],
        help="int8-quantize the DiT for sampling (overrides parallel.quant)",
    )
    parser.add_argument(
        "--tp", type=int, default=1,
        help="tensor-parallel degree over this process's local devices "
             "(shards the DiT weights; dp shrinks to n_local/tp)",
    )
    args = parser.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

    # multi-process rendezvous (env:// RANK/WORLD_SIZE, SLURM, or TPU pod);
    # must precede any backend touch (reference: misc.py:367-402 at driver top)
    from ..parallel import init_distributed_mode

    init_distributed_mode()

    from ..core.config import LDMAEConfig

    config = LDMAEConfig.from_yaml(args.config)
    if args.ckpt:
        config.ckpt_path = args.ckpt
    if args.quant:
        config.parallel.quant = args.quant
    out_dir = do_sample(config, demo=args.demo, demo_out=args.demo_out, tp=args.tp)

    # FID vs the reference stats after sampling (inference.py:352-368)
    ref = config.data.fid_reference_file
    if (
        not args.demo
        and not args.skip_fid
        and jax.process_index() == 0
        and ref
        and os.path.exists(ref)
    ):
        from ..eval.fid import calculate_fid_given_paths

        fid = calculate_fid_given_paths(
            [ref, out_dir], sp_len=config.sample.fid_num
        )
        print(f"FID: {fid:.6f}")
    # re-sync before exit: rank 0's trailing FID pass takes minutes; if the
    # other ranks reach the JAX atexit shutdown barrier meanwhile, the
    # coordination service times out and kills rank 0 mid-FID ("Shutdown
    # barrier has failed"). Mirrors the trailing dist.barrier semantics of
    # the reference's DDP teardown.
    from ..parallel.distributed import barrier

    barrier("inference_done")


if __name__ == "__main__":
    main()
