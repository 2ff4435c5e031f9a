"""Tokenizer reconstruction evaluation + latent-noise robustness.

CLI equivalent of /root/reference/LDMAE/evaluate_tokenizer.py: encodes the
validation set through the tokenizer (posterior mode), optionally perturbs
latents with ε·randn·latent_std (the robustness experiment,
evaluate_tokenizer.py:166-167 / run_robustness_test.sh), decodes, writes
reference + reconstruction PNGs, and reports rFID / PSNR / LPIPS / SSIM.

Usage:
    python -m ldmae_tpu.cli.evaluate_tokenizer --config <yaml> \
        --data_path <val images> --output_path ./rfid --epsilon 0.0
    # robustness sweep: --epsilon 0.01 0.05 0.1 0.2 0.3
"""

from __future__ import annotations

import argparse
import os
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np


def evaluate_tokenizer(config, data_path, output_path, epsilon=0.0, seed=42, batch=32, limit=None, latent_stats=None):
    from ..data.images import ImageFolderDataset
    from ..eval.fid import calculate_fid_given_paths
    from ..eval.metrics import ssim
    from ..models.lpips import load_lpips_params, lpips as lpips_fn
    from ..models.tokenizers import build_tokenizer_fns
    from ..ops.gaussian import diagonal_gaussian

    model_type = config.vae.model_name
    folder_name = f"{model_type}_{epsilon}"
    ref_path = os.path.join(output_path, "reference")
    save_dir = os.path.join(output_path, folder_name)
    os.makedirs(ref_path, exist_ok=True)
    os.makedirs(save_dir, exist_ok=True)

    # tokenizer dispatch on config.vae.model_name (the reference builds VMAE
    # or the SD-VAE here, evaluate_tokenizer.py:57-95). Param init/loading
    # runs on the local CPU backend (PERF.md "Driver startup" — each small
    # eager op is a remote compile on the axon backend), then commits once.
    from ..utils.placement import cpu_prep_context

    with cpu_prep_context():
        tok = build_tokenizer_fns(
            config.vae.model_name, config.vae.weight_path, config.data.image_size
        )
        lpips_params = load_lpips_params()
    # local multi-chip: shard the batch over a dp mesh of THIS PROCESS's
    # devices; XLA propagates the sharding through the whole roundtrip
    # (same trick as cli.inference). The mesh must be local — each rank
    # computes its own shard of the dataset independently (the reference's
    # DDP model), and device_put of process-local data under a sharding
    # spanning other hosts' devices would be wrong (parallel/mesh.py:56-63).
    batch_sharding = None
    params_dest = None
    if jax.local_device_count() > 1 and batch % jax.local_device_count() == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import create_mesh

        mesh = create_mesh(dp=-1, devices=jax.local_devices())
        batch_sharding = NamedSharding(
            mesh, P(("dp", "fsdp"), None, None, None)
        )
        # params must be committed replicated over the SAME mesh — a
        # dev0-committed tree would be re-laid-out (a second full upload)
        # when jit traces the mesh-sharded roundtrip below
        params_dest = NamedSharding(mesh, P())
    from ..utils.placement import place_pytree

    placed = place_pytree(
        {"tok": tok.params, "lpips": lpips_params}, device=params_dest
    )
    params, lpips_params = placed["tok"], placed["lpips"]

    # latent std for the robustness perturbation: the reference loads
    # latents_stats.pt (evaluate_tokenizer.py:116-123); fall back to the
    # batchwise std when no stats file is given.
    fixed_std = None
    if latent_stats and os.path.exists(latent_stats):
        from ..data.latent_dataset import _load_stats

        fixed_std = jnp.asarray(_load_stats(latent_stats)["std"])

    from ..data.images import normalize_uint8_images

    @jax.jit
    def roundtrip(imgs_u8, key):
        # pixels arrive uint8 (4x less host->device traffic); normalization
        # is load_image's exact fp32 arithmetic
        imgs = normalize_uint8_images(imgs_u8)
        moments = tok.encode_moments(params, imgs, compute_dtype=jnp.bfloat16)
        latents = diagonal_gaussian(moments, axis=1).mode()
        if epsilon > 0:
            if fixed_std is not None:
                latent_std = fixed_std
            else:
                latent_std = jnp.std(latents, axis=(0, 2, 3), keepdims=True)
            latents = latents + epsilon * jax.random.normal(key, latents.shape) * latent_std
        decoded = tok.decode(params, latents, compute_dtype=jnp.bfloat16)
        # per-image values so the final (trimmed) batch can be sliced on
        # host before aggregation
        l = lpips_fn(lpips_params, decoded, imgs).reshape(-1)
        s = ssim(decoded, imgs, data_range=(-1.0, 1.0), per_image=True)
        u8 = jnp.clip(127.5 * decoded + 128.0, 0, 255).transpose(0, 2, 3, 1).astype(jnp.uint8)
        return u8, l, s

    ds = ImageFolderDataset(data_path, config.data.image_size)
    rank, world = jax.process_index(), jax.process_count()
    n_global = len(ds) if limit is None else min(limit, len(ds))
    # interleaved shard of the GLOBAL budget (the reference's sequential
    # DistributedSampler, evaluate_tokenizer.py:47,107-114)
    n_total = n_global // world + (1 if rank < n_global % world else 0)
    print(f"evaluating tokenizer on {n_global} images "
          f"({n_total} on rank {rank}, epsilon={epsilon})")

    lpips_vals, ssim_vals, psnr_vals = [], [], []
    idx = 0
    pool = ThreadPoolExecutor(2)
    png_futures = []

    def save_pngs(arrs, paths):
        # native C++ encoder (zlib level 1): ~5-10x cheaper than PIL per
        # image — the eval loop is host-bound on small machines
        from ..data.native_io import write_pngs

        write_pngs(arrs, paths, level=1, num_threads=4)

    from ..utils.prefetch import Prefetcher

    def device_batches():
        # device transfer on the prefetch thread overlaps the roundtrip; the
        # raw uint8 array doubles as the reference PNG pixels (writing the
        # normalized floats back to uint8 reproduces them bit-exactly:
        # 127.5·((p/255−.5)/.5)+128 = p+0.5 → p after clip+floor)
        for imgs_u8, labels, _ in ds.iter_batches(
            batch, raw_uint8=True, process_index=rank, process_count=world,
        ):
            dev = jnp.asarray(imgs_u8)
            if batch_sharding is not None and len(imgs_u8) == batch:
                dev = jax.device_put(dev, batch_sharding)
            yield dev, imgs_u8, labels

    import time

    def _prune_rank_files(d, keep):
        """Remove stale PNGs that would silently pollute the folder rFID:
        this rank's files beyond the current budget (a previous larger-limit
        run), plus — on rank 0 — files from ranks >= the current world size
        (a previous larger-world run) and old un-ranked `*_{idx}.png` names
        from before the rank-sharded naming."""
        removed = 0
        for f in os.listdir(d):
            if not f.endswith(".png"):
                continue
            stem = f[:-4]
            if "_rank_" in stem:
                try:
                    r = int(stem.split("_rank_")[1].split("_")[0])
                    i = int(stem.rsplit("_", 1)[-1])
                except (ValueError, IndexError):
                    continue
                stale = (r == rank and i >= keep) or (r >= world and rank == 0)
            else:
                stale = rank == 0 and stem.rsplit("_", 1)[-1].isdigit()
            if stale:
                try:
                    os.remove(os.path.join(d, f))
                    removed += 1
                except FileNotFoundError:
                    pass
        if removed:
            print(f"[rank {rank}] pruned {removed} stale files in {d}")

    _prune_rank_files(ref_path, n_total)
    _prune_rank_files(save_dir, n_total)

    # reference images are epsilon-independent: skip rewriting them when a
    # previous sweep entry already wrote this rank's share (the reference's
    # len(ref_png_files) < 50000 check, evaluate_tokenizer.py:139) — also
    # required for sweep correctness with world>1 (rank 0 reads reference/
    # for rFID while other ranks may already be on the next epsilon)
    write_ref = len(
        [f for f in os.listdir(ref_path) if f"_rank_{rank}_" in f]
    ) < n_total

    key = jax.random.key(seed + rank)
    t0 = time.time()
    steady = None  # (t_start, idx_start) after the first (compiling) batch
    for imgs_dev, ref_u8, labels in Prefetcher(device_batches(), buffer_size=4):
        if idx >= n_total:
            break
        if idx > 0 and steady is None:
            steady = (time.time(), idx)
        take = min(len(ref_u8), n_total - idx)
        key, sub = jax.random.split(key)
        u8, l, s = roundtrip(imgs_dev, sub)
        # slice to the --limit budget BEFORE aggregating (keeps the
        # reference's mean-of-batch-means for LPIPS/SSIM, but only over
        # in-budget images, consistent with the psnr/rFID image set)
        u8 = np.asarray(u8)[:take]
        ref_u8 = ref_u8[:take]
        lpips_vals.append(float(np.asarray(l)[:take].mean()))
        ssim_vals.append(float(np.asarray(s)[:take].mean()))
        # PSNR per image from the exact uint8 arrays being written — PNG is
        # lossless, so this equals the reference's folder-pairwise pass
        # (evaluate_tokenizer.py:194-209) without re-reading 2x50k files
        from ..eval.metrics import psnr_batch_np

        psnr_vals.extend(psnr_batch_np(ref_u8, u8).tolist())
        if write_ref:
            png_futures.append(pool.submit(save_pngs, np.ascontiguousarray(ref_u8), [
                os.path.join(ref_path, f"ref_image_rank_{rank}_{idx + i}.png")
                for i in range(len(u8))
            ]))
        png_futures.append(pool.submit(save_pngs, u8, [
            os.path.join(save_dir, f"decoded_image_rank_{rank}_{idx + i}.png")
            for i in range(len(u8))
        ]))
        idx += len(u8)
        if idx % (batch * 10) < batch:
            print(f"[rank {rank}] {idx}/{n_total} "
                  f"({idx / (time.time() - t0):.1f} img/s)")
    pool.shutdown(wait=True)
    for f in png_futures:
        f.result()  # surface writer failures (partial writes raise OSError)
    rate = idx / max(time.time() - t0, 1e-9)
    if steady is not None and idx > steady[1]:
        rate = (idx - steady[1]) / max(time.time() - steady[0], 1e-9)
    print(f"[rank {rank}] roundtrip done: {idx} images, "
          f"{rate:.1f} img/s steady (incl. compile: "
          f"{idx / max(time.time() - t0, 1e-9):.1f})")

    # cross-process metric reduction (the reference's all_reduce AVG,
    # evaluate_tokenizer.py:186-189: mean of per-batch means for
    # LPIPS/SSIM, per-image mean for PSNR) + barrier before rank-0 rFID
    sums = np.array([
        np.sum(lpips_vals), len(lpips_vals),
        np.sum(ssim_vals), len(ssim_vals),
        np.sum(psnr_vals), len(psnr_vals),
    ], np.float64)
    if world > 1:
        from jax.experimental import multihost_utils

        sums = np.asarray(multihost_utils.process_allgather(sums)).sum(axis=0)
        from ..parallel.distributed import barrier

        barrier(f"evaluate_tokenizer_pngs_{epsilon}")
    report = None
    if rank == 0:
        # rFID on the folders (evaluate_tokenizer.py:194-209), rank 0 only
        fid = calculate_fid_given_paths([ref_path, save_dir])

        report = {
            "rfid": fid,
            "psnr": float(sums[4] / sums[5]),
            "lpips": float(sums[0] / sums[1]),
            "ssim": float(sums[2] / sums[3]),
            "epsilon": epsilon,
        }
        print("Final Metrics:")
        for k, v in report.items():
            print(f"  {k}: {v:.4f}" if isinstance(v, float) else f"  {k}: {v}")
    if world > 1:
        # hold every rank until rank 0 has finished reading the PNG folders
        # — in an epsilon sweep the next entry starts writing immediately
        # (the reference has the same trailing dist.barrier(),
        # evaluate_tokenizer.py:210)
        from ..parallel.distributed import barrier

        barrier(f"evaluate_tokenizer_done_{epsilon}")
    return report


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--data_path", required=True)
    parser.add_argument("--output_path", default="./rfid")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--latent_stats", default=None,
                        help="latents_stats.pt for the exact reference std")
    parser.add_argument(
        "--epsilon", type=float, nargs="+", default=[0.0],
        help="latent-noise robustness sweep (run_robustness_test.sh uses "
        "0 .01 .05 .1 .2 .3)",
    )
    args = parser.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

    # multi-process rendezvous (env:// RANK/WORLD_SIZE, SLURM, or TPU pod);
    # the reference tokenizer eval is DDP (evaluate_tokenizer.py:47)
    from ..parallel import init_distributed_mode

    init_distributed_mode()

    from ..core.config import LDMAEConfig

    config = LDMAEConfig.from_yaml(args.config)
    for eps in args.epsilon:
        evaluate_tokenizer(
            config, args.data_path, args.output_path, epsilon=eps,
            seed=args.seed, batch=args.batch, limit=args.limit,
            latent_stats=args.latent_stats,
        )


if __name__ == "__main__":
    main()
