"""Latent extraction driver.

CLI equivalent of /root/reference/LDMAE/extract_features.py: encodes the whole
dataset through the VMAE tokenizer (unflipped + flipped variants in one pass),
writes reference-format safetensors shards
(latents_rank{R}_shard{S}.safetensors with latents/latents_flip/labels), and
precomputes latents_stats.pt.

When ``data.sample`` is set the raw 32-channel moments are stored (the
posterior is sampled at load time); otherwise the posterior mode (16 ch)
(extract_features.py:148-152).

Usage:
    python -m ldmae_tpu.cli.extract_features --config configs/imagenet/....yaml
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--out", default=None, help="override output dir")
    parser.add_argument("--limit", type=int, default=None)
    args = parser.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

    # multi-process rendezvous (env:// RANK/WORLD_SIZE, SLURM, or TPU pod);
    # must precede any backend touch (reference: misc.py:367-402 at driver top)
    from ..parallel import init_distributed_mode

    init_distributed_mode()

    from ..core.config import LDMAEConfig
    from ..data.images import ImageFolderDataset
    from ..data.latent_dataset import ImgLatentDataset, LatentShardWriter
    from ..models.tokenizers import build_tokenizer_fns

    config = LDMAEConfig.from_yaml(args.config)
    store_moments = config.data.sample

    out_dir = args.out or (
        config.data.data_path + ("_sample" if store_moments else "")
    )
    os.makedirs(out_dir, exist_ok=True)

    # tokenizer dispatch on config.vae.model_name (VMAE or SD-VAE in the
    # reference, extract_features.py:57-99; plus vavae/marvae wrappers).
    # Build on the local CPU backend like the other drivers (PERF.md
    # "Driver startup"): param init is hundreds of small eager ops, each its
    # own remote compile on the axon backend — on a degraded compile
    # service this alone exceeded the 25-min job timeout (round 5).
    from ..utils.placement import cpu_prep_context

    with cpu_prep_context():
        tok = build_tokenizer_fns(
            config.vae.model_name, config.vae.weight_path, config.data.image_size
        )
    # commit once to the accelerator (a host-committed tree re-uploads per
    # call; utils/placement.py)
    from ..utils.placement import place_pytree

    params = place_pytree(tok.params)

    from ..ops.gaussian import diagonal_gaussian
    from ..utils.prefetch import Prefetcher

    from ..data.images import normalize_uint8_images

    @jax.jit
    def encode_both(imgs_u8):
        # the reference decodes every image twice (an unflipped and a flipped
        # ImageFolder, extract_features.py:107-110); the extraction transform
        # flips AFTER the ADM center-crop, so flipping the cropped tensor on
        # device is exact — one host decode, one doubled-batch encode.
        # Pixels arrive uint8 (4x less host->device traffic) and are
        # normalized here with load_image's exact fp32 arithmetic.
        imgs = normalize_uint8_images(imgs_u8)
        both = jnp.concatenate([imgs, imgs[..., ::-1]], axis=0)
        moments = tok.encode_moments(params, both, compute_dtype=jnp.bfloat16)
        out = moments if store_moments else diagonal_gaussian(moments, axis=1).mode()
        half = out.shape[0] // 2
        return out[:half], out[half:]

    dataset = ImageFolderDataset(config.data.origin_path, config.data.image_size)
    rank, world = jax.process_index(), jax.process_count()
    n_global = len(dataset) if args.limit is None else min(args.limit, len(dataset))
    # --limit is a GLOBAL budget; this rank's interleaved shard of it
    n = n_global // world + (1 if rank < n_global % world else 0)
    print(f"extracting {n_global} images ({n} on rank {rank}) "
          f"from {config.data.origin_path} -> {out_dir}")
    writer = LatentShardWriter(out_dir, rank=rank, shard_size=10000)
    def device_batches():
        # jnp.asarray on the prefetch thread: the host->device copy of batch
        # k+1 overlaps the encode of batch k
        for imgs, labels, idxs in dataset.iter_batches(
            args.batch, hflip=False, raw_uint8=True,
            process_index=rank, process_count=world,
        ):
            yield jnp.asarray(imgs), labels, idxs

    it = Prefetcher(device_batches(), buffer_size=4)

    t0 = time.time()
    done = 0
    pending = None  # one batch in flight: host writes overlap device encode
    for imgs, labels, idxs in it:
        if done >= n:
            break
        take = min(len(labels), n - done)
        if take < len(labels):  # trim the final batch to the exact quota
            imgs, labels = imgs[:take], labels[:take]
        lat, lat_f = encode_both(imgs)
        if pending is not None:
            plat, plat_f, plabels = pending
            writer.add(np.asarray(plat), np.asarray(plat_f), plabels)
        pending = (lat, lat_f, labels)
        done += take
        if done % (args.batch * 10) < args.batch:
            print(f"[rank {rank}] {done}/{n} ({done / (time.time() - t0):.1f} img/s)")
    if pending is not None:
        plat, plat_f, plabels = pending
        writer.add(np.asarray(plat), np.asarray(plat_f), plabels)
    writer.flush()

    # all ranks must have flushed their shards before rank 0 computes
    # latents_stats over the directory (reference: dist.barrier() at
    # extract_features.py:215)
    from ..parallel.distributed import barrier

    barrier("extract_shards_flushed")
    if rank == 0:
        ds = ImgLatentDataset(out_dir, latent_norm=True, sample=store_moments)
        print(f"latent stats cached; mean[:4]={ds._latent_mean.ravel()[:4]}")
    # re-sync before exit: without this, non-zero ranks reach the JAX
    # atexit shutdown barrier while rank 0 is still scanning shards for
    # stats; on a loaded host the skew exceeds the coordination-service
    # shutdown timeout and it KILLS rank 0 mid-stats ("Shutdown barrier
    # has failed"). The reference exits through DDP destroy which has the
    # same rendezvous semantics.
    barrier("extract_stats_done")


if __name__ == "__main__":
    main()
