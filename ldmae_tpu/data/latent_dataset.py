"""Latent shard dataset (safetensors).

Byte-compatible with the reference's extraction format
(/root/reference/LDMAE/extract_features.py:163-212 and
datasets/img_latent_dataset.py): shards named
``latents_rank{R:02d}_shard{S:03d}.safetensors`` with keys
``latents`` / ``latents_flip`` (N, C, h, w) and ``labels`` (N,), plus a
``latents_stats.pt`` cache holding channelwise mean/std (1, C, 1, 1).

TPU-shaped loading: instead of the reference's per-item safe_open +
random-key flip choice in DataLoader workers, shards are memory-mapped once,
and batches are assembled host-side as numpy with the flip chosen per sample
(50/50, img_latent_dataset.py:80) and optional moment-sampling done *on
device inside the train step* (``sample_moments`` flag) so the Gaussian
sample rides the accelerator.
"""

from __future__ import annotations

import os
from glob import glob
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from safetensors import safe_open
from safetensors.numpy import save_file as np_save_file


class ImgLatentDataset:
    """Reader matching ImgLatentDataset semantics (img_latent_dataset.py:16-93)."""

    def __init__(
        self,
        data_dir: str,
        latent_norm: bool = True,
        latent_multiplier: float = 1.0,
        sample: bool = False,
        seed: int = 0,
    ):
        self.data_dir = data_dir
        self.latent_norm = latent_norm
        self.latent_multiplier = latent_multiplier
        self.sample = sample
        self._rng = np.random.default_rng(seed)

        self.files = sorted(glob(os.path.join(data_dir, "*.safetensors")))
        if not self.files:
            raise FileNotFoundError(f"no .safetensors shards in {data_dir}")
        # index: cumulative sizes
        self._sizes = []
        self._handles: List = []
        for f in self.files:
            h = safe_open(f, framework="numpy", device="cpu")
            self._handles.append(h)
            self._sizes.append(h.get_slice("labels").get_shape()[0])
        self._cum = np.cumsum([0] + self._sizes)

        if latent_norm:
            self._latent_mean, self._latent_std = self.get_latent_stats()
        else:
            self._latent_mean = self._latent_std = None

    def __len__(self) -> int:
        return int(self._cum[-1])

    # -- stats ---------------------------------------------------------------
    def get_latent_stats(self) -> Tuple[np.ndarray, np.ndarray]:
        cache = os.path.join(self.data_dir, "latents_stats.pt")
        if os.path.exists(cache) or os.path.exists(cache + ".npz"):
            stats = _load_stats(cache)
        else:
            stats = self.compute_latent_stats()
            # only one process writes (the stats are deterministic given the
            # shards + seed, so other ranks computing in-memory is fine);
            # _save_stats writes atomically either way
            try:
                import jax

                write = jax.process_index() == 0
            except Exception:
                write = True
            if write:
                _save_stats(cache, stats)
        return stats["mean"], stats["std"]

    def compute_latent_stats(self, num_samples: int = 10000) -> Dict[str, np.ndarray]:
        """Channelwise mean/std over ≤10k random latents
        (img_latent_dataset.py:53-71); moment-latents are sampled first when
        ``sample`` is set."""
        n = min(num_samples, len(self))
        idx = self._rng.choice(len(self), n, replace=False)
        latents = np.stack([self._raw(i, "latents") for i in idx])
        if self.sample:
            latents = _sample_moments_np(latents, self._rng)
        mean = latents.mean(axis=(0, 2, 3), keepdims=True)[0][None]
        std = latents.std(axis=(0, 2, 3), ddof=1, keepdims=True)[0][None]
        return {"mean": mean.astype(np.float32), "std": std.astype(np.float32)}

    # -- access ----------------------------------------------------------------
    def _locate(self, idx: int) -> Tuple[int, int]:
        fi = int(np.searchsorted(self._cum, idx, side="right") - 1)
        return fi, idx - int(self._cum[fi])

    def _raw(self, idx: int, key: str) -> np.ndarray:
        fi, local = self._locate(int(idx))
        return np.asarray(self._handles[fi].get_slice(key)[local : local + 1][0])

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        key = "latents" if self._rng.uniform() > 0.5 else "latents_flip"
        feature = self._raw(idx, key).astype(np.float32)
        label = self._raw(idx, "labels")
        if self.sample:
            feature = _sample_moments_np(feature[None], self._rng)[0]
        if self.latent_norm:
            feature = (feature - self._latent_mean[0]) / self._latent_std[0]
        feature = feature * self.latent_multiplier
        return feature, label

    # -- batched iteration -------------------------------------------------------
    def iter_batches(
        self,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        epochs: Optional[int] = None,
        process_index: int = 0,
        process_count: int = 1,
        start_epoch: int = 0,
        skip_batches: int = 0,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Host-sharded batch iterator (replaces DistributedSampler+DataLoader).

        Yields {"x": (B, C, h, w) fp32, "y": (B,) int64}. Each host reads an
        interleaved index shard. Flip choice is per-sample; normalisation
        applied; moment-sampling (when ``sample``) is left to the caller's
        device-side code when ``device_sample`` shards carry 2C channels —
        here it's applied on host for simplicity/parity.

        start_epoch/skip_batches resume the data stream mid-run (each epoch
        reshuffles with seed+epoch, so the restored step maps to an exact
        position); skipped batches cost only index arithmetic, no IO.
        """
        n = len(self)
        epoch = start_epoch
        while epochs is None or epoch < start_epoch + epochs:
            order = np.arange(n)
            if shuffle:
                np.random.default_rng(seed + epoch).shuffle(order)
            order = order[process_index::process_count]
            stop = len(order) - (len(order) % batch_size if drop_last else 0)
            for s in range(0, stop, batch_size):
                if epoch == start_epoch and s < skip_batches * batch_size:
                    continue
                idx = order[s : s + batch_size]
                feats, labels = zip(*(self[i] for i in idx))
                yield {
                    "x": np.stack(feats),
                    "y": np.asarray(labels).reshape(-1).astype(np.int64),
                }
            epoch += 1


def _sample_moments_np(moments: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """DiagonalGaussian(moments).sample() on host numpy (chunk on channel)."""
    c = moments.shape[1] // 2
    mean, logvar = moments[:, :c], np.clip(moments[:, c:], -30.0, 20.0)
    std = np.exp(0.5 * logvar)
    return (mean + std * rng.standard_normal(mean.shape)).astype(np.float32)


def _save_stats(path: str, stats: Dict[str, np.ndarray]) -> None:
    """latents_stats.pt via torch for reference compat; .npz fallback.
    Atomic (tmp + rename) so a concurrent reader never sees a partial file."""
    try:
        import torch

        tmp = path + f".tmp{os.getpid()}"
        torch.save(
            {k: torch.from_numpy(np.asarray(v)) for k, v in stats.items()}, tmp
        )
        os.replace(tmp, path)
    except ImportError:
        tmp = path + f".tmp{os.getpid()}.npz"
        np.savez(tmp, **stats)
        os.replace(tmp, path + ".npz")


def _load_stats(path: str) -> Dict[str, np.ndarray]:
    if os.path.exists(path):
        try:
            import torch
        except ImportError:
            torch = None
        if torch is not None:
            raw = torch.load(path, map_location="cpu", weights_only=False)
            return {
                k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
                for k, v in raw.items()
            }
        if not os.path.exists(path + ".npz"):
            raise ImportError(
                f"{path} is a torch pickle but torch is unavailable; "
                "re-extract to produce the .npz fallback"
            )
    raw = np.load(path + ".npz")
    return {k: raw[k] for k in raw.files}


class LatentShardWriter:
    """Writer matching extract_features.py:163-212: buffers ``shard_size``
    encodings, then writes latents/latents_flip/labels + metadata."""

    def __init__(self, out_dir: str, rank: int = 0, shard_size: int = 10000):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.rank = rank
        self.shard_size = shard_size
        self.shard_idx = 0
        self._lat: List[np.ndarray] = []
        self._flip: List[np.ndarray] = []
        self._lab: List[np.ndarray] = []
        self._count = 0

    def add(self, latents: np.ndarray, latents_flip: np.ndarray, labels: np.ndarray):
        self._lat.append(np.asarray(latents))
        self._flip.append(np.asarray(latents_flip))
        self._lab.append(np.asarray(labels))
        self._count += len(labels)
        if self._count >= self.shard_size:
            self.flush()

    def flush(self):
        if not self._lab:
            return
        lat = np.concatenate(self._lat)
        flip = np.concatenate(self._flip)
        lab = np.concatenate(self._lab).astype(np.int64)
        name = f"latents_rank{self.rank:02d}_shard{self.shard_idx:03d}.safetensors"
        np_save_file(
            {"latents": lat, "latents_flip": flip, "labels": lab},
            os.path.join(self.out_dir, name),
            metadata={"total_size": str(len(lab)), "dtype": str(lat.dtype)},
        )
        self.shard_idx += 1
        self._lat, self._flip, self._lab, self._count = [], [], [], 0
