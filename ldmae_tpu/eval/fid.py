"""FID computation (pytorch-fid parity).

JAX/numpy re-implementation of /root/reference/LDMAE/tools/calculate_fid.py:
  * ``calculate_frechet_distance`` — exact port of the Fréchet formula with
    the same eps-offset fallback for singular covariances (calculate_fid.py:523+)
  * ``compute_statistics_of_path`` — mu/sigma from an .npz or an image folder
    (with the ``sp_len`` cap semantics, calculate_fid.py:609-625)
  * ``calculate_fid_given_paths`` — two-path entry point

The InceptionV3 feature extractor lives in ldmae_tpu.models.inception (FID
2015 weights imported from the pt_inception-2015-12-05 torch file when
available). Any callable (N, 299, 299, 3)∈[0,1] → (N, 2048) can be plugged
in, which the tests use for math verification.
"""

from __future__ import annotations

import os
import pathlib
from typing import Callable, Optional, Tuple

import numpy as np
from scipy import linalg

IMAGE_EXTENSIONS = {"bmp", "jpg", "jpeg", "pgm", "png", "ppm", "tif", "tiff", "webp"}


def calculate_frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """Fréchet distance between two Gaussians (calculate_fid.py:523-570)."""
    mu1 = np.atleast_1d(mu1)
    mu2 = np.atleast_1d(mu2)
    sigma1 = np.atleast_2d(sigma1)
    sigma2 = np.atleast_2d(sigma2)
    assert mu1.shape == mu2.shape and sigma1.shape == sigma2.shape

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    tr_covmean = np.trace(covmean)
    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * tr_covmean
    )


def calculate_activation_statistics(
    act: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    mu = np.mean(act, axis=0)
    sigma = np.cov(act, rowvar=False)
    return mu, sigma


def get_folder_files(path: str, sp_len: int = 0) -> list:
    path = pathlib.Path(path)
    files = sorted(
        f for ext in IMAGE_EXTENSIONS for f in path.glob(f"*.{ext}")
    )
    if sp_len:
        assert len(files) >= sp_len, (
            f"{path} has {len(files)} images < sp_len={sp_len}"
        )
        files = files[:sp_len]
    return files


def get_activations_from_files(
    files: list,
    feature_fn: Callable[[np.ndarray], np.ndarray],
    batch_size: int = 64,
    image_size: int = 299,
    resize: bool = True,
    num_threads: int = 16,
) -> np.ndarray:
    """Stream image files through a feature extractor.

    feature_fn: (N, H, W, 3) float32 in [0, 1] -> (N, D) features.
    Matches pytorch-fid preprocessing: ToTensor only (resize happens inside
    the Inception wrapper, bilinear to 299, calculate_fid.py:270-281).
    """
    from concurrent.futures import ThreadPoolExecutor
    from PIL import Image

    def load(f):
        img = Image.open(f).convert("RGB")
        return np.asarray(img, dtype=np.float32) / 255.0

    feats = []
    with ThreadPoolExecutor(num_threads) as pool:
        for s in range(0, len(files), batch_size):
            chunk = files[s : s + batch_size]
            imgs = np.stack(list(pool.map(load, chunk)))
            feats.append(np.asarray(feature_fn(imgs)))
    return np.concatenate(feats)


def compute_statistics_of_path(
    path: str,
    feature_fn: Callable,
    batch_size: int = 64,
    sp_len: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """mu/sigma from .npz (keys mu/sigma) or an image folder
    (calculate_fid.py:609-625)."""
    if path.endswith(".npz"):
        with np.load(path) as f:
            return f["mu"][:], f["sigma"][:]
    files = get_folder_files(path, sp_len=sp_len)
    act = get_activations_from_files(files, feature_fn, batch_size)
    return calculate_activation_statistics(act)


def calculate_fid_given_paths(
    paths: list,
    feature_fn: Optional[Callable] = None,
    batch_size: int = 64,
    sp_len: int = 0,
) -> float:
    """FID between two paths (npz stats or image folders)
    (calculate_fid.py:628-648)."""
    for p in paths:
        if not os.path.exists(p):
            raise RuntimeError(f"Invalid path: {p}")
    if feature_fn is None:
        from ..models.inception import default_feature_fn

        feature_fn = default_feature_fn()
    m1, s1 = compute_statistics_of_path(paths[0], feature_fn, batch_size, sp_len)
    m2, s2 = compute_statistics_of_path(paths[1], feature_fn, batch_size, sp_len)
    return calculate_frechet_distance(m1, s1, m2, s2)
