"""Image-quality metrics: PSNR and SSIM.

Replacements for the reference's metric calls in evaluate_tokenizer.py:
  * PSNR on uint8-scale pixels: 20·log10(255/√MSE) (evaluate_tokenizer.py:224-226)
  * SSIM matching torchmetrics StructuralSimilarityIndexMeasure defaults
    (gaussian kernel 11, sigma 1.5, k1=0.01, k2=0.03) with an explicit
    data_range (the reference passes (-1.0, 1.0) → range 2.0,
    evaluate_tokenizer.py:156)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(original: jnp.ndarray, processed: jnp.ndarray, max_val: float = 255.0) -> jnp.ndarray:
    mse = jnp.mean((original.astype(jnp.float32) - processed.astype(jnp.float32)) ** 2)
    return 20 * jnp.log10(max_val / jnp.sqrt(mse))


def psnr_batch_np(a: np.ndarray, b: np.ndarray, max_val: float = 255.0) -> np.ndarray:
    """Per-image PSNR over a batch, host numpy (same arithmetic as psnr);
    used by cli.evaluate_tokenizer on the in-memory uint8 pairs."""
    d = a.astype(np.float32) - b.astype(np.float32)
    mse = (d.reshape(d.shape[0], -1) ** 2).mean(axis=1)
    return 20 * np.log10(max_val / np.sqrt(np.maximum(mse, 1e-12)))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    data_range: float = 2.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    per_image: bool = False,
) -> jnp.ndarray:
    """Mean SSIM over a batch ((N,) per-image means with ``per_image``).
    img1/img2: (N, C, H, W) float.

    data_range may be a (low, high) tuple, in which case inputs are clamped
    to it first — matching torchmetrics' StructuralSimilarityIndexMeasure
    with a tuple data_range, which the reference uses with (-1.0, 1.0)
    (evaluate_tokenizer.py:152-160); raw VAE decodes can exceed the range.
    """
    if isinstance(data_range, (tuple, list)):
        lo, hi = data_range
        img1 = jnp.clip(img1, lo, hi)
        img2 = jnp.clip(img2, lo, hi)
        data_range = float(hi) - float(lo)
    kern = jnp.asarray(_gaussian_kernel(kernel_size, sigma))
    c = img1.shape[1]
    w = jnp.broadcast_to(kern[None, None], (c, 1, kernel_size, kernel_size))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), w, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=c,
        )

    x, y = img1.astype(jnp.float32), img2.astype(jnp.float32)
    mu_x, mu_y = filt(x), filt(y)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x = filt(x * x) - mu_xx
    sigma_y = filt(y * y) - mu_yy
    sigma_xy = filt(x * y) - mu_xy

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    ssim_map = ((2 * mu_xy + c1) * (2 * sigma_xy + c2)) / (
        (mu_xx + mu_yy + c1) * (sigma_x + sigma_y + c2)
    )
    if per_image:
        return jnp.mean(ssim_map, axis=(1, 2, 3))
    return jnp.mean(ssim_map)
