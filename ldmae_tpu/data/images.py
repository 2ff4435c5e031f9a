"""Image-folder pipeline.

Replaces torchvision ImageFolder + transforms for the extraction/eval paths:
  * ADM center-crop (models_mae.py:85-103 — halving BOX resizes then BICUBIC
    scale then crop), deterministic horizontal flip
  * normalisation to [-1, 1] (Normalize(0.5, 0.5))
  * class labels from sorted subdirectory names (torchvision convention)
  * simple threaded prefetch for host-side decode overlapped with TPU compute
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Tuple

import numpy as np
from PIL import Image

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp", ".JPEG", ".JPG", ".PNG")


def center_crop_arr(pil_image: Image.Image, image_size: int) -> Image.Image:
    """ADM center-crop (models_mae.py:85-103)."""
    while min(*pil_image.size) >= 2 * image_size:
        pil_image = pil_image.resize(
            tuple(x // 2 for x in pil_image.size), resample=Image.BOX
        )
    scale = image_size / min(*pil_image.size)
    pil_image = pil_image.resize(
        tuple(round(x * scale) for x in pil_image.size), resample=Image.BICUBIC
    )
    arr = np.array(pil_image)
    crop_y = (arr.shape[0] - image_size) // 2
    crop_x = (arr.shape[1] - image_size) // 2
    return Image.fromarray(arr[crop_y : crop_y + image_size, crop_x : crop_x + image_size])


def load_image(
    path: str, image_size: int, hflip: bool = False, raw_uint8: bool = False
) -> np.ndarray:
    """-> (3, H, W) float32 in [-1, 1] (center-crop + optional flip +
    Normalize(0.5, 0.5); models_mae.py:972-987).

    raw_uint8=True returns the cropped (H, W, 3) uint8 pixels instead —
    the extraction path normalizes on device so the host->device transfer
    is 4x smaller (normalize_uint8_images is the exact same arithmetic)."""
    img = Image.open(path).convert("RGB")
    img = center_crop_arr(img, image_size)
    if hflip:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    if raw_uint8:
        return np.asarray(img, dtype=np.uint8)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    arr = (arr - 0.5) / 0.5
    return arr.transpose(2, 0, 1)


def normalize_uint8_images(imgs):
    """(B, H, W, 3) uint8 -> (B, 3, H, W) float32 in [-1, 1], the device-side
    counterpart of load_image's normalization (identical fp32 arithmetic)."""
    import jax.numpy as jnp

    x = imgs.astype(jnp.float32) / 255.0
    x = (x - 0.5) / 0.5
    return x.transpose(0, 3, 1, 2)


class ImageFolderDataset:
    """torchvision-ImageFolder-compatible listing: labels are indices into
    the sorted class-directory names; flat dirs get label 0."""

    def __init__(self, root: str, image_size: int = 256):
        self.root = root
        self.image_size = image_size
        self.samples: List[Tuple[str, int]] = []
        classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        if classes:
            self.classes = classes
            for ci, c in enumerate(classes):
                cdir = os.path.join(root, c)
                for f in sorted(os.listdir(cdir)):
                    if f.endswith(IMG_EXTS):
                        self.samples.append((os.path.join(cdir, f), ci))
        else:
            self.classes = ["all"]
            for f in sorted(os.listdir(root)):
                if f.endswith(IMG_EXTS):
                    self.samples.append((os.path.join(root, f), 0))

    def __len__(self):
        return len(self.samples)

    def get(
        self, idx: int, hflip: bool = False, raw_uint8: bool = False
    ) -> Tuple[np.ndarray, int]:
        path, label = self.samples[idx]
        return load_image(path, self.image_size, hflip, raw_uint8), label

    def iter_batches(
        self,
        batch_size: int,
        *,
        hflip: bool = False,
        process_index: int = 0,
        process_count: int = 1,
        drop_last: bool = False,
        num_threads: int = 16,
        raw_uint8: bool = False,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Sequential sharded iteration (extraction uses shuffle=False
        DistributedSampler — extract_features.py:111-119). Yields
        (images, labels, indices); a short batch may end the stream."""
        from concurrent.futures import ThreadPoolExecutor

        idxs = list(range(process_index, len(self.samples), process_count))
        with ThreadPoolExecutor(num_threads) as pool:
            for s in range(0, len(idxs), batch_size):
                chunk = idxs[s : s + batch_size]
                if drop_last and len(chunk) < batch_size:
                    break
                results = list(pool.map(lambda i: self.get(i, hflip, raw_uint8), chunk))
                imgs = np.stack([r[0] for r in results])
                labels = np.asarray([r[1] for r in results], np.int64)
                yield imgs, labels, np.asarray(chunk)
