"""Downstream-task datasets (torch-free).

Equivalents of /root/reference/VMAE/util/datasets.py — the probe/eval
datasets outside the main pipeline:

  * CelebAMaskDataset (datasets.py:29-106): face images + per-class binary
    part masks (resized NEAREST to the latent grid)
  * tiny-imagenet subset filter (datasets.py:108-130)
  * ADE20KPatchDataset (datasets.py:133-175): scene images + segmentation
  * InatDataset-style json-manifest reader (datasets.py:177-202)
  * RobustImageFolder (datasets.py:204-238 / misc.py:765-798): ImageFolder
    that substitutes a random other sample when an image is corrupt
  * build_transform (datasets.py:240-305): train (RandomResizedCrop+flip)
    and eval (resize 256/224-style crop) transforms

All return numpy arrays in the framework's (-1, 1) NCHW convention.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from .augment import train_augment
from .images import IMG_EXTS, ImageFolderDataset, center_crop_arr, load_image


def _to_tensor_norm(img: Image.Image) -> np.ndarray:
    arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
    return ((arr - 0.5) / 0.5).transpose(2, 0, 1)


class CelebAMaskDataset:
    """Images + {class: bool mask} dicts on the latent grid."""

    def __init__(
        self,
        images_path: str,
        annot_path: str,
        target_classes: Sequence[str],
        img_size: Tuple[int, int] = (256, 256),
        mask_size: Tuple[int, int] = (32, 32),
        return_downsized_image: bool = False,
    ):
        self.images_path = images_path
        self.target_classes = list(target_classes)
        self.img_size = img_size
        self.mask_size = mask_size
        self.return_downsized_image = return_downsized_image
        self.image_files = sorted(
            f for f in os.listdir(images_path) if f.endswith(".jpg")
        )
        self.annot_path_dict: Dict[str, str] = {}
        for folder in os.listdir(annot_path):
            fp = os.path.join(annot_path, folder)
            if os.path.isdir(fp):
                for fn in os.listdir(fp):
                    full = os.path.join(fp, fn)
                    if os.path.isfile(full):
                        self.annot_path_dict[fn] = full

    def __len__(self):
        return len(self.image_files)

    def __getitem__(self, idx: int):
        fn = self.image_files[idx]
        img = Image.open(os.path.join(self.images_path, fn))
        image = _to_tensor_norm(img.resize(self.img_size[::-1], Image.BILINEAR))
        base = os.path.splitext(fn)[0].zfill(5)
        masks: Dict[str, np.ndarray] = {}
        for cls in self.target_classes:
            mp = self.annot_path_dict.get(f"{base}_{cls}.png")
            if mp is not None:
                m = Image.open(mp).convert("L").resize(
                    self.mask_size[::-1], Image.NEAREST
                )
                m = np.asarray(m) > 0
                if m.sum() > 0:
                    masks[cls] = m
        if self.return_downsized_image:
            small = _to_tensor_norm(img.resize((32, 32), Image.BILINEAR))
            return image, masks, small
        return image, masks


def filter_tiny_imagenet(
    dataset: ImageFolderDataset, class_list_file: str
) -> ImageFolderDataset:
    """Restrict an ImageFolder to the tiny-imagenet-200 wnids and remap
    labels 0-199 (datasets.py:108-130)."""
    with open(class_list_file) as f:
        selected = [line.strip() for line in f if line.strip()]
    remap = {c: i for i, c in enumerate(selected)}
    dataset.samples = [
        (p, remap[os.path.basename(os.path.dirname(p))])
        for p, _ in dataset.samples
        if os.path.basename(os.path.dirname(p)) in remap
    ]
    dataset.classes = selected
    return dataset


class ADE20KPatchDataset:
    """Scene images + integer segmentation maps on the latent grid."""

    def __init__(
        self,
        images_dir: str,
        annotations_dir: str,
        img_size: int = 256,
        mask_size: int = 32,
    ):
        self.images = sorted(
            os.path.join(images_dir, f)
            for f in os.listdir(images_dir)
            if f.endswith(IMG_EXTS)
        )
        self.annotations_dir = annotations_dir
        self.img_size = img_size
        self.mask_size = mask_size

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx: int):
        ip = self.images[idx]
        image = _to_tensor_norm(
            Image.open(ip).resize((self.img_size, self.img_size), Image.BILINEAR)
        )
        base = os.path.splitext(os.path.basename(ip))[0]
        mp = os.path.join(self.annotations_dir, base + ".png")
        mask = np.zeros((self.mask_size, self.mask_size), np.int32)
        if os.path.exists(mp):
            m = Image.open(mp).resize((self.mask_size, self.mask_size), Image.NEAREST)
            mask = np.asarray(m, np.int32)
        return image, mask


class InatDataset:
    """iNaturalist-style dataset from a json manifest with
    {'images': [{'file_name': ...}], 'annotations': [{'category_id': ...}]}
    (datasets.py:177-202)."""

    def __init__(self, root: str, annotation_json: str, img_size: int = 224):
        with open(annotation_json) as f:
            manifest = json.load(f)
        self.root = root
        self.img_size = img_size
        anns = {a["image_id"]: a["category_id"] for a in manifest.get("annotations", [])}
        self.samples = []
        for im in manifest.get("images", []):
            if "id" not in im or im["id"] not in anns:
                # defaulting to category 0 would silently mislabel
                # unannotated images as a real class
                raise KeyError(
                    f"image {im.get('file_name', '?')!r} has no matching "
                    "annotation in the manifest"
                )
            self.samples.append(
                (os.path.join(root, im["file_name"]), anns[im["id"]])
            )
        cats = sorted({label for _, label in self.samples})
        self._remap = {c: i for i, c in enumerate(cats)}

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int):
        path, label = self.samples[idx]
        return load_image(path, self.img_size), self._remap[label]


class RobustImageFolder(ImageFolderDataset):
    """ImageFolder that substitutes a random other sample on decode failure
    (the reference's retry-with-random-substitute, datasets.py:204-238)."""

    def __init__(self, root: str, image_size: int = 256, max_retries: int = 10, seed: int = 0):
        super().__init__(root, image_size)
        self.max_retries = max_retries
        self._rng = np.random.default_rng(seed)
        self.num_corrupt = 0

    def get(self, idx: int, hflip: bool = False):
        for _ in range(self.max_retries):
            try:
                return super().get(idx, hflip)
            except (OSError, ValueError):
                self.num_corrupt += 1
                idx = int(self._rng.integers(0, len(self.samples)))
        raise OSError(f"{self.max_retries} consecutive corrupt images")


def build_transform(is_train: bool, input_size: int = 224):
    """timm-style train/eval transform factory (datasets.py:240-305):
    returns fn(PIL, rng) -> (3, S, S) float32 in [-1, 1]."""
    if is_train:
        def tf(img: Image.Image, rng: np.random.Generator) -> np.ndarray:
            return train_augment(img, rng, input_size, scale=(0.2, 1.0))

        return tf

    def tf(img: Image.Image, rng=None) -> np.ndarray:
        # eval (datasets.py:290-301): Resize(shorter side -> input/crop_pct,
        # bicubic) then a PLAIN center crop — no second rescale; crop_pct is
        # 224/256 for input_size <= 224 and 1.0 above (the reference keeps
        # the 224-protocol ratio only at small sizes)
        crop_pct = 224 / 256 if input_size <= 224 else 1.0
        size = int(input_size / crop_pct)
        w, h = img.size
        scale = size / min(w, h)
        img = img.resize(
            (max(round(w * scale), input_size), max(round(h * scale), input_size)),
            Image.BICUBIC,
        )
        arr = np.array(img)
        cy = (arr.shape[0] - input_size) // 2
        cx = (arr.shape[1] - input_size) // 2
        return _to_tensor_norm(
            Image.fromarray(arr[cy : cy + input_size, cx : cx + input_size])
        )

    return tf


class HFImageFolderDataset:
    """HuggingFace `load_dataset("imagefolder")` adapter — the reference's
    LAION branch (main_pretrain.py:162-183). Exposes the same
    samples/get/iter-style access as ImageFolderDataset; labels come from the
    HF 'label' column when present, else 0."""

    def __init__(self, data_dir: str, image_size: int = 256, split: str = "train"):
        from datasets import load_dataset

        self.ds = load_dataset("imagefolder", data_dir=data_dir, split=split)
        self.image_size = image_size
        self.classes = (
            self.ds.features["label"].names if "label" in self.ds.features else ["all"]
        )

    def __len__(self):
        return len(self.ds)

    def get(self, idx: int, hflip: bool = False):
        rec = self.ds[int(idx)]
        img = rec["image"].convert("RGB")
        img = center_crop_arr(img, self.image_size)
        if hflip:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        arr = np.asarray(img, np.float32) / 255.0
        arr = ((arr - 0.5) / 0.5).transpose(2, 0, 1)
        return arr, int(rec.get("label", 0))

    def get_train(self, idx: int, rng: np.random.Generator, input_size: int):
        """RandomResizedCrop(0.75-1.0)+flip train transform like the LAION
        branch."""
        rec = self.ds[int(idx)]
        return train_augment(rec["image"].convert("RGB"), rng, input_size), int(
            rec.get("label", 0)
        )
