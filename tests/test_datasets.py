"""Downstream dataset classes + pe_reset interop tool."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from ldmae_tpu.data.datasets import (
    ADE20KPatchDataset,
    CelebAMaskDataset,
    InatDataset,
    RobustImageFolder,
    build_transform,
    filter_tiny_imagenet,
)
from ldmae_tpu.data.images import ImageFolderDataset


@pytest.fixture
def celeba_root(tmp_path):
    imgs = tmp_path / "imgs"
    annot = tmp_path / "annot"
    imgs.mkdir()
    (annot / "0").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            imgs / f"{i}.jpg"
        )
        mask = (rng.random((64, 64)) > 0.5).astype(np.uint8) * 255
        Image.fromarray(mask).save(annot / "0" / f"{str(i).zfill(5)}_hair.png")
    return str(imgs), str(annot)


class TestCelebaMask:
    def test_loading(self, celeba_root):
        imgs, annot = celeba_root
        ds = CelebAMaskDataset(imgs, annot, ["hair", "nose"], img_size=(32, 32), mask_size=(8, 8))
        assert len(ds) == 3
        image, masks = ds[0]
        assert image.shape == (3, 32, 32)
        assert "hair" in masks and masks["hair"].shape == (8, 8)
        assert "nose" not in masks  # no nose masks on disk

    def test_downsized(self, celeba_root):
        imgs, annot = celeba_root
        ds = CelebAMaskDataset(imgs, annot, ["hair"], return_downsized_image=True)
        image, masks, small = ds[0]
        assert small.shape == (3, 32, 32)


class TestOthers:
    def test_robust_folder_substitutes(self, tmp_path):
        d = tmp_path / "c0"
        d.mkdir()
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(d / "good.png")
        (d / "bad.png").write_bytes(b"not an image")
        ds = RobustImageFolder(str(tmp_path), image_size=16)
        assert len(ds) == 2
        # 'bad.png' sorts before 'good.png'; fetching it must substitute
        img, label = ds.get(0)
        assert img.shape == (3, 16, 16)
        assert ds.num_corrupt >= 1

    def test_tiny_imagenet_filter(self, tmp_path):
        for c in ["n01", "n02", "n03"]:
            d = tmp_path / "data" / c
            d.mkdir(parents=True)
            Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(d / "x.png")
        wnids = tmp_path / "wnids.txt"
        wnids.write_text("n03\nn01\n")
        ds = ImageFolderDataset(str(tmp_path / "data"), 8)
        ds = filter_tiny_imagenet(ds, str(wnids))
        assert len(ds.samples) == 2
        labels = {os.path.basename(os.path.dirname(p)): l for p, l in ds.samples}
        assert labels == {"n03": 0, "n01": 1}

    def test_ade20k(self, tmp_path):
        imgs = tmp_path / "images"
        anns = tmp_path / "annotations"
        imgs.mkdir(); anns.mkdir()
        Image.fromarray(np.zeros((40, 40, 3), np.uint8)).save(imgs / "scene.jpg")
        Image.fromarray((np.arange(64).reshape(8, 8) % 5).astype(np.uint8)).save(
            anns / "scene.png"
        )
        ds = ADE20KPatchDataset(str(imgs), str(anns), img_size=16, mask_size=8)
        image, mask = ds[0]
        assert image.shape == (3, 16, 16)
        assert mask.shape == (8, 8)

    def test_inat_manifest(self, tmp_path):
        img_dir = tmp_path
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(img_dir / "a.png")
        manifest = {
            "images": [{"id": 7, "file_name": "a.png"}],
            "annotations": [{"image_id": 7, "category_id": 42}],
        }
        mf = tmp_path / "m.json"
        mf.write_text(json.dumps(manifest))
        ds = InatDataset(str(img_dir), str(mf), img_size=16)
        img, label = ds[0]
        assert img.shape == (3, 16, 16)
        assert label == 0  # remapped

    def test_build_transform(self):
        rng = np.random.default_rng(0)
        img = Image.fromarray(np.zeros((50, 70, 3), np.uint8))
        train_tf = build_transform(True, 16)
        eval_tf = build_transform(False, 16)
        assert train_tf(img, rng).shape == (3, 16, 16)
        assert eval_tf(img).shape == (3, 16, 16)


class TestPeReset:
    def test_resize_roundtrip(self, tmp_path):
        import torch
        from ldmae_tpu.cli.pe_reset import pe_reset, resize_pos_embed_np
        from ldmae_tpu.ops import get_2d_sincos_pos_embed

        pe = get_2d_sincos_pos_embed(16, 8)[None]  # (1, 64, 16)
        ckpt = {"model": {"pos_embed": torch.from_numpy(pe),
                          "decoder_pos_embed": torch.from_numpy(pe.copy())}}
        src = str(tmp_path / "in.pth")
        torch.save(ckpt, src)
        out = pe_reset(src, str(tmp_path / "out_pe.pth"), input_size=128, patch_size=8)
        back = torch.load(out, weights_only=False)
        assert back["model"]["pos_embed"].shape == (1, 256, 16)
        # bilinear result matches torch's interpolate
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(pe).reshape(1, 8, 8, 16).permute(0, 3, 1, 2),
            size=(16, 16), mode="bilinear", align_corners=False,
        ).permute(0, 2, 3, 1).reshape(1, 256, 16)
        np.testing.assert_allclose(
            back["model"]["pos_embed"].numpy(), ref.numpy(), rtol=1e-4, atol=1e-5
        )


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


class TestHFImageFolder:
    def test_adapter(self, tmp_path):
        pytest.importorskip("datasets")
        from ldmae_tpu.data.datasets import HFImageFolderDataset

        d = tmp_path / "train" / "cat"
        d.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(np.zeros((20, 20, 3), np.uint8)).save(d / f"{i}.png")
        ds = HFImageFolderDataset(str(tmp_path), image_size=16)
        assert len(ds) == 3
        img, label = ds.get(0)
        assert img.shape == (3, 16, 16)
        rng = np.random.default_rng(0)
        img2, _ = ds.get_train(1, rng, 16)
        assert img2.shape == (3, 16, 16)


class TestTokenizerFactoryErrors:
    def test_missing_checkpoint_raises(self, tmp_path):
        from ldmae_tpu.models.tokenizers import build_tokenizer

        with pytest.raises(FileNotFoundError):
            build_tokenizer("vmae", str(tmp_path / "nope.pth"), img_size=32)

    def test_unknown_vmae_arch_raises(self):
        from ldmae_tpu.models.tokenizers import build_tokenizer

        with pytest.raises(ValueError):
            build_tokenizer("vmae_f16d32")

    def test_fresh_noise_per_encode(self):
        import jax.numpy as jnp

        from ldmae_tpu.models.tokenizers import VMAE_Tokenizer

        tok = VMAE_Tokenizer(None, img_size=32, arch="mae_for_ldmae_f8d16_small")
        imgs = np.zeros((1, 3, 32, 32), np.float32)
        z1 = np.asarray(tok.encode_images(imgs))
        z2 = np.asarray(tok.encode_images(imgs))
        assert not np.allclose(z1, z2)  # fresh posterior noise each call
