"""Latent shard writer/reader round-trip and stats semantics."""

import numpy as np
import pytest

from ldmae_tpu.data.latent_dataset import (
    ImgLatentDataset,
    LatentShardWriter,
    _sample_moments_np,
)


@pytest.fixture
def shard_dir(tmp_path):
    w = LatentShardWriter(str(tmp_path), rank=0, shard_size=8)
    rng = np.random.default_rng(0)
    for i in range(3):
        n = 7
        lat = rng.standard_normal((n, 4, 2, 2)).astype(np.float32) * 2 + 1
        w.add(lat, -lat, np.arange(i * n, (i + 1) * n))
    w.flush()
    return str(tmp_path)


class TestShards:
    def test_roundtrip(self, shard_dir):
        ds = ImgLatentDataset(shard_dir, latent_norm=False)
        assert len(ds) == 21
        x, y = ds[0]
        assert x.shape == (4, 2, 2)
        # labels preserved across shards
        labels = sorted(int(ds._raw(i, "labels")) for i in range(21))
        assert labels == list(range(21))

    def test_flip_choice(self, shard_dir):
        ds = ImgLatentDataset(shard_dir, latent_norm=False, seed=1)
        raws = {i: ds._raw(i, "latents") for i in range(21)}
        flips = 0
        for trial in range(50):
            x, _ = ds[3]
            if np.allclose(x, -raws[3]):
                flips += 1
            else:
                assert np.allclose(x, raws[3])
        assert 10 < flips < 40  # ~50/50

    def test_stats_and_norm(self, shard_dir):
        ds = ImgLatentDataset(shard_dir, latent_norm=True)
        assert ds._latent_mean.shape == (1, 4, 1, 1)
        # normalised data ~ zero-mean unit-std per channel (unflipped half of
        # the data is N(1,2), flipped is N(-1,2) so global is ~N(0, sqrt(5)))
        import os

        assert os.path.exists(os.path.join(shard_dir, "latents_stats.pt"))
        # cache is reused
        ds2 = ImgLatentDataset(shard_dir, latent_norm=True)
        np.testing.assert_allclose(ds2._latent_mean, ds._latent_mean)

    def test_iter_batches_host_sharding(self, shard_dir):
        ds = ImgLatentDataset(shard_dir, latent_norm=False)
        seen = []
        for p in range(2):
            it = ds.iter_batches(4, shuffle=True, seed=7, epochs=1, process_index=p, process_count=2)
            for b in it:
                assert b["x"].shape == (4, 4, 2, 2)
                assert b["y"].shape == (4,)
                seen.append(b["y"])
        # two hosts see disjoint samples within an epoch
        all_y = np.concatenate(seen)
        assert len(np.unique(all_y)) == len(all_y)

    def test_sample_moments(self):
        rng = np.random.default_rng(0)
        moments = np.zeros((1000, 8, 2, 2), np.float32)
        moments[:, :4] = 3.0
        moments[:, 4:] = np.log(0.25)
        s = _sample_moments_np(moments, rng)
        assert s.shape == (1000, 4, 2, 2)
        assert abs(s.mean() - 3.0) < 0.05
        assert abs(s.std() - 0.5) < 0.05


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


class TestDeviceSideFlip:
    def test_hflip_equals_array_flip_after_crop(self, tmp_path):
        """cli.extract_features flips the cropped tensor on device instead of
        decoding every image twice; valid because the extraction transform
        applies the deterministic flip AFTER the ADM center-crop
        (models_mae.py:972-987), so the two commute exactly."""
        from PIL import Image

        from ldmae_tpu.data.images import load_image

        rng = np.random.default_rng(3)
        p = str(tmp_path / "x.png")
        # non-square so the crop path is exercised
        Image.fromarray(rng.integers(0, 255, (90, 70, 3), dtype=np.uint8)).save(p)
        plain = load_image(p, 32, hflip=False)
        flipped = load_image(p, 32, hflip=True)
        np.testing.assert_array_equal(flipped, plain[..., ::-1])

    def test_uint8_device_normalization_parity(self, tmp_path):
        """normalize_uint8_images (device) must reproduce load_image's host
        fp32 normalization bit-exactly (extraction ships uint8 pixels)."""
        import jax.numpy as jnp
        from PIL import Image

        from ldmae_tpu.data.images import load_image, normalize_uint8_images

        rng = np.random.default_rng(4)
        p = str(tmp_path / "y.png")
        Image.fromarray(rng.integers(0, 255, (70, 90, 3), dtype=np.uint8)).save(p)
        host = load_image(p, 32, hflip=False)
        raw = load_image(p, 32, hflip=False, raw_uint8=True)
        dev = np.asarray(normalize_uint8_images(jnp.asarray(raw[None])))[0]
        np.testing.assert_array_equal(dev, host)
