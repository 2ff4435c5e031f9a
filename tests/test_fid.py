"""FID math + InceptionV3 structural tests."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from ldmae_tpu.eval.fid import (
    calculate_activation_statistics,
    calculate_frechet_distance,
    calculate_fid_given_paths,
)
from ldmae_tpu.models.inception import (
    _avg_pool_no_pad_count,
    _max_pool,
    init_random_inception_params,
    inception_forward,
)


class TestFrechet:
    def test_identical_is_zero(self):
        rng = np.random.default_rng(0)
        act = rng.standard_normal((500, 16))
        mu, sigma = calculate_activation_statistics(act)
        assert calculate_frechet_distance(mu, sigma, mu, sigma) < 1e-6

    def test_known_value_isotropic(self):
        # FID between N(0, I) and N(m, I) = ||m||²
        d = 8
        mu1, mu2 = np.zeros(d), np.full(d, 2.0)
        s = np.eye(d)
        fid = calculate_frechet_distance(mu1, s, mu2, s)
        np.testing.assert_allclose(fid, d * 4.0, rtol=1e-6)

    def test_known_value_variance(self):
        # N(0, a I) vs N(0, b I): d * (a + b - 2 sqrt(ab))
        d = 4
        fid = calculate_frechet_distance(
            np.zeros(d), 4.0 * np.eye(d), np.zeros(d), 1.0 * np.eye(d)
        )
        np.testing.assert_allclose(fid, d * (4 + 1 - 2 * 2), rtol=1e-6)

    def test_sampling_consistency(self):
        rng = np.random.default_rng(1)
        a = rng.standard_normal((4000, 8))
        b = rng.standard_normal((4000, 8)) + 1.0
        mu1, s1 = calculate_activation_statistics(a)
        mu2, s2 = calculate_activation_statistics(b)
        fid = calculate_frechet_distance(mu1, s1, mu2, s2)
        assert 7 < fid < 9  # ≈ ||1||² = 8


class TestPooling:
    def test_avg_pool_count_include_pad_false(self):
        x = np.random.randn(2, 3, 9, 9).astype(np.float32)
        ref = F.avg_pool2d(
            torch.from_numpy(x), 3, stride=1, padding=1, count_include_pad=False
        ).numpy()
        out = _avg_pool_no_pad_count(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)

    def test_max_pool(self):
        x = np.random.randn(2, 3, 11, 11).astype(np.float32)
        ref = F.max_pool2d(torch.from_numpy(x), 3, stride=2).numpy()
        out = _max_pool(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5)


class TestInception:
    def test_forward_shapes(self):
        params = init_random_inception_params(jax.random.key(0))
        x = jnp.asarray(np.random.rand(2, 64, 64, 3), jnp.float32)
        pooled, spatial = inception_forward(params, x, return_spatial=True)
        assert pooled.shape == (2, 2048)
        # default tap is now the exact ADM mixed_6/conv node: the post-relu
        # Mixed_6d.branch1x1, (N, 192, 17, 17)
        assert spatial.shape == (2, 192, 17, 17)
        assert np.all(np.isfinite(np.asarray(pooled)))

    def test_fid_paths_on_folders(self, tmp_path):
        """calculate_fid_given_paths over two small folders with a toy
        feature extractor."""
        from PIL import Image

        rng = np.random.default_rng(0)
        for name, shift in [("a", 0), ("b", 60)]:
            d = tmp_path / name
            d.mkdir()
            for i in range(8):
                arr = np.clip(
                    rng.integers(0, 180, (16, 16, 3)) + shift, 0, 255
                ).astype(np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")

        def toy_features(x):  # mean/std per channel + patch means
            n = x.shape[0]
            return np.concatenate(
                [x.mean((1, 2)), x.std((1, 2)), x.reshape(n, -1)[:, :10]], axis=1
            )

        fid_ab = calculate_fid_given_paths(
            [str(tmp_path / "a"), str(tmp_path / "b")], feature_fn=toy_features
        )
        fid_aa = calculate_fid_given_paths(
            [str(tmp_path / "a"), str(tmp_path / "a")], feature_fn=toy_features
        )
        assert fid_aa < 1e-6
        assert fid_ab > fid_aa

    def test_npz_stats_path(self, tmp_path):
        rng = np.random.default_rng(0)
        act = rng.standard_normal((100, 8))
        mu, sigma = calculate_activation_statistics(act)
        np.savez(tmp_path / "ref.npz", mu=mu, sigma=sigma)
        from ldmae_tpu.eval.fid import compute_statistics_of_path

        m, s = compute_statistics_of_path(str(tmp_path / "ref.npz"), None)
        np.testing.assert_allclose(m, mu)
        np.testing.assert_allclose(s, sigma)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
