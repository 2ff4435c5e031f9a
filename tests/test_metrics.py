"""PSNR/SSIM metric tests vs closed forms and torch-style references."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ldmae_tpu.eval.metrics import psnr, ssim, _gaussian_kernel


class TestPSNR:
    def test_known_value(self):
        a = jnp.zeros((4, 4))
        b = jnp.full((4, 4), 16.0)  # mse = 256 -> sqrt = 16
        # 20*log10(255/16)
        np.testing.assert_allclose(
            float(psnr(a, b)), 20 * np.log10(255.0 / 16.0), rtol=1e-5
        )

    def test_identical_is_inf(self):
        a = jnp.ones((4, 4))
        assert np.isinf(float(psnr(a, a)))


class TestSSIM:
    def test_identical_is_one(self):
        x = jax.random.normal(jax.random.key(0), (2, 3, 32, 32))
        np.testing.assert_allclose(float(ssim(x, x)), 1.0, atol=1e-5)

    def test_uncorrelated_is_low(self):
        x = jax.random.normal(jax.random.key(0), (1, 3, 32, 32))
        y = jax.random.normal(jax.random.key(1), (1, 3, 32, 32))
        assert float(ssim(x, y)) < 0.2

    def test_monotone_in_noise(self):
        x = jax.random.normal(jax.random.key(0), (1, 3, 32, 32)) * 0.5
        s_small = float(ssim(x, x + 0.05 * jax.random.normal(jax.random.key(2), x.shape)))
        s_big = float(ssim(x, x + 0.5 * jax.random.normal(jax.random.key(3), x.shape)))
        assert s_big < s_small < 1.0

    def test_kernel_normalised(self):
        k = _gaussian_kernel(11, 1.5)
        np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
        assert k.shape == (11, 11)

    def test_matches_skimage_if_available(self):
        try:
            from skimage.metrics import structural_similarity as sk_ssim
        except ImportError:
            pytest.skip("skimage not installed")
        rng = np.random.default_rng(0)
        a = rng.random((32, 32)).astype(np.float32)
        b = (a + 0.1 * rng.standard_normal((32, 32))).astype(np.float32)
        ref = sk_ssim(
            a, b, win_size=11, gaussian_weights=True, sigma=1.5,
            use_sample_covariance=False, data_range=1.0,
        )
        out = float(ssim(jnp.asarray(a[None, None]), jnp.asarray(b[None, None]), data_range=1.0))
        np.testing.assert_allclose(out, ref, rtol=5e-3)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


class TestSsimClamp:
    def test_tuple_data_range_clamps_like_torchmetrics(self):
        """Out-of-range reconstructions must be clamped before SSIM when a
        (low, high) data_range is given (the reference evaluates with
        torchmetrics and data_range=(-1.0, 1.0))."""
        import jax

        from ldmae_tpu.eval.metrics import ssim

        rng = jax.random.key(0)
        a = jax.random.uniform(rng, (2, 3, 32, 32), minval=-1, maxval=1)
        b = a + 0.8  # pushes many values past +1
        clamped = float(ssim(jnp.clip(a, -1, 1), jnp.clip(b, -1, 1), data_range=2.0))
        tupled = float(ssim(a, b, data_range=(-1.0, 1.0)))
        np.testing.assert_allclose(tupled, clamped, rtol=1e-6)
        # and it differs from the unclamped scalar-range result
        assert abs(tupled - float(ssim(a, b, data_range=2.0))) > 1e-5
