"""Adaptive dopri5 + likelihood estimator tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ldmae_tpu.transport import create_transport
from ldmae_tpu.transport.adaptive import dopri5, make_likelihood_fn, prior_logp


class TestDopri5:
    def test_exponential_decay(self):
        f = lambda x, t: -x
        out = dopri5(f, jnp.ones(()), 0.0, 1.0, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(float(out), np.exp(-1), rtol=1e-5)

    def test_stiffish_oscillator(self):
        # x'' = -w² x as a 2d system; energy conserved
        w = 8.0

        def f(s, t):
            x, v = s[0], s[1]
            return jnp.stack([v, -(w**2) * x])

        out = dopri5(f, jnp.array([1.0, 0.0]), 0.0, 1.0, rtol=1e-6, atol=1e-8, max_steps=5000)
        expected = np.array([np.cos(w), -w * np.sin(w)])
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-3, atol=1e-3)

    def test_jittable(self):
        f = lambda x, t: -x * (1 + t)
        fn = jax.jit(lambda x: dopri5(f, x, 0.0, 1.0))
        out = fn(jnp.ones((4,)))
        np.testing.assert_allclose(np.asarray(out), np.exp(-1.5), rtol=3e-3)


class TestLikelihood:
    def test_prior_logp(self):
        z = jnp.zeros((2, 3, 4))
        lp = prior_logp(z)
        np.testing.assert_allclose(
            np.asarray(lp), -12 / 2 * np.log(2 * np.pi), rtol=1e-6
        )

    def test_standard_normal_likelihood(self):
        """For data = prior (model velocity ≡ exact), with the zero-velocity...
        simplest check: a *zero* velocity field means x1-transport is the
        identity; the likelihood of a point should then equal prior_logp."""
        transport = create_transport("Linear", "velocity")
        fn = make_likelihood_fn(transport, num_steps=20)

        def zero_model(x, t, **kw):
            return jnp.zeros_like(x)

        x = jax.random.normal(jax.random.key(0), (8, 4))
        logp, z = fn(jax.random.key(1), x, zero_model)
        np.testing.assert_allclose(np.asarray(z), np.asarray(x), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(logp), np.asarray(prior_logp(x)), rtol=1e-4
        )

    def test_scaling_field_changes_volume(self):
        """Velocity v = c·x over t∈[0,1] scales x by e^c; the log-det term
        must appear in the likelihood: logp(x) = prior(x·e^{-c}) - c·dim."""
        c = 0.5
        transport = create_transport("Linear", "velocity")
        fn = make_likelihood_fn(transport, num_steps=400)

        def scale_model(x, t, **kw):
            return c * x

        dim = 4
        x = jax.random.normal(jax.random.key(0), (16, dim)) * 0.3
        logp, z = fn(jax.random.key(1), x, scale_model)
        expected_z = np.asarray(x) * np.exp(-c)
        np.testing.assert_allclose(np.asarray(z), expected_z, rtol=2e-2, atol=1e-3)
        expected_logp = np.asarray(prior_logp(jnp.asarray(expected_z))) - c * dim
        np.testing.assert_allclose(np.asarray(logp), expected_logp, rtol=2e-2)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


class TestDopri5Reverse:
    def test_reverse_interval_integrates(self):
        """dopri5 with a decreasing interval (sample_ode(reverse=True) path)
        must actually integrate — it used to return x0 untouched because the
        while-loop condition was False at entry."""
        from ldmae_tpu.transport.adaptive import dopri5

        x0 = jnp.ones((4,))
        # dx/dt = x integrated from t=1 down to t=0: x(0) = x(1)·e^{-1}
        out = dopri5(lambda x, t: x, x0, 1.0, 0.0, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(out), np.e**-1, rtol=1e-4)

    def test_forward_still_exact(self):
        from ldmae_tpu.transport.adaptive import dopri5

        out = dopri5(lambda x, t: x, jnp.ones((4,)), 0.0, 1.0, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(out), np.e, rtol=1e-4)


class TestLikelihoodMethod:
    def test_rk4_more_accurate_than_euler(self):
        """make_likelihood_fn's method parameter must be honored: on a coarse
        grid RK4 must beat Euler against a fine-grid reference."""
        from ldmae_tpu.transport import create_transport
        from ldmae_tpu.transport.adaptive import make_likelihood_fn

        transport = create_transport("Linear", "velocity")

        def model_fn(x, t, **kw):
            return -0.5 * x  # simple linear field

        x = jax.random.normal(jax.random.key(0), (4, 2, 2, 2))
        key = jax.random.key(1)
        ref = make_likelihood_fn(transport, num_steps=400, method="rk4")(key, x, model_fn)[0]
        rk4 = make_likelihood_fn(transport, num_steps=12, method="rk4")(key, x, model_fn)[0]
        eul = make_likelihood_fn(transport, num_steps=12, method="euler")(key, x, model_fn)[0]
        err_rk4 = float(jnp.abs(rk4 - ref).mean())
        err_eul = float(jnp.abs(eul - ref).mean())
        assert err_rk4 < err_eul, (err_rk4, err_eul)
