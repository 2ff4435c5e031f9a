"""Transport math tests: path algebra, loss semantics, sampler convergence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import stats

from ldmae_tpu.transport import (
    create_transport,
    ICPlan,
    VPCPlan,
    GVPCPlan,
    Sampler,
    make_time_grid,
    ode_sample,
    forward_with_cfg,
)


class TestPaths:
    def test_ic_plan(self):
        plan = ICPlan()
        t = jnp.array([0.3, 0.7])
        x0 = jnp.ones((2, 4))
        x1 = jnp.full((2, 4), 2.0)
        _, xt, ut = plan.plan(t, x0, x1)
        np.testing.assert_allclose(
            np.asarray(xt),
            np.array([[0.3 * 2 + 0.7] * 4, [0.7 * 2 + 0.3] * 4]),
            rtol=1e-6,
        )
        np.testing.assert_allclose(np.asarray(ut), np.ones((2, 4)), rtol=1e-6)

    def test_score_velocity_roundtrip(self):
        plan = ICPlan()
        key = jax.random.key(0)
        x = jax.random.normal(key, (3, 8))
        t = jnp.array([0.3, 0.5, 0.8])
        v = jax.random.normal(jax.random.key(1), (3, 8))
        score = plan.get_score_from_velocity(v, x, t)
        v_back = plan.get_velocity_from_score(score, x, t)
        np.testing.assert_allclose(np.asarray(v_back), np.asarray(v), rtol=1e-4, atol=1e-5)

    def test_gvp_plan_boundaries(self):
        plan = GVPCPlan()
        a0, _ = plan.compute_alpha_t(jnp.array(0.0))
        a1, _ = plan.compute_alpha_t(jnp.array(1.0))
        s0, _ = plan.compute_sigma_t(jnp.array(0.0))
        s1, _ = plan.compute_sigma_t(jnp.array(1.0))
        assert abs(float(a0)) < 1e-6 and abs(float(a1) - 1) < 1e-6
        assert abs(float(s0) - 1) < 1e-6 and abs(float(s1)) < 1e-6

    def test_vp_plan_finite(self):
        plan = VPCPlan()
        t = jnp.linspace(0.01, 0.99, 10)
        a, da = plan.compute_alpha_t(t)
        s, ds = plan.compute_sigma_t(t)
        assert np.all(np.isfinite(np.asarray(a)))
        assert np.all(np.isfinite(np.asarray(s)))


class TestTransport:
    def test_eps_defaults(self):
        t = create_transport("Linear", "velocity")
        assert t.train_eps == 0 and t.sample_eps == 0
        t = create_transport("VP", "velocity")
        assert t.train_eps == 1e-5
        t = create_transport("Linear", "noise")
        assert t.train_eps == 1e-3

    def test_lognorm_t_distribution(self):
        """In-graph logit-normal must match scipy's distribution."""
        t = create_transport("Linear", "velocity", use_lognorm=True)
        x1 = jnp.zeros((20000, 2))
        tt, x0, _ = t.sample(jax.random.key(0), x1)
        samples = np.asarray(tt)
        assert samples.min() > 0 and samples.max() < 1
        # KS test against logit-normal(0,1)
        logit = np.log(samples) - np.log1p(-samples)
        _, p = stats.kstest(logit, "norm")
        assert p > 0.01, f"logit(t) not N(0,1): p={p}"

    def test_partial_range_truncation(self):
        t = create_transport(
            "Linear", "velocity", use_lognorm=True, partitial_train=[0.2, 0.6], partial_ratio=1.0
        )
        x1 = jnp.zeros((5000, 2))
        tt, _, _ = t.sample(jax.random.key(1), x1)
        s = np.asarray(tt)
        assert s.min() >= 0.2 - 1e-5 and s.max() <= 0.6 + 1e-5
        # shape within range should still follow (truncated) logit-normal
        logit = np.log(s) - np.log1p(-s)
        lo = np.log(0.2) - np.log1p(-0.2)
        hi = np.log(0.6) - np.log1p(-0.6)
        cdf_lo, cdf_hi = stats.norm.cdf(lo), stats.norm.cdf(hi)
        u = (stats.norm.cdf(logit) - cdf_lo) / (cdf_hi - cdf_lo)
        _, p = stats.kstest(u, "uniform")
        assert p > 0.01

    def test_velocity_loss_value(self):
        t = create_transport("Linear", "velocity", use_lognorm=False)

        # model that predicts exactly ut = x1 - x0 can't be built without
        # knowing x0; instead use a zero model and check loss = E[ut²]
        def model_fn(xt, tt):
            return jnp.zeros_like(xt)

        x1 = jax.random.normal(jax.random.key(2), (512, 16))
        terms = t.training_losses(model_fn, jax.random.key(3), x1)
        # ut = x1 - x0 with x0,x1 ~ N(0,1): E[ut²] = 2
        assert abs(float(terms["loss"].mean()) - 2.0) < 0.15

    def test_sp_timesteps_override(self):
        t = create_transport("Linear", "velocity", use_lognorm=True)
        x1 = jnp.zeros((1000, 2))
        tt, _, _ = t.sample(jax.random.key(0), x1, sp_timesteps=(0.0, 1.0))
        s = np.asarray(tt)
        _, p = stats.kstest(s, "uniform")
        assert p > 0.01  # uniform, not logit-normal

    def test_cosine_loss(self):
        t = create_transport("Linear", "velocity", use_cosine_loss=True)

        def model_fn(xt, tt):
            return jnp.ones_like(xt)

        x1 = jax.random.normal(jax.random.key(4), (64, 4, 4, 4))
        terms = t.training_losses(model_fn, jax.random.key(5), x1)
        assert "cos_loss" in terms
        assert np.all(np.isfinite(np.asarray(terms["cos_loss"])))

    def test_cosine_loss_grad_finite_at_zero_output(self):
        """The DiT final layer is zero-init, so step-1 model output is exactly
        0. cos_loss's gradient must be finite there (regression: the norm's
        gradient at a zero vector was NaN, poisoning the first update)."""
        t = create_transport("Linear", "velocity", use_cosine_loss=True)
        x1 = jax.random.normal(jax.random.key(4), (8, 4, 4, 4))

        def total_loss(w):
            def model_fn(xt, tt):
                return w * xt  # w=0 -> all-zero output, like zero-init

            terms = t.training_losses(model_fn, jax.random.key(5), x1)
            return jnp.mean(terms["loss"]) + jnp.mean(terms["cos_loss"])

        g = jax.grad(total_loss)(0.0)
        assert np.isfinite(float(g))
        # and the cos value itself is the torch-clamp convention: cos(0,ut)=0
        def model_fn(xt, tt):
            return jnp.zeros_like(xt)

        terms = t.training_losses(model_fn, jax.random.key(5), x1)
        np.testing.assert_allclose(np.asarray(terms["cos_loss"]), 1.0, atol=1e-6)


class TestSamplers:
    def test_time_grid_shift(self):
        g = make_time_grid(0, 1, 5, timestep_shift=0.3)
        s = 0.3
        raw = np.linspace(0, 1, 5)
        expected = s * raw / (1 + (s - 1) * raw)
        np.testing.assert_allclose(g, expected.astype(np.float32), rtol=1e-6)

    def test_euler_linear_ode_exact(self):
        # dx/dt = const: euler is exact
        c = jnp.full((2, 3), 1.5)
        final = ode_sample(lambda x, t: c, jnp.zeros((2, 3)), jnp.asarray(make_time_grid(0, 1, 11)))
        np.testing.assert_allclose(np.asarray(final), 1.5, rtol=1e-5)

    def test_euler_convergence_order(self):
        # dx/dt = -x from x0=1 -> e^{-1}
        def drift(x, t):
            return -x

        errs = []
        for n in (11, 101, 1001):
            f = ode_sample(drift, jnp.ones(()), jnp.asarray(make_time_grid(0, 1, n)))
            errs.append(abs(float(f) - np.exp(-1)))
        assert errs[1] < errs[0] / 5
        assert errs[2] < errs[1] / 5

    def test_heun_more_accurate_than_euler(self):
        def drift(x, t):
            return -x

        grid = jnp.asarray(make_time_grid(0, 1, 21))
        e = abs(float(ode_sample(drift, jnp.ones(()), grid, "euler")) - np.exp(-1))
        h = abs(float(ode_sample(drift, jnp.ones(()), grid, "heun")) - np.exp(-1))
        assert h < e / 10

    def test_flow_matching_roundtrip(self):
        """Transport a known Gaussian: data = N(mu, s). The exact velocity
        field for the linear path transports noise to data; sampling with it
        should land on the data distribution."""
        mu, s = 2.0, 0.5
        transport = create_transport("Linear", "velocity")
        sampler = Sampler(transport)

        def exact_velocity(x, t, **kw):
            # For x1~N(mu,s²), x0~N(0,1): xt = t x1 + (1-t) x0.
            # E[ut | xt] has closed form: posterior over (x0,x1) given xt.
            tt = t.reshape(-1, *([1] * (x.ndim - 1)))
            var_t = tt**2 * s**2 + (1 - tt) ** 2
            # E[x1|xt], E[x0|xt] by joint-Gaussian conditioning
            e_x1 = mu + tt * s**2 * (x - tt * mu) / var_t
            e_x0 = (1 - tt) * (x - tt * mu) / var_t
            return e_x1 - e_x0

        fn = sampler.sample_ode(sampling_method="euler", num_steps=100)
        z = jax.random.normal(jax.random.key(0), (20000,))
        out = np.asarray(fn(z, exact_velocity))
        assert abs(out.mean() - mu) < 0.02
        assert abs(out.std() - s) < 0.02

    def test_sde_sampler_runs(self):
        # velocity+Linear would hit the 1/t drift singularity at t0=0 (the
        # reference has the same property; its SDE path is only used with
        # eps>0 model types), so exercise the SDE with a noise model.
        # explicit eps: create_transport inherits the reference's quirk of
        # leaving sample_eps None when train_eps wasn't passed (its line 52
        # rebinds train_eps before testing it)
        transport = create_transport("Linear", "noise", train_eps=1e-3, sample_eps=1e-3)
        sampler = Sampler(transport)

        def noise_model(x, t, **kw):
            return jnp.zeros_like(x)

        fn = sampler.sample_sde(num_steps=8, last_step="Mean")
        out = fn(jax.random.key(0), jnp.zeros((4, 3)), noise_model)
        assert np.all(np.isfinite(np.asarray(out)))


class TestCFG:
    def test_forward_with_cfg_semantics(self):
        b, c, h, w = 4, 8, 2, 2  # doubled batch of 2

        def model_fn(x, t, y):
            # output = y broadcast (so cond/uncond differ)
            return jnp.broadcast_to(
                y.astype(jnp.float32).reshape(-1, 1, 1, 1), (x.shape[0], c, h, w)
            )

        x = jnp.zeros((b, c, h, w))
        t = jnp.full((b,), 0.5)
        y = jnp.array([1, 2, 10, 10])  # cond labels then null=10
        out = forward_with_cfg(model_fn, x, t, y, cfg_scale=3.0, cfg_channels=3)
        o = np.asarray(out)
        # first 3 channels guided: uncond + 3*(cond-uncond) = 10 + 3*(1-10)
        np.testing.assert_allclose(o[0, :3], 10 + 3 * (1 - 10), rtol=1e-6)
        np.testing.assert_allclose(o[1, :3], 10 + 3 * (2 - 10), rtol=1e-6)
        # remaining channels: raw cond output for first half
        np.testing.assert_allclose(o[0, 3:], 1.0, rtol=1e-6)
        # doubled halves identical in guided channels
        np.testing.assert_allclose(o[2, :3], o[0, :3], rtol=1e-6)

    def test_cfg_interval(self):
        def model_fn(x, t, y):
            return jnp.broadcast_to(
                y.astype(jnp.float32).reshape(-1, 1, 1, 1), (x.shape[0], 4, 2, 2)
            )

        x = jnp.zeros((2, 4, 2, 2))
        y = jnp.array([1, 10])
        # t below start -> cond only
        out = forward_with_cfg(
            model_fn, x, jnp.full((2,), 0.05), y, 3.0,
            cfg_interval=True, cfg_interval_start=0.10, cfg_channels=3,
        )
        np.testing.assert_allclose(np.asarray(out)[0, :3], 1.0, rtol=1e-6)
        # t above start -> guided
        out = forward_with_cfg(
            model_fn, x, jnp.full((2,), 0.5), y, 3.0,
            cfg_interval=True, cfg_interval_start=0.10, cfg_channels=3,
        )
        np.testing.assert_allclose(np.asarray(out)[0, :3], 10 + 3 * (1 - 10), rtol=1e-6)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
