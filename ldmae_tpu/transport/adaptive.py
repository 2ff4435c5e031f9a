"""Adaptive Dormand–Prince (dopri5) ODE solver + likelihood estimation.

Covers the reference's torchdiffeq-backed paths that the fixed-step scan
samplers don't: ``sample_ode(sampling_method="dopri5")`` (the reference
*default*, integrators.py:118-125 — every shipped config overrides it to
euler) and ``Sampler.sample_ode_likelihood`` (transport.py:445-502,
Hutchinson trace estimator with Rademacher probes — here computed with
``jax.jvp`` instead of autograd-on-sum).

The adaptive loop is a ``lax.while_loop`` with a static max step count, so
it stays jit-compatible (one compiled program; data-dependent step count).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

# Dormand-Prince RK45 Butcher tableau
_C = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_B5 = jnp.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_B4 = jnp.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
)


class _State(NamedTuple):
    t: jnp.ndarray
    x: jnp.ndarray
    h: jnp.ndarray
    steps: jnp.ndarray
    rejected: jnp.ndarray
    k1: jnp.ndarray  # FSAL: drift at (x, t), reused as the next step's k1


def dopri5(
    drift: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    t0: float,
    t1: float,
    rtol: float = 1e-3,
    atol: float = 1e-6,
    max_steps: int = 1000,
    initial_step: float = 0.01,
) -> jnp.ndarray:
    """Integrate dx/dt = drift(x, t) from t0 to t1 adaptively; returns x(t1).

    Error norm and PI step control follow the standard RK45 recipe
    (torchdiffeq's defaults: mixed rtol/atol RMS norm, 0.9 safety, order-5
    exponent, clip factor [0.2, 10]).

    A decreasing interval (t1 < t0, e.g. sample_ode(reverse=True)) is
    integrated by the time reflection τ = -t: dx/dτ = -drift(x, -τ)."""
    if float(t1) < float(t0):
        return dopri5(
            lambda x, tau: -drift(x, -tau), x0, -float(t0), -float(t1),
            rtol=rtol, atol=atol, max_steps=max_steps, initial_step=initial_step,
        )
    t0 = jnp.asarray(t0, jnp.float32)
    t1 = jnp.asarray(t1, jnp.float32)

    def step_once(t, x, h, k1):
        ks = [k1]
        for i in range(1, 7):
            xi = x
            for j, aij in enumerate(_A[i]):
                xi = xi + h * aij * ks[j]
            ks.append(drift(xi, t + h * _C[i]))
        k = jnp.stack(ks)
        x5 = x + h * jnp.tensordot(_B5, k, axes=1)
        x4 = x + h * jnp.tensordot(_B4, k, axes=1)
        err = x5 - x4
        scale = atol + rtol * jnp.maximum(jnp.abs(x), jnp.abs(x5))
        err_norm = jnp.sqrt(jnp.mean((err / scale) ** 2))
        # FSAL: _B5[6]=0 and _C[6]=1.0, so k7 evaluated at (x5, t+h) is the
        # k1 of the next accepted step — carrying it saves 1 of 7 drift
        # evaluations per step (each one a full model forward)
        return x5, err_norm, ks[6]

    def cond(s: _State):
        return (s.t < t1) & (s.steps < max_steps)

    def body(s: _State):
        h = jnp.minimum(s.h, t1 - s.t)
        x5, err_norm, k_last = step_once(s.t, s.x, h, s.k1)
        accept = err_norm <= 1.0
        factor = jnp.clip(0.9 * (1.0 / jnp.maximum(err_norm, 1e-10)) ** 0.2, 0.2, 10.0)
        new_h = jnp.clip(h * factor, 1e-6, 1.0)
        return _State(
            t=jnp.where(accept, s.t + h, s.t),
            x=jnp.where(accept, x5, s.x),
            h=new_h,
            steps=s.steps + 1,
            rejected=s.rejected + jnp.where(accept, 0, 1),
            k1=jnp.where(accept, k_last, s.k1),
        )

    init = _State(
        t=t0,
        x=x0,
        h=jnp.asarray(initial_step, jnp.float32),
        steps=jnp.zeros((), jnp.int32),
        rejected=jnp.zeros((), jnp.int32),
        k1=drift(x0, t0),
    )
    final = jax.lax.while_loop(cond, body, init)
    return final.x


def prior_logp(z: jnp.ndarray) -> jnp.ndarray:
    """Standard-normal log density per sample (transport.py:73-81)."""
    n = jnp.prod(jnp.asarray(z.shape[1:]))
    flat = z.reshape(z.shape[0], -1)
    return -n / 2.0 * jnp.log(2 * jnp.pi) - jnp.sum(flat**2, axis=1) / 2.0


def make_likelihood_fn(
    transport,
    num_steps: int = 50,
    method: str = "rk4",
):
    """Exact-in-expectation log-likelihood via the probability-flow ODE.

    Equivalent of Sampler.sample_ode_likelihood (transport.py:445-502):
    integrates (x, logp) backwards (data → noise) with the Hutchinson
    divergence estimator; the reference's autograd-of-sum trick becomes a
    single ``jax.jvp`` per step (same estimator, fully in-graph). Returns
    fn(key, x, model_fn, **kwargs) -> (logp, z)."""
    from .samplers import make_time_grid

    drift = transport.get_drift()
    t0, t1 = transport.check_interval(
        transport.train_eps, transport.sample_eps, sde=False, eval=True,
        reverse=False, last_step_size=0.0,
    )
    grid = jnp.asarray(make_time_grid(t0, t1, num_steps))

    def fn(key, x, model_fn, **kwargs):
        eps = (
            jax.random.randint(key, x.shape, 0, 2).astype(x.dtype) * 2 - 1
        )  # Rademacher (transport.py:465)

        def ode_func(state, t_scalar):
            xc, _ = state
            t_rev = jnp.full((xc.shape[0],), 1 - t_scalar, dtype=xc.dtype)

            def f(xx):
                return drift(xx, t_rev, model_fn, **kwargs)

            fx, jvp_out = jax.jvp(f, (xc,), (eps,))
            div = jnp.sum(
                (jvp_out * eps).reshape(xc.shape[0], -1), axis=1
            )
            return -fx, div

        # fixed-grid integration of the augmented system
        ts = grid[:-1]
        dts = grid[1:] - grid[:-1]

        if method == "rk4":
            def step(carry, tdt):
                (xc, lp) = carry
                t, dt = tdt
                k1x, k1l = ode_func((xc, lp), t)
                k2x, k2l = ode_func((xc + 0.5 * dt * k1x, lp), t + 0.5 * dt)
                k3x, k3l = ode_func((xc + 0.5 * dt * k2x, lp), t + 0.5 * dt)
                k4x, k4l = ode_func((xc + dt * k3x, lp), t + dt)
                xn = xc + dt / 6.0 * (k1x + 2 * k2x + 2 * k3x + k4x)
                ln = lp + dt / 6.0 * (k1l + 2 * k2l + 2 * k3l + k4l)
                return (xn, ln), None
        elif method == "euler":
            def step(carry, tdt):
                (xc, lp) = carry
                t, dt = tdt
                dx, dlp = ode_func((xc, lp), t)
                return (xc + dt * dx, lp + dt * dlp), None
        else:
            raise NotImplementedError(f"likelihood method {method!r} (rk4/euler)")

        (z, delta_logp), _ = jax.lax.scan(
            step, (x, jnp.zeros((x.shape[0],), x.dtype)), (ts, dts)
        )
        logp = prior_logp(z) - delta_logp
        return logp, z

    return fn
