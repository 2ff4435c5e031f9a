"""Flow-matching transport: training losses and drift/score functions.

jnp equivalent of /root/reference/LDMAE/transport/transport.py with the
host-side scipy logit-normal sampling (transport.py:113-123) replaced by
in-graph ``sigmoid(normal(key))`` — identical distribution, no host↔device
hop — and the rejection-sampled partial range replaced by exact inverse-CDF
truncation (same law, fixed shapes under jit).
"""

from __future__ import annotations

import enum
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.scipy.special import ndtri
from jax.scipy.stats import norm as jnorm

from . import paths
from .paths import expand_t_like_x


class ModelType(enum.Enum):
    NOISE = enum.auto()
    SCORE = enum.auto()
    VELOCITY = enum.auto()


class PathType(enum.Enum):
    LINEAR = enum.auto()
    GVP = enum.auto()
    VP = enum.auto()


class WeightType(enum.Enum):
    NONE = enum.auto()
    VELOCITY = enum.auto()
    LIKELIHOOD = enum.auto()


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


# model_fn signature: (x, t, **kwargs) -> prediction
ModelFn = Callable[..., jnp.ndarray]


class Transport:
    def __init__(
        self,
        *,
        model_type: ModelType,
        path_type: PathType,
        loss_type: WeightType,
        train_eps: float,
        sample_eps: float,
        use_cosine_loss: bool = False,
        use_lognorm: bool = False,
        partitial_train: Optional[Sequence[float]] = None,
        partial_ratio: float = 1.0,
        shift_lg: bool = False,
    ):
        path_options = {
            PathType.LINEAR: paths.ICPlan,
            PathType.GVP: paths.GVPCPlan,
            PathType.VP: paths.VPCPlan,
        }
        self.loss_type = loss_type
        self.model_type = model_type
        self.path_sampler = path_options[path_type]()
        self.train_eps = train_eps
        self.sample_eps = sample_eps
        self.use_cosine_loss = bool(use_cosine_loss)
        self.use_lognorm = bool(use_lognorm)
        self.partitial_train = partitial_train
        self.partial_ratio = partial_ratio
        self.shift_lg = shift_lg

    # -- interval ----------------------------------------------------------
    def check_interval(
        self,
        train_eps: float,
        sample_eps: float,
        *,
        diffusion_form: str = "SBDM",
        sde: bool = False,
        reverse: bool = False,
        eval: bool = False,
        last_step_size: float = 0.0,
    ) -> Tuple[float, float]:
        t0, t1 = 0.0, 1.0
        eps = train_eps if not eval else sample_eps
        if isinstance(self.path_sampler, paths.VPCPlan):
            t1 = 1 - eps if (not sde or last_step_size == 0) else 1 - last_step_size
        elif isinstance(self.path_sampler, (paths.ICPlan, paths.GVPCPlan)) and (
            self.model_type != ModelType.VELOCITY or sde
        ):
            t0 = (
                eps
                if (diffusion_form == "SBDM" and sde)
                or self.model_type != ModelType.VELOCITY
                else 0
            )
            t1 = 1 - eps if (not sde or last_step_size == 0) else 1 - last_step_size
        if reverse:
            t0, t1 = 1 - t0, 1 - t1
        return t0, t1

    # -- t sampling (in-graph) ---------------------------------------------
    def _sample_logit_normal(self, key, mu, sigma, shape):
        return jax.nn.sigmoid(mu + sigma * jax.random.normal(key, shape))

    def _sample_logit_normal_in_range(self, key, mu, sigma, shape, lo, hi):
        """Exact truncated logit-normal via inverse-CDF (replaces the
        reference's host-side rejection loop, transport.py:125-134)."""
        def cdf(x):
            return jnorm.cdf((jnp.log(x) - jnp.log1p(-x) - mu) / sigma)

        u = jax.random.uniform(key, shape, minval=cdf(jnp.asarray(lo)), maxval=cdf(jnp.asarray(hi)))
        return jax.nn.sigmoid(mu + sigma * ndtri(u))

    def sample(
        self,
        key: jax.Array,
        x1: jnp.ndarray,
        sp_timesteps: Optional[Sequence[float]] = None,
        shifted_mu: float = 0.0,
        x0: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Sample (t, x0, x1). Matches transport.py:136-166 semantics.

        x0: optional noise override (deterministic injection for parity
        tests — the torch side shares the same array)."""
        k_noise, k_t, k_coin = jax.random.split(key, 3)
        if x0 is None:
            x0 = jax.random.normal(k_noise, x1.shape, dtype=x1.dtype)
        t0, t1 = self.check_interval(self.train_eps, self.sample_eps)
        b = x1.shape[0]

        if sp_timesteps is not None:
            t = jax.random.uniform(
                k_t, (b,), minval=sp_timesteps[0], maxval=sp_timesteps[1]
            )
            return t, x0, x1

        if not self.use_lognorm:
            t_main = jax.random.uniform(k_t, (b,)) * (t1 - t0) + t0
            if self.partitial_train is not None:
                lo, hi = self.partitial_train
                t_part = jax.random.uniform(k_t, (b,)) * (hi - lo) + lo
                coin = jax.random.uniform(k_coin, ()) < self.partial_ratio
                t = jnp.where(coin, t_part, t_main)
            else:
                t = t_main
        else:
            if not self.shift_lg:
                t_main = self._sample_logit_normal(k_t, 0.0, 1.0, (b,)) * (t1 - t0) + t0
                if self.partitial_train is not None:
                    lo, hi = self.partitial_train
                    t_part = self._sample_logit_normal_in_range(
                        k_t, 0.0, 1.0, (b,), lo, hi
                    )
                    coin = jax.random.uniform(k_coin, ()) < self.partial_ratio
                    t = jnp.where(coin, t_part, t_main)
                else:
                    t = t_main
            else:
                assert self.partitial_train is None, (
                    "Shifted lognormal distribution is not compatible with "
                    "partial training"
                )
                t = (
                    self._sample_logit_normal(k_t, shifted_mu, 1.0, (b,)) * (t1 - t0)
                    + t0
                )
        return t.astype(x1.dtype), x0, x1

    # -- losses --------------------------------------------------------------
    def training_losses(
        self,
        model_fn: ModelFn,
        key: jax.Array,
        x1: jnp.ndarray,
        model_kwargs: Optional[Dict[str, Any]] = None,
        sp_timesteps: Optional[Sequence[float]] = None,
        shifted_mu: float = 0.0,
        x0: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Velocity / noise / score flow-matching loss (transport.py:169-215)."""
        model_kwargs = model_kwargs or {}
        t, x0, x1 = self.sample(key, x1, sp_timesteps, shifted_mu, x0=x0)
        t, xt, ut = self.path_sampler.plan(t, x0, x1)
        model_output = model_fn(xt, t, **model_kwargs)
        assert model_output.shape == xt.shape

        terms: Dict[str, jnp.ndarray] = {"pred": model_output}
        out_f32 = model_output.astype(jnp.float32)
        ut_f32 = ut.astype(jnp.float32)
        if self.model_type == ModelType.VELOCITY:
            terms["loss"] = mean_flat((out_f32 - ut_f32) ** 2)
            if self.use_cosine_loss:
                # cosine similarity along dim=1 (channels), like torch's
                # cosine_similarity(out, ut, dim=1)
                # safe norms: sqrt(max(sumsq, tiny)) so the gradient at an
                # all-zero vector is 0 instead of NaN (the DiT final layer
                # is zero-init, so step-1 output is exactly 0; torch's
                # cosine_similarity clamp has the same non-differentiability
                # but the reference ships use_cosine_loss: false). Forward
                # is unchanged: sqrt(tiny)=1e-15 is far below the 1e-8 clamp.
                num = jnp.sum(out_f32 * ut_f32, axis=1)
                norm_out = jnp.sqrt(
                    jnp.maximum(jnp.sum(out_f32 * out_f32, axis=1), 1e-30)
                )
                norm_ut = jnp.sqrt(
                    jnp.maximum(jnp.sum(ut_f32 * ut_f32, axis=1), 1e-30)
                )
                cos = num / jnp.maximum(norm_out * norm_ut, 1e-8)
                terms["cos_loss"] = mean_flat(1 - cos)
        else:
            _, drift_var = self.path_sampler.compute_drift(xt, t)
            sigma_t, _ = self.path_sampler.compute_sigma_t(expand_t_like_x(t, xt))
            if self.loss_type == WeightType.VELOCITY:
                weight = (drift_var / sigma_t) ** 2
            elif self.loss_type == WeightType.LIKELIHOOD:
                weight = drift_var / (sigma_t**2)
            else:
                weight = 1
            if self.model_type == ModelType.NOISE:
                terms["loss"] = mean_flat(weight * (out_f32 - x0) ** 2)
            else:
                terms["loss"] = mean_flat(weight * (out_f32 * sigma_t + x0) ** 2)
        return terms

    # -- drift / score -------------------------------------------------------
    def get_drift(self) -> ModelFn:
        def score_ode(x, t, model, **kwargs):
            drift_mean, drift_var = self.path_sampler.compute_drift(x, t)
            return -drift_mean + drift_var * model(x, t, **kwargs)

        def noise_ode(x, t, model, **kwargs):
            drift_mean, drift_var = self.path_sampler.compute_drift(x, t)
            sigma_t, _ = self.path_sampler.compute_sigma_t(expand_t_like_x(t, x))
            score = model(x, t, **kwargs) / -sigma_t
            return -drift_mean + drift_var * score

        def velocity_ode(x, t, model, **kwargs):
            return model(x, t, **kwargs)

        if self.model_type == ModelType.NOISE:
            return noise_ode
        if self.model_type == ModelType.SCORE:
            return score_ode
        return velocity_ode

    def get_score(self) -> ModelFn:
        if self.model_type == ModelType.NOISE:
            return lambda x, t, model, **kw: model(x, t, **kw) / -self.path_sampler.compute_sigma_t(expand_t_like_x(t, x))[0]
        if self.model_type == ModelType.SCORE:
            return lambda x, t, model, **kw: model(x, t, **kw)
        return lambda x, t, model, **kw: self.path_sampler.get_score_from_velocity(
            model(x, t, **kw), x, t
        )


def create_transport(
    path_type: str = "Linear",
    prediction: str = "velocity",
    loss_weight: Optional[str] = None,
    train_eps: Optional[float] = None,
    sample_eps: Optional[float] = None,
    use_cosine_loss: Optional[bool] = None,
    use_lognorm: Optional[bool] = None,
    partitial_train: Optional[Sequence[float]] = None,
    partial_ratio: float = 1.0,
    shift_lg: bool = False,
) -> Transport:
    """Factory matching transport/__init__.py:3-73 (including its eps-default
    quirk: sample_eps inherits the *train_eps is None* test)."""
    if prediction == "noise":
        model_type = ModelType.NOISE
    elif prediction == "score":
        model_type = ModelType.SCORE
    else:
        model_type = ModelType.VELOCITY

    if loss_weight == "velocity":
        loss_type = WeightType.VELOCITY
    elif loss_weight == "likelihood":
        loss_type = WeightType.LIKELIHOOD
    else:
        loss_type = WeightType.NONE

    path_choice = {"Linear": PathType.LINEAR, "GVP": PathType.GVP, "VP": PathType.VP}
    ptype = path_choice[path_type]

    if ptype == PathType.VP:
        train_eps = 1e-5 if train_eps is None else train_eps
        sample_eps = 1e-3 if train_eps is None else sample_eps
    elif ptype in (PathType.GVP, PathType.LINEAR) and model_type != ModelType.VELOCITY:
        train_eps = 1e-3 if train_eps is None else train_eps
        sample_eps = 1e-3 if train_eps is None else sample_eps
    else:
        train_eps = 0
        sample_eps = 0

    return Transport(
        model_type=model_type,
        path_type=ptype,
        loss_type=loss_type,
        train_eps=train_eps,
        sample_eps=sample_eps,
        use_cosine_loss=bool(use_cosine_loss),
        use_lognorm=bool(use_lognorm),
        partitial_train=partitial_train,
        partial_ratio=partial_ratio,
        shift_lg=shift_lg,
    )
