"""End-to-end class-conditional sampling pipeline.

TPU-native equivalent of /root/reference/LDMAE/inference.py's do_sample:
the full 250-step Euler ODE with CFG batch-doubling, the latent
denormalisation ``(samples · latent_std)/latent_multiplier + latent_mean``
(inference.py:291), and the VMAE decode to uint8 images — compiled into one
XLA program. No host round-trips inside the loop; PNG writing is the only
host work, overlapped with the next batch's compute.

Parameters are passed as function arguments (NOT closed over) so they enter
the jitted program as inputs rather than baked constants.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..models import vmae as vmae_mod
from ..models.lightningdit import DiTConsts, DiTSpec, dit_forward
from ..models.vmae import VMAEConsts, VMAESpec
from ..transport.samplers import Sampler, forward_with_cfg
from ..transport.transport import Transport


def make_sample_fn(
    spec: DiTSpec,
    consts: DiTConsts,
    transport: Transport,
    *,
    num_steps: int = 250,
    sampling_method: str = "euler",
    timestep_shift: float = 0.0,
    cfg_scale: float = 1.0,
    cfg_interval: bool = True,
    cfg_interval_start: float = 0.10,
    cfg_channels: int = 3,
    truncation: Optional[float] = None,
    mode: str = "ODE",
    sde_last_step: Optional[str] = "Mean",
    latent_multiplier: float = 1.0,
    vae_spec: Optional[VMAESpec] = None,
    vae_consts: Optional[VMAEConsts] = None,
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "xla",
    rope_layout: str = "interleaved",
    adaln_impl: str = "xla",
    quant_mode: Optional[str] = None,
    mlp_impl: str = "xla",
    cfg_phase_split: bool = True,
    vae_decode_images_fn: Optional[Callable] = None,
) -> Callable[..., jnp.ndarray]:
    """Build sample_fn(bundle, key, y) -> uint8 images (B, H, W, 3) when a
    VAE is configured, else denormalised latents (B, C, h, w).

    bundle: {"dit": dit_params, "vae": vmae_params or None,
             "latent_mean": (1,C,1,1) or None, "latent_std": ... or None}
    y: (B,) int labels; CFG doubles the batch internally when cfg_scale > 1
    with null label = num_classes (inference.py:277-282).
    """
    sampler = Sampler(transport)
    use_cfg = cfg_scale > 1.0
    ode_fn = sde_fn = None
    phase1_fn = phase2_fn = None
    if mode.upper() == "SDE":
        sde_fn = sampler.sample_sde(
            sampling_method=sampling_method.capitalize(),
            num_steps=num_steps,
            last_step=sde_last_step,
        )
    else:
        ode_fn = sampler.sample_ode(
            sampling_method=sampling_method,
            num_steps=num_steps,
            timestep_shift=timestep_shift,
        )
        if (
            cfg_phase_split and use_cfg and cfg_interval
            and sampling_method == "euler" and cfg_interval_start is not None
        ):
            # Guidance is inactive below cfg_interval_start (forward_with_cfg
            # discards the uncond half there), and the Euler grid is static —
            # so the leading sub-threshold steps can run at single batch and
            # the doubling happens at the phase boundary. Numerically
            # identical; with timestep_shift 0.3 / start 0.10 this skips
            # ~27% of the uncond forwards (PERF.md round 2).
            import numpy as np

            grid = sampler.ode_time_grid(num_steps, timestep_shift)
            n1 = int(np.searchsorted(grid[:-1], cfg_interval_start))
            if 0 < n1 < num_steps - 1:
                phase1_fn = sampler.sample_ode(
                    sampling_method="euler", t_grid=grid[: n1 + 1]
                )
                phase2_fn = sampler.sample_ode(
                    sampling_method="euler", t_grid=grid[n1:]
                )

    def sample_fn(
        bundle: Dict[str, Any], key: jax.Array, y: jnp.ndarray,
        z: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """``z`` overrides the initial noise (parity tests / exact
        reproduction of a reference run's latents)."""
        dit_params = bundle["dit"]

        def model_fn(x, t, y):
            return dit_forward(
                dit_params, spec, consts, x, t, y,
                train=False, compute_dtype=compute_dtype, attn_impl=attn_impl,
                rope_layout=rope_layout, adaln_impl=adaln_impl,
                quant_mode=quant_mode, mlp_impl=mlp_impl,
            ).astype(x.dtype)

        def guided_fn(x, t, y):
            return forward_with_cfg(
                model_fn, x, t, y, cfg_scale,
                cfg_interval=cfg_interval,
                cfg_interval_start=cfg_interval_start,
                cfg_channels=cfg_channels,
            )

        b = y.shape[0]
        h = spec.input_size
        k_z, k_sde = jax.random.split(key)
        if z is not None:
            z = jnp.asarray(z, jnp.float32).astype(compute_dtype)
        elif truncation is not None:
            # exact limiting law of the reference's resample-until-in-bounds
            # loop (inference.py:267-273)
            z = jax.random.truncated_normal(
                k_z, -truncation, truncation,
                (b, spec.in_channels, h, h), dtype=jnp.float32,
            ).astype(compute_dtype)
        else:
            z = jax.random.normal(
                k_z, (b, spec.in_channels, h, h), dtype=jnp.float32
            ).astype(compute_dtype)

        def integrate(z0, fn, y_arg):
            if sde_fn is not None:
                return sde_fn(k_sde, z0, fn, y=y_arg)
            return ode_fn(z0, fn, y=y_arg)

        if use_cfg:
            y_null = jnp.full((b,), spec.num_classes, dtype=y.dtype)
            y_all = jnp.concatenate([y, y_null], axis=0)
            if phase1_fn is not None:
                # sub-threshold steps: cond-only at single batch
                z1 = phase1_fn(z, model_fn, y=y)
                z2 = jnp.concatenate([z1, z1], axis=0)
                samples = phase2_fn(z2, guided_fn, y=y_all)[:b]
            else:
                z = jnp.concatenate([z, z], axis=0)
                samples = integrate(z, guided_fn, y_all)
                samples = samples[:b]
        else:
            samples = integrate(z, model_fn, y)

        samples = samples.astype(jnp.float32)
        if bundle.get("latent_std") is not None:
            samples = samples * bundle["latent_std"] / latent_multiplier
        if bundle.get("latent_mean") is not None:
            samples = samples + bundle["latent_mean"]
        if bundle.get("vae") is None:
            return samples
        if vae_decode_images_fn is not None:
            # generic tokenizer decode (models/tokenizers.build_tokenizer_fns)
            # — the reference dispatches the VAE on config.vae.model_name
            # (inference.py:131-164)
            return vae_decode_images_fn(bundle["vae"], samples)
        if vae_spec is None:
            return samples
        return vmae_mod.decode_to_images(
            bundle["vae"], vae_spec, vae_consts, samples,
            compute_dtype=compute_dtype, attn_impl=attn_impl,
        )

    return sample_fn


def demo_labels() -> jnp.ndarray:
    """The reference's fixed 8-class demo grid (inference.py:219-262)."""
    return jnp.array([975, 3, 207, 387, 388, 88, 979, 279], dtype=jnp.int32)
