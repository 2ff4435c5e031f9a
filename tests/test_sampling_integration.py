"""Integrated sampling-chain parity vs the reference (VERDICT r2 item 4).

Every stage of the sampling pipeline is parity-tested individually elsewhere;
this test runs the COMPOSED chain — Euler ODE over the timestep-shifted grid
(integrators.py:96-125) with the reference's own ``forward_with_cfg`` (CFG
batch-doubling, first-3-channel quirk, cfg_interval, lightningdit.py:420-442),
latent denorm ``(x·std)/mult + mean`` (inference.py:291), and the reference
VMAE ``decode`` (models_mae.py:902-924) — hand-rolled in torch against our
jitted ``make_sample_fn`` with the same weights and the same initial noise.
A grid off-by-one, a denorm-order swap, or a CFG phase-split error shifts
every pixel and fails this test.
"""

import os
import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_loader import load_ref_lightningdit, load_ref_vmae  # noqa: E402

from ldmae_tpu.eval.sampling import make_sample_fn
from ldmae_tpu.models import vmae as vmae_mod
from ldmae_tpu.models.lightningdit import (
    DiTConsts,
    dit_spec,
    init_dit_params,
    merge_swiglu,
    permute_qk_for_half_rope,
)
from ldmae_tpu.models.vmae import VMAEConsts, init_vmae_params, vmae_spec
from ldmae_tpu.train import torch_export
from ldmae_tpu.transport import create_transport

torch.manual_seed(0)

NUM_STEPS = 6
CFG_SCALE = 4.0
CFG_INTERVAL_START = 0.10
TIMESTEP_SHIFT = 0.3
LATENT_MULT = 0.9654248952865601  # the VMAE Config.scaling_factor
B, C, H = 4, 16, 4  # latent grid of a 32² image through f8
NUM_CLASSES = 4

DSPEC = dit_spec(
    "LightningDiT-debug", input_size=H, in_channels=C, num_classes=NUM_CLASSES,
    use_qknorm=True, use_swiglu=True, use_rope=True, use_rmsnorm=True,
)
VSPEC = vmae_spec(
    "mae_for_ldmae_f8d16_small", img_size=32, ldmae_mode=True, no_cls=True,
    kl_loss_weight=True, smooth_output=True,
)


@pytest.fixture(scope="module")
def chain():
    """Shared weights on both sides + the torch-side reference outputs."""
    key = jax.random.key(42)
    dit_params = init_dit_params(key, DSPEC)
    # nudge the zero-init adaLN/final layers so the model is not identity
    dit_params = jax.tree_util.tree_map(
        lambda p: p + 0.02 * jax.random.normal(jax.random.key(3), p.shape),
        dit_params,
    )
    vae_params = init_vmae_params(jax.random.key(7), VSPEC)

    ld = load_ref_lightningdit()
    ref_dit = ld.LightningDiT(
        input_size=H, patch_size=1, in_channels=C, hidden_size=64, depth=2,
        num_heads=4, num_classes=NUM_CLASSES, class_dropout_prob=0.1,
        learn_sigma=False, use_qknorm=True, use_swiglu=True, use_rope=True,
        use_rmsnorm=True,
    )
    sd = torch_export.export_dit_state_dict(dit_params, DSPEC)
    missing, unexpected = ref_dit.load_state_dict(
        {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()}, strict=False
    )
    assert not [m for m in missing if "pos_embed" not in m], missing
    ref_dit.eval()

    vm = load_ref_vmae()
    ref_vae = vm.mae_for_ldmae_f8d16_small(
        ldmae_mode=True, no_cls=True, kl_loss_weight=True, smooth_output=True,
        img_size=32,
    )
    vsd = torch_export.export_vmae_state_dict(vae_params, VSPEC)
    missing, unexpected = ref_vae.load_state_dict(
        {k: torch.as_tensor(np.asarray(v)) for k, v in vsd.items()}, strict=False
    )
    assert not [m for m in missing if "pos_embed" not in m], missing
    ref_vae.eval()

    rng = np.random.default_rng(11)
    z = rng.standard_normal((B, C, H, H)).astype(np.float32)
    y = rng.integers(0, NUM_CLASSES, B).astype(np.int64)
    latent_mean = rng.standard_normal((1, C, 1, 1)).astype(np.float32) * 0.1
    latent_std = (1.0 + 0.2 * rng.random((1, C, 1, 1))).astype(np.float32)

    # ---- torch reference chain (inference.py:264-298) --------------------
    with torch.no_grad():
        t = torch.linspace(0, 1, NUM_STEPS)
        t = TIMESTEP_SHIFT * t / (1 + (TIMESTEP_SHIFT - 1) * t)
        x = torch.cat([torch.from_numpy(z)] * 2, dim=0)
        y_all = torch.cat(
            [torch.from_numpy(y), torch.full((B,), NUM_CLASSES, dtype=torch.long)]
        )
        for i in range(NUM_STEPS - 1):
            ti = torch.ones(x.shape[0]) * t[i]
            v = ref_dit.forward_with_cfg(
                x, ti, y_all, CFG_SCALE,
                cfg_interval=True, cfg_interval_start=CFG_INTERVAL_START,
            )
            x = x + (t[i + 1] - t[i]) * v
        samples, _ = x.chunk(2, dim=0)
        samples = (
            samples * torch.from_numpy(latent_std) / LATENT_MULT
            + torch.from_numpy(latent_mean)
        )
        ref_latents = samples.numpy()
        decoded = ref_vae.decode(samples).sample
        ref_images = (
            torch.clamp(127.5 * decoded + 128.0, 0, 255)
            .permute(0, 2, 3, 1)
            .numpy()
            .astype(np.uint8)
        )

    return dict(
        dit_params=dit_params, vae_params=vae_params, z=z, y=y,
        latent_mean=latent_mean, latent_std=latent_std,
        ref_latents=ref_latents, ref_images=ref_images,
    )


def _our_sample(chain, *, with_vae, production_layout=False):
    transport = create_transport("Linear", "velocity")
    dit_params = chain["dit_params"]
    kw = {}
    if production_layout:
        dit_params = permute_qk_for_half_rope(dit_params, DSPEC)
        dit_params = merge_swiglu(dit_params, DSPEC)
        kw = dict(rope_layout="half", mlp_impl="fused")
    fn = make_sample_fn(
        DSPEC, DiTConsts(DSPEC), transport,
        num_steps=NUM_STEPS, sampling_method="euler",
        timestep_shift=TIMESTEP_SHIFT, cfg_scale=CFG_SCALE,
        cfg_interval=True, cfg_interval_start=CFG_INTERVAL_START,
        cfg_channels=3, latent_multiplier=LATENT_MULT,
        vae_spec=VSPEC if with_vae else None,
        vae_consts=VMAEConsts(VSPEC) if with_vae else None,
        compute_dtype=jnp.float32, **kw,
    )
    bundle = {
        "dit": dit_params,
        "vae": chain["vae_params"] if with_vae else None,
        "latent_mean": jnp.asarray(chain["latent_mean"]),
        "latent_std": jnp.asarray(chain["latent_std"]),
    }
    return np.asarray(
        jax.jit(fn)(
            bundle, jax.random.key(0), jnp.asarray(chain["y"]),
            z=jnp.asarray(chain["z"]),
        )
    )


class TestIntegratedSamplingParity:
    def test_latent_chain_parity(self, chain):
        """ODE + CFG + denorm (no decode): allclose to the torch loop."""
        ours = _our_sample(chain, with_vae=False)
        np.testing.assert_allclose(
            ours, chain["ref_latents"], rtol=2e-4, atol=2e-4
        )

    def test_full_chain_image_parity(self, chain):
        """Through the VMAE decode to uint8 images: identical up to ±1 from
        fp rounding at the uint8 boundary."""
        ours = _our_sample(chain, with_vae=True)
        assert ours.shape == chain["ref_images"].shape
        diff = np.abs(
            ours.astype(np.int32) - chain["ref_images"].astype(np.int32)
        )
        assert diff.max() <= 1, f"max abs diff {diff.max()}"
        assert (diff == 0).mean() > 0.99

    def test_production_layout_matches_canonical(self, chain):
        """half-split RoPE + merged SwiGLU (the layout cli.inference samples
        in) produces the same images as the canonical layout."""
        canonical = _our_sample(chain, with_vae=True)
        production = _our_sample(chain, with_vae=True, production_layout=True)
        diff = np.abs(
            production.astype(np.int32) - canonical.astype(np.int32)
        )
        assert diff.max() <= 1
        assert (diff == 0).mean() > 0.99


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
