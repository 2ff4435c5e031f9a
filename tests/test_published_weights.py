"""Skip-gated parity tests against PUBLISHED weights (VERDICT r4 next #7).

The image ships no published checkpoints (standing environment limitation,
VERDICT r4 missing #4), so these tests are skipped here — but the moment
the weight files land in any environment, the parity evidence materializes
with zero new code:

  * ``pretrain_weight/vmaef8d16.pth`` — the production VMAE f8d16 tokenizer
    (reference extract_features.py:62-64): encode/decode round-trip quality
    and latent-statistics sanity through the torch import path.
  * ``pretrain_weight/pt_inception-2015-12-05-6726825d.pth`` — the FID
    Inception: full key coverage through the BN-folding import, pool3
    feature sanity, and the internal mixed_6/conv tap identity with REAL
    weights.
  * ``pretrain_weight/mixed6_conv_tf_golden.npz`` — a golden exported from
    the TF1 graph the ADM evaluator actually runs (evaluator.py:24,610-614).
    Export recipe (in a TF1-capable env):

        import numpy as np, tensorflow.compat.v1 as tf
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 255, (4, 299, 299, 3), np.uint8)
        # load classify_image_graph_def.pb, feed ExpandDims:0 = imgs,
        # fetch mixed_6/conv:0 (NHWC), then:
        np.savez("mixed6_conv_tf_golden.npz", input=imgs, expected=out)

    The JAX tap must match it (modulo the documented resize difference —
    the golden must be generated at 299x299 so no resize is involved).
  * a DiT ``.pt`` under ``pretrain_weight/`` (any ``*dit*.pt``) — EMA
    import + real-weight bf16-vs-int8 sampling agreement (the round-4 int8
    FID gate ran on synthetic weights; this is the real-weight A/B).
"""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# point LDMAE_PRETRAIN_DIR at the weights in any environment that has them
PW = os.environ.get("LDMAE_PRETRAIN_DIR", os.path.join(REPO, "pretrain_weight"))

VMAE_PTH = os.path.join(PW, "vmaef8d16.pth")
INCEPTION_PTH = os.path.join(PW, "pt_inception-2015-12-05-6726825d.pth")
TF_GOLDEN = os.path.join(PW, "mixed6_conv_tf_golden.npz")


def _dit_ckpts():
    return sorted(glob.glob(os.path.join(PW, "*dit*.pt")))


def _structured_images(n=4, size=256):
    """Natural-ish synthetic pixels (gradients + texture), NCHW in [-1, 1]."""
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    imgs = []
    for i in range(n):
        base = np.stack(
            [
                np.sin(xx / (12 + 6 * i)),
                np.cos(yy / (9 + 4 * i)),
                np.sin((xx + yy) / (20 + 3 * i)),
            ]
        )
        imgs.append(np.clip(base + rng.normal(0, 0.15, base.shape), -1, 1))
    return np.asarray(imgs, np.float32)


@pytest.mark.skipif(not os.path.exists(VMAE_PTH), reason="vmaef8d16.pth not in image")
class TestVMAEPublished:
    def test_roundtrip_and_latent_stats(self):
        from ldmae_tpu.models.tokenizers import build_tokenizer

        tok = build_tokenizer("vmae_f8d16", VMAE_PTH, 256)
        imgs = _structured_images(4, 256)
        z = np.asarray(tok.encode_images(imgs, key=jax.random.key(0)))
        # f8d16: 256² -> (4, 16, 32, 32) latents
        assert z.shape == (4, 16, 32, 32), z.shape
        assert np.isfinite(z).all()
        # a trained tokenizer's latent scale is O(1) per the KL prior —
        # random weights give either near-zero or exploding channels
        std = z.reshape(4, 16, -1).std(axis=(0, 2))
        assert (std > 0.01).all() and (std < 100).all(), std
        rec = tok.decode_to_images(z).astype(np.float32)  # uint8 HWC
        ref = ((imgs.transpose(0, 2, 3, 1) + 1) * 127.5).clip(0, 255)
        mse = ((rec - ref) ** 2).mean()
        psnr = 10 * np.log10(255.0**2 / max(mse, 1e-9))
        # published rFID ~0.28; anything trained reconstructs smooth
        # synthetic content far above this conservative floor
        assert psnr > 18.0, f"round-trip PSNR {psnr:.2f} dB"


@pytest.mark.skipif(
    not os.path.exists(INCEPTION_PTH), reason="pt_inception weights not in image"
)
class TestInceptionPublished:
    def test_import_key_coverage_and_features(self):
        import torch

        from ldmae_tpu.models.inception import (
            inception_forward,
            load_inception_params,
        )

        sd = torch.load(INCEPTION_PTH, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        # every conv/bn tensor of the checkpoint must be consumed by the
        # folding import (fc/aux heads excluded — FID never runs them)
        body = [
            k for k in sd
            if not k.startswith(("fc.", "AuxLogits.")) and "num_batches_tracked" not in k
        ]
        params = load_inception_params(INCEPTION_PTH)
        # spot-check: a folded leaf exists for each conv prefix
        prefixes = {k.rsplit(".", 2)[0] for k in body if k.endswith("conv.weight")}
        flat = jax.tree_util.tree_leaves(params)
        assert len(flat) >= 3 * len(prefixes), (len(flat), len(prefixes))

        x = jnp.asarray(
            (_structured_images(2, 299).transpose(0, 2, 3, 1) + 1) / 2, jnp.float32
        )
        pool3, spatial = inception_forward(params, x, return_spatial=True)
        assert pool3.shape == (2, 2048) and spatial.shape == (2, 192, 17, 17)
        assert np.isfinite(np.asarray(pool3)).all()
        # trained features are non-degenerate: many active dims, non-equal rows
        active = (np.asarray(pool3).std(axis=0) > 1e-6).mean()
        assert active > 0.5, f"only {active:.0%} of pool3 dims active"

    def test_tap_against_tf_golden(self):
        if not os.path.exists(TF_GOLDEN):
            pytest.skip("TF-exported mixed_6/conv golden not present")
        from ldmae_tpu.models.inception import (
            inception_forward,
            load_inception_params,
        )

        g = np.load(TF_GOLDEN)
        x = jnp.asarray(g["input"].astype(np.float32) / 255.0)
        params = load_inception_params(INCEPTION_PTH)
        _, spatial = inception_forward(params, x, return_spatial=True)
        # ours is NCHW; the TF node is NHWC
        got = np.asarray(spatial).transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, g["expected"], rtol=1e-3, atol=1e-3)


@pytest.mark.skipif(
    not (os.path.exists(VMAE_PTH) and _dit_ckpts()),
    reason="published VMAE + DiT checkpoints not in image",
)
class TestRealWeightInt8:
    def test_int8_sampling_agreement(self):
        """Real-weight bf16 vs w8a8: same noise must decode near-identical
        images (the synthetic-weight gate measured PSNR 46.5 dB / FID delta
        at the same-distribution floor, EVAL_NOTES.md; real weights must
        hold a conservative fraction of that)."""
        from ldmae_tpu.eval.sampling import make_sample_fn
        from ldmae_tpu.models.lightningdit import (
            DiTConsts, dit_spec, merge_swiglu, permute_qk_for_half_rope,
            quantize_dit_params,
        )
        from ldmae_tpu.models.vmae import VMAEConsts, vmae_spec
        from ldmae_tpu.train import torch_import
        from ldmae_tpu.transport import create_transport

        spec = dit_spec(
            "LightningDiT-B/1", input_size=32, in_channels=16, num_classes=1000,
            use_qknorm=True, use_swiglu=True, use_rope=True, use_rmsnorm=True,
        )
        consts = DiTConsts(spec)
        base = torch_import.import_dit_checkpoint(_dit_ckpts()[0], spec, key="ema")
        base = merge_swiglu(permute_qk_for_half_rope(base, spec), spec)

        vspec = vmae_spec(
            "mae_for_ldmae_f8d16_prev", img_size=256, ldmae_mode=True,
            no_cls=True, kl_loss_weight=True, smooth_output=True,
        )
        vparams = torch_import.import_vmae_checkpoint(VMAE_PTH, vspec)
        transport = create_transport("Linear", "velocity", use_lognorm=True)

        imgs = {}
        for mode in (None, "w8a8"):
            fn = make_sample_fn(
                spec, consts, transport, num_steps=50, sampling_method="euler",
                timestep_shift=0.3, cfg_scale=10.0, cfg_interval=True,
                cfg_interval_start=0.10, cfg_channels=3,
                vae_spec=vspec, vae_consts=VMAEConsts(vspec),
                compute_dtype=jnp.bfloat16, rope_layout="half", quant_mode=mode,
            )
            p = quantize_dit_params(base, spec) if mode else base
            bundle = {"dit": p, "vae": vparams,
                      "latent_mean": jnp.zeros((1, 16, 1, 1)),
                      "latent_std": jnp.ones((1, 16, 1, 1))}
            y = jnp.arange(8, dtype=jnp.int32) * 100
            imgs[mode or "bf16"] = np.asarray(
                jax.jit(fn)(bundle, jax.random.key(0), y)
            ).astype(np.float32)
        d = imgs["w8a8"] - imgs["bf16"]
        psnr = 10 * np.log10(255.0**2 / max((d**2).mean(), 1e-9))
        assert psnr > 35.0, f"real-weight int8 PSNR {psnr:.1f} dB"
