"""Full-size published-checkpoint import validation (VERDICT r1 item 1).

Builds the ACTUAL reference models (via tests/ref_loader) at the production
configurations — `mae_for_ldmae_f8d16_prev` at 256² (1024 tokens) exactly as
extract_features.py:57-66 constructs it, and `LightningDiT-B/1` exactly as
train_accum.py:79-90 does — saves their complete state_dicts in the
reference's on-disk checkpoint formats ({model,optimizer,epoch,args} for
VMAE per misc.py:468-485; {model,ema,opt,config} for DiT per
train_accum.py:275-284, plus strict=False extras), then:

  1. imports through ldmae_tpu.train.torch_import,
  2. asserts forward parity against the reference's own forward at
     production shapes (encode moments / decode / DiT forward / CFG quirk),
  3. exports back with ldmae_tpu.train.torch_export, asserts the exported
     key set covers every reference parameter key, and
  4. re-imports the export and asserts a bit-exact parameter round-trip.

A single mis-mapped key fails either the key-set check or the fp32 forward
tolerance.
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

from ldmae_tpu.models import vmae as vmae_mod
from ldmae_tpu.models.lightningdit import DiTConsts, dit_forward, dit_spec
from ldmae_tpu.models.vmae import VMAEConsts, vmae_spec
from ldmae_tpu.train import torch_export, torch_import
from ldmae_tpu.transport.samplers import forward_with_cfg

pytestmark = pytest.mark.slow

torch.manual_seed(0)


def _tree_equal(a, b):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_b[path]), err_msg=str(path)
        )


@pytest.fixture(scope="module")
def ref_vmae_ckpt(tmp_path_factory):
    """Production-config reference VMAE + its on-disk checkpoint file."""
    vm = load_ref_vmae()
    model = vm.mae_for_ldmae_f8d16_prev(
        ldmae_mode=True, no_cls=True, kl_loss_weight=True,
        smooth_output=True, img_size=256,
    )
    model.eval()
    # small init leaves activations ~N(0,1)-ish through 12 blocks
    path = tmp_path_factory.mktemp("ck") / "vmaef8d16.pth"
    ckpt = {
        "model": model.state_dict(),
        "optimizer": {"state": {}, "param_groups": []},
        "epoch": 399,
        "scaler": {},
        "args": {"note": "synthetic full-size checkpoint, reference key set"},
    }
    torch.save(ckpt, str(path))
    return model, str(path)


@pytest.fixture(scope="module")
def ref_dit_ckpt(tmp_path_factory):
    ld = load_ref_lightningdit()
    model = ld.LightningDiT_models["LightningDiT-B/1"](
        input_size=32, in_channels=16, num_classes=1000,
        use_qknorm=True, use_swiglu=True, use_rope=True, use_rmsnorm=True,
        class_dropout_prob=0.1, learn_sigma=False,
    )
    model.eval()
    sd = model.state_dict()
    # EMA differs from model so a key='ema' vs key='model' mix-up is caught
    ema = {k: v + 0.01 * torch.randn_like(v) if v.is_floating_point() else v
           for k, v in sd.items()}
    path = tmp_path_factory.mktemp("ck") / "0100000.pt"
    torch.save(
        {
            "model": sd,
            "ema": ema,
            "opt": {"state": {}, "param_groups": []},
            "config": {"model": {"model_type": "LightningDiT-B/1"}},
        },
        str(path),
    )
    return model, ema, str(path)


VSPEC = vmae_spec(
    "mae_for_ldmae_f8d16_prev", img_size=256, ldmae_mode=True, no_cls=True,
    kl_loss_weight=True, smooth_output=True,
)
DSPEC = dit_spec(
    "LightningDiT-B/1", input_size=32, in_channels=16, num_classes=1000,
    use_qknorm=True, use_swiglu=True, use_rope=True, use_rmsnorm=True,
)


class TestVMAEFullSize:
    def test_import_and_forward_parity_production_shapes(self, ref_vmae_ckpt):
        model, path = ref_vmae_ckpt
        params = torch_import.import_vmae_checkpoint(path, VSPEC)
        consts = VMAEConsts(VSPEC)

        x = torch.randn(2, 3, 256, 256) * 0.5
        with torch.no_grad():
            mom_ref = model._encode(x).numpy()
        mom = np.asarray(
            vmae_mod.ldmae_encode_moments(
                params, VSPEC, consts, jnp.asarray(x.numpy()),
                compute_dtype=jnp.float32,
            )
        )
        assert mom.shape == (2, 32, 32, 32)
        np.testing.assert_allclose(mom, mom_ref, rtol=2e-4, atol=2e-4)

        z = torch.randn(2, 16, 32, 32)
        with torch.no_grad():
            img_ref = model.decode(z).sample.numpy()
        img = np.asarray(
            vmae_mod.decode(
                params, VSPEC, consts, jnp.asarray(z.numpy()),
                compute_dtype=jnp.float32,
            )
        )
        assert img.shape == (2, 3, 256, 256)
        np.testing.assert_allclose(img, img_ref, rtol=2e-4, atol=2e-4)

    def test_export_covers_reference_keys_and_roundtrips(self, ref_vmae_ckpt, tmp_path):
        model, path = ref_vmae_ckpt
        params = torch_import.import_vmae_checkpoint(path, VSPEC)
        exported = torch_export.export_vmae_state_dict(params, VSPEC)

        ref_keys = set(model.state_dict().keys())
        exp_keys = set(exported.keys())
        missing = ref_keys - exp_keys
        # fixed sincos PE buffers are recomputed as consts on import; the
        # exporter must still ship them for reference compatibility
        assert not missing, sorted(missing)[:10]
        extra = exp_keys - ref_keys
        assert not extra, sorted(extra)[:10]

        # every exported tensor loads back into the REFERENCE model strictly
        msg = model.load_state_dict(
            {k: torch.as_tensor(np.asarray(v)) for k, v in exported.items()},
            strict=True,
        )
        assert not msg.missing_keys and not msg.unexpected_keys

        out = tmp_path / "export.pth"
        torch.save({"model": exported}, str(out))
        params2 = torch_import.import_vmae_checkpoint(str(out), VSPEC)
        _tree_equal(params, params2)

    def test_strict_false_extras_ignored(self, ref_vmae_ckpt, tmp_path):
        """The published vmaef8d16.pth is loaded with strict=False
        (extract_features.py:62-64) — leftover keys must not break import."""
        model, path = ref_vmae_ckpt
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        ckpt["model"]["decoder_pred_old.weight"] = torch.randn(3, 3)
        ckpt["model"]["some.training.buffer"] = torch.randn(4)
        p2 = tmp_path / "extras.pth"
        torch.save(ckpt, str(p2))
        params = torch_import.import_vmae_checkpoint(str(p2), VSPEC)
        clean = torch_import.import_vmae_checkpoint(path, VSPEC)
        _tree_equal(params, clean)


class TestDiTFullSize:
    def test_ema_import_and_forward_parity(self, ref_dit_ckpt):
        model, ema, path = ref_dit_ckpt
        params = torch_import.import_dit_checkpoint(path, DSPEC, key="model")
        consts = DiTConsts(DSPEC)

        x = torch.randn(2, 16, 32, 32)
        t = torch.tensor([0.25, 0.75])
        y = torch.tensor([3, 999])
        with torch.no_grad():
            out_ref = model(x, t, y).numpy()
        out = np.asarray(
            dit_forward(
                params, DSPEC, consts, jnp.asarray(x.numpy()),
                jnp.asarray(t.numpy()), jnp.asarray(y.numpy()),
                compute_dtype=jnp.float32,
            )
        )
        assert out.shape == (2, 16, 32, 32)
        np.testing.assert_allclose(out, out_ref, rtol=3e-4, atol=3e-4)

        # the ema sub-dict is what inference consumes (inference.py:100-103) —
        # it must load the DIFFERENT weights
        params_ema = torch_import.import_dit_checkpoint(path, DSPEC, key="ema")
        out_ema = np.asarray(
            dit_forward(
                params_ema, DSPEC, consts, jnp.asarray(x.numpy()),
                jnp.asarray(t.numpy()), jnp.asarray(y.numpy()),
                compute_dtype=jnp.float32,
            )
        )
        assert not np.allclose(out_ema, out_ref, atol=1e-3)

    def test_cfg_quirk_parity(self, ref_dit_ckpt):
        """forward_with_cfg: first-3-channel guidance + cfg_interval
        (lightningdit.py:420-442)."""
        model, _, path = ref_dit_ckpt
        params = torch_import.import_dit_checkpoint(path, DSPEC, key="model")
        consts = DiTConsts(DSPEC)

        z = torch.randn(2, 16, 32, 32)
        z2 = torch.cat([z, z], 0)
        y = torch.tensor([7, 42, 1000, 1000])
        for tval in (0.5, 0.05):  # above and below cfg_interval_start
            t = torch.full((4,), tval)
            with torch.no_grad():
                ref = model.forward_with_cfg(
                    z2, t, y, cfg_scale=10.0,
                    cfg_interval=True, cfg_interval_start=0.10,
                ).numpy()
            ours = np.asarray(
                forward_with_cfg(
                    lambda xx, tt, yy: dit_forward(
                        params, DSPEC, consts, xx, tt, yy,
                        compute_dtype=jnp.float32,
                    ),
                    jnp.asarray(z2.numpy()), jnp.asarray(t.numpy()),
                    jnp.asarray(y.numpy()),
                    cfg_scale=10.0, cfg_interval=True, cfg_interval_start=0.10,
                )
            )
            np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)

    def test_export_covers_reference_keys_and_roundtrips(self, ref_dit_ckpt, tmp_path):
        model, _, path = ref_dit_ckpt
        params = torch_import.import_dit_checkpoint(path, DSPEC, key="model")
        exported = torch_export.export_dit_state_dict(params, DSPEC)

        ref_keys = set(model.state_dict().keys())
        exp_keys = set(exported.keys())
        assert not (ref_keys - exp_keys), sorted(ref_keys - exp_keys)[:10]
        assert not (exp_keys - ref_keys), sorted(exp_keys - ref_keys)[:10]

        msg = model.load_state_dict(
            {k: torch.as_tensor(np.asarray(v)) for k, v in exported.items()},
            strict=True,
        )
        assert not msg.missing_keys and not msg.unexpected_keys

        out = tmp_path / "export.pt"
        torch.save({"model": exported, "ema": exported, "opt": {}, "config": {}}, str(out))
        params2 = torch_import.import_dit_checkpoint(str(out), DSPEC, key="model")
        _tree_equal(params, params2)

    def test_warm_start_channel_slice(self, ref_dit_ckpt, tmp_path):
        """train_accum.py:308-334: warm start slices x_embedder.proj.weight
        channels when in_channels differ (32→16)."""
        ld = load_ref_lightningdit()
        wide = ld.LightningDiT_models["LightningDiT-B/1"](
            input_size=32, in_channels=32, num_classes=1000,
            use_qknorm=True, use_swiglu=True, use_rope=True, use_rmsnorm=True,
        )
        p32 = tmp_path / "wide.pt"
        torch.save({"model": wide.state_dict()}, str(p32))
        loaded = torch_import.import_dit_checkpoint(str(p32), DSPEC, key="model")
        # x_embedder conv weight (768, 32, 1, 1) must arrive channel-sliced
        # to our (1*1*16, 768) matmul layout
        w = np.asarray(loaded["x_embedder"]["w"])
        assert w.shape == (16, 768)
        ref_w = wide.state_dict()["x_embedder.proj.weight"].numpy()  # (768,32,1,1)
        np.testing.assert_allclose(w, ref_w[:, :16, 0, 0].T, rtol=1e-6)


class TestConvVAEFullSize:
    """The reference's own tokenizer/autoencoder.py (pure torch) vs our
    conv VAE at the published architectures — closes the SURVEY §2.5 gap
    where the VA-VAE/MAR-VAE key mapping had only been checked against
    hand-built minis."""

    @pytest.fixture(scope="class")
    def ref_ae_module(self):
        from ref_loader import _common_stubs, _load_with

        return _load_with(
            "/root/reference/LDMAE/tokenizer/autoencoder.py",
            "ref_autoencoder",
            _common_stubs(),
        )

    def _roundtrip(self, ref_ae_module, tmp_path, model_type, embed_dim):
        from ldmae_tpu.models import conv_vae as cv

        model = ref_ae_module.AutoencoderKL(
            embed_dim=embed_dim, ch_mult=(1, 1, 2, 2, 4), model_type=model_type
        )
        model.eval()
        if model_type == "vavae":
            ckpt = {"state_dict": model.state_dict()}
            path = tmp_path / "vavae-imagenet256-f16d32-dinov2.pt"
        else:
            ckpt = {"model": model.state_dict()}
            path = tmp_path / "marvae.ckpt"
        torch.save(ckpt, str(path))
        if model_type == "vavae":
            params, spec = cv.load_vavae(str(path), embed_dim)
        else:
            params, spec = cv.load_marvae(str(path), embed_dim)

        x = torch.randn(1, 3, 128, 128) * 0.5
        with torch.no_grad():
            post_ref = model.encode(x)
        ours_post = cv.encode(params, spec, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(
            np.asarray(ours_post.mean), post_ref.mean.numpy(), rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(ours_post.logvar), post_ref.logvar.numpy(), rtol=2e-3, atol=2e-3
        )

        z = torch.randn(1, embed_dim, 8, 8)
        with torch.no_grad():
            dec_ref = model.decode(z).numpy()
        dec = np.asarray(cv.decode(params, spec, jnp.asarray(z.numpy())))
        assert dec.shape == dec_ref.shape == (1, 3, 128, 128)
        np.testing.assert_allclose(dec, dec_ref, rtol=2e-3, atol=2e-3)

    def test_vavae_f16d32(self, ref_ae_module, tmp_path):
        self._roundtrip(ref_ae_module, tmp_path, "vavae", 32)

    def test_marvae_f16d16(self, ref_ae_module, tmp_path):
        self._roundtrip(ref_ae_module, tmp_path, "marvae", 16)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


class TestGradualImport:
    def test_gradual_checkpoint_import_and_forward_parity(self):
        """gradual_resol checkpoints interleave the Down/Upsample convs
        inside the blocks ModuleLists (models_mae.py:352-395);
        import_vmae_state_dict_gradual must de-interleave and reproduce the
        reference forward (mask_ratio=0 -> deterministic; kl off so no
        sampling)."""
        from ldmae_tpu.models import vmae_variants as vv
        from ldmae_tpu.models.vmae import VMAESpec
        from ldmae_tpu.train.torch_import import import_vmae_state_dict_gradual

        vm = load_ref_vmae()
        ref = vm.MaskedAutoencoderViT(
            img_size=32, patch_size=4, embed_dim=24, depth=2, num_heads=4,
            decoder_embed_dim=24, decoder_depth=2, decoder_num_heads=4,
            latent_dim=4, no_cls=True, gradual_resol=True,
            norm_layer=torch.nn.LayerNorm,
        )
        ref.eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

        # ctor halves patch_size for gradual (models_mae.py:310-312)
        spec = VMAESpec(
            img_size=32, patch_size=2, embed_dim=24, depth=2, num_heads=4,
            decoder_embed_dim=24, decoder_depth=2, decoder_num_heads=4,
            latent_dim=4, no_cls=True,
        )
        down = spec.depth // 2          # models_mae.py:354
        up = spec.decoder_depth - down  # models_mae.py:386
        params = import_vmae_state_dict_gradual(sd, spec, down, up)
        assert "encoder_downsample" in params and params["encoder_downsample"] is not None
        assert len(params["blocks"]) == 2 and len(params["decoder_blocks"]) == 2

        consts = vv.GradualConsts(spec)
        imgs = torch.randn(2, 3, 32, 32)
        with torch.no_grad():
            _, ref_pred, _, _, _, _, _ = ref.forward_vanilla(
                imgs, mask_ratio=0.0, visible_loss_ratio=0.5
            )
        out = vv.forward_vanilla_gradual(
            params, spec, consts, jnp.asarray(imgs.numpy()), jax.random.key(0),
            downsample_after=down, upsample_after=up, mask_ratio=0.0,
        )
        np.testing.assert_allclose(
            np.asarray(out["pred"]), ref_pred.numpy(), rtol=2e-4, atol=2e-4
        )
