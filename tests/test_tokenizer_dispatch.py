"""Driver-level tokenizer dispatch on config.vae.model_name.

The reference builds the tokenizer from the config in all three inference-side
drivers (extract_features.py:57-99, inference.py:131-164,
evaluate_tokenizer.py:57-95), dispatching on ``model_name.split('_')[0]``:
'vmae' → the production VMAE, {'ae','dae','vae','sdv3'} → the diffusers
SD-VAE, anything else raises. These tests run each of our drivers end-to-end
with a non-VMAE config and pin the factory's error behavior.
"""

import glob
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(
    os.environ,
    LDMAE_PLATFORM="cpu",
    XLA_FLAGS="--xla_force_host_platform_device_count=2",
    PYTHONPATH=REPO,
)


@pytest.fixture(scope="module")
def image_folder(tmp_path_factory):
    root = tmp_path_factory.mktemp("cls")
    rng = np.random.default_rng(0)
    for ci in range(2):
        d = root / f"c{ci}"
        d.mkdir()
        for i in range(6):
            Image.fromarray(
                rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
            ).save(d / f"{i}.png")
    return str(root)


def _write_config(tmp_path, origin, model_name, image_size=64, in_chans=16):
    import yaml

    cfg = {
        "data": {
            "origin_path": origin,
            "data_path": str(tmp_path / "latents"),
            "image_size": image_size,
            "num_classes": 2,
            "latent_norm": True,
            "sample": True,
        },
        "vae": {"model_name": model_name, "downsample_ratio": 8, "weight_path": ""},
        "model": {"model_type": "LightningDiT-debug", "in_chans": in_chans,
                  "use_qknorm": True, "use_swiglu": True, "use_rope": True,
                  "use_rmsnorm": True},
        "train": {"output_dir": str(tmp_path / "out"), "exp_name": "tok"},
        "sample": {"num_sampling_steps": 4, "cfg_scale": 4.0,
                   "per_proc_batch_size": 8, "fid_num": 8},
    }
    p = tmp_path / f"cfg_{model_name}.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


class TestFactory:
    def test_unknown_name_raises(self):
        from ldmae_tpu.models.tokenizers import build_tokenizer_fns

        with pytest.raises(ValueError, match="unknown tokenizer"):
            build_tokenizer_fns("bogus_vae")

    def test_missing_weight_path_raises(self):
        from ldmae_tpu.models.tokenizers import build_tokenizer_fns

        with pytest.raises(FileNotFoundError):
            build_tokenizer_fns("vavae", weight_path="/nonexistent/ckpt.pt")

    def test_reference_families_map(self):
        """Every model_name the reference accepts resolves, with the
        reference's latent dims (sdvae latent 16, vavae 32, marvae 16)."""
        from ldmae_tpu.models.tokenizers import build_tokenizer_fns

        for name, dim in [("vmae", 16), ("vmae_f8d16", 16), ("sdv3", 16),
                          ("ae", 16), ("dae", 16), ("vae", 16),
                          ("vavae", 32), ("marvae", 16)]:
            tok = build_tokenizer_fns(name, img_size=64)
            assert tok.latent_dim == dim, name

    def test_sdvae_roundtrip_shapes(self):
        import jax
        import jax.numpy as jnp
        from ldmae_tpu.models.tokenizers import build_tokenizer_fns
        from ldmae_tpu.ops.gaussian import diagonal_gaussian

        tok = build_tokenizer_fns("sdv3", img_size=64)
        x = jax.random.normal(jax.random.key(0), (2, 3, 64, 64))
        moments = tok.encode_moments(tok.params, x)
        assert moments.shape == (2, 32, 8, 8)
        z = diagonal_gaussian(moments, axis=1).mode()
        img = tok.decode(tok.params, z)
        assert img.shape == (2, 3, 64, 64)
        u8 = tok.decode_to_images(tok.params, z)
        assert u8.shape == (2, 64, 64, 3) and u8.dtype == jnp.uint8


class TestDriversDispatch:
    def test_extract_features_sdvae(self, image_folder, tmp_path):
        """extract_features with an sdvae config writes f8d16-shaped moment
        shards through the conv VAE (reference extract_features.py:67-99)."""
        cfg = _write_config(tmp_path, image_folder, "sdv3")
        r = subprocess.run(
            [sys.executable, "-m", "ldmae_tpu.cli.extract_features",
             "--config", cfg, "--batch", "4", "--limit", "8"],
            env=ENV, cwd=REPO, capture_output=True, text=True, timeout=900,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        shards = glob.glob(str(tmp_path / "latents_sample" / "*.safetensors"))
        assert shards
        from safetensors import safe_open

        with safe_open(shards[0], framework="numpy", device="cpu") as f:
            assert tuple(f.get_slice("latents").get_shape())[1:] == (32, 8, 8)

    def test_extract_features_unknown_vae_fails(self, image_folder, tmp_path):
        cfg = _write_config(tmp_path, image_folder, "bogus")
        r = subprocess.run(
            [sys.executable, "-m", "ldmae_tpu.cli.extract_features",
             "--config", cfg, "--batch", "4", "--limit", "4"],
            env=ENV, cwd=REPO, capture_output=True, text=True, timeout=900,
        )
        assert r.returncode != 0
        assert "unknown tokenizer" in r.stderr

    def test_evaluate_tokenizer_vavae(self, image_folder, tmp_path):
        """evaluate_tokenizer dispatches a vavae config through the conv VAE
        (in-process; f16d32 → 4×4×32 latents at 64²)."""
        from ldmae_tpu.cli.evaluate_tokenizer import evaluate_tokenizer
        from ldmae_tpu.core.config import LDMAEConfig

        cfg = LDMAEConfig.from_yaml(
            _write_config(tmp_path, image_folder, "vavae")
        )
        report = evaluate_tokenizer(
            cfg, image_folder, str(tmp_path / "rfid"), epsilon=0.1,
            batch=4, limit=8,
        )
        for k in ("rfid", "psnr", "lpips", "ssim"):
            assert np.isfinite(report[k]), report
        assert len(os.listdir(tmp_path / "rfid" / "vavae_0.1")) == 8

    def test_inference_demo_sdvae(self, tmp_path):
        """The fused sampling pipeline decodes through the conv VAE when the
        config names sdvae (reference inference.py:139-164)."""
        cfg = _write_config(tmp_path, str(tmp_path / "noimgs"), "sdv3")
        r = subprocess.run(
            [sys.executable, "-m", "ldmae_tpu.cli.inference",
             "--config", cfg, "--demo", "--demo_out", str(tmp_path / "demo")],
            env=ENV, cwd=REPO, capture_output=True, text=True, timeout=900,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        grids = glob.glob(str(tmp_path / "demo" / "*_demo_samples.png"))
        assert grids, r.stdout[-2000:]
        assert Image.open(grids[0]).size == (4 * 64, 2 * 64)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
