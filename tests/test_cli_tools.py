"""Tool CLIs: export_torch (layout-aware), fid_stats, save_npz."""

import os
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, LDMAE_PLATFORM="cpu", PYTHONPATH=REPO)


class TestSaveNpz:
    def test_stacks_pngs(self, tmp_path):
        from ldmae_tpu.eval.save_npz import save_npz

        d = tmp_path / "samples"
        d.mkdir()
        rng = np.random.default_rng(0)
        for i in range(5):
            Image.fromarray(
                rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
            ).save(d / f"{i:06d}.png")
        out = save_npz(str(d), num=5)
        with np.load(out) as f:
            assert f["arr_0"].shape == (5, 8, 8, 3)

    def test_asserts_on_too_few(self, tmp_path):
        from ldmae_tpu.eval.save_npz import save_npz

        d = tmp_path / "s"
        d.mkdir()
        with pytest.raises(AssertionError):
            save_npz(str(d), num=10)


class TestExportTorchCLI:
    def test_half_layout_roundtrip(self, tmp_path):
        """Train 1 step in half layout via the CLI machinery, export to
        torch, re-import canonically: forward outputs must match."""
        import yaml
        from ldmae_tpu.core.config import LDMAEConfig
        from ldmae_tpu.models.lightningdit import (
            DiTConsts, dit_forward, permute_qk_for_half_rope,
        )
        from ldmae_tpu.train.state import init_train_state, save_checkpoint
        from ldmae_tpu.train.train_dit import build_from_config
        from ldmae_tpu.train.torch_import import import_dit_checkpoint

        cfg_dict = {
            "data": {"image_size": 32, "num_classes": 4},
            "vae": {"downsample_ratio": 8},
            "model": {"model_type": "LightningDiT-debug", "in_chans": 16,
                      "use_qknorm": True, "use_swiglu": True, "use_rope": True,
                      "use_rmsnorm": True},
            "train": {"output_dir": str(tmp_path), "exp_name": "e"},
            "parallel": {"rope_layout": "half"},
        }
        cfg_path = tmp_path / "c.yaml"
        cfg_path.write_text(yaml.safe_dump(cfg_dict))
        config = LDMAEConfig.from_yaml(str(cfg_path))
        spec, consts, params, transport, tx, _ = build_from_config(
            config, jax.random.key(0)
        )
        params = jax.tree_util.tree_map(
            lambda p: p + 0.1 * jax.random.normal(jax.random.key(1), p.shape), params
        )
        half_params = permute_qk_for_half_rope(params, spec)
        exp_dir = str(tmp_path / "exp")
        state = init_train_state(half_params, tx)
        save_checkpoint(exp_dir, state, config=config.to_dict())

        out_pt = str(tmp_path / "export.pt")
        r = subprocess.run(
            [
                sys.executable, "-m", "ldmae_tpu.cli.export_torch",
                "--config", str(cfg_path),
                "--ckpt", os.path.join(exp_dir, "checkpoints", "0000000"),
                "--out", out_pt,
            ],
            env=ENV, cwd=REPO, capture_output=True, text=True, timeout=600,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "inverse half-rope" in r.stdout

        back = import_dit_checkpoint(out_pt, spec, key="model")
        x = jax.random.normal(jax.random.key(2), (2, 16, 4, 4))
        t = jnp.array([0.3, 0.7])
        y = jnp.array([0, 1])
        ref = dit_forward(params, spec, consts, x, t, y, compute_dtype=jnp.float32)
        out = dit_forward(back, spec, consts, x, t, y, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


class TestFidStatsCLI:
    def test_builds_stats_npz(self, tmp_path):
        d = tmp_path / "imgs"
        d.mkdir()
        rng = np.random.default_rng(0)
        for i in range(4):
            Image.fromarray(
                rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            ).save(d / f"{i}.png")
        out = str(tmp_path / "ref.npz")
        r = subprocess.run(
            [
                sys.executable, "-m", "ldmae_tpu.cli.fid_stats",
                "--input", str(d), "--out", out, "--batch_size", "2",
            ],
            env=ENV, cwd=REPO, capture_output=True, text=True, timeout=900,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        with np.load(out) as f:
            assert f["mu"].shape == (2048,)
            assert f["sigma"].shape == (2048, 2048)
            assert "mu_s" in f.files and "sigma_s" in f.files


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


class TestFolderNaming:
    """Sample-folder names must be byte-identical to the reference's
    f-string (inference.py:45-52 == tools/save_npz.py:34-40) so resume and
    save_npz --config find the same directory."""

    def _config(self, **sample):
        import yaml

        from ldmae_tpu.core.config import LDMAEConfig

        cfg = {
            "ckpt_path": "output/exp/checkpoints/0100000.pt",
            "data": {"data_path": "/x", "image_size": 256, "num_classes": 1000},
            "vae": {"model_name": "vmae", "downsample_ratio": 8},
            "model": {"model_type": "LightningDiT-B/1", "in_chans": 16},
            "train": {"output_dir": "out", "exp_name": "e"},
            "sample": dict(
                {"sampling_method": "euler", "num_sampling_steps": 250,
                 "cfg_scale": 10.0, "cfg_interval_start": 0.10,
                 "timestep_shift": 0.3}, **sample,
            ),
        }
        return self._from_tmp(cfg)

    def _from_tmp(self, cfg):
        import tempfile

        import yaml

        from ldmae_tpu.core.config import LDMAEConfig

        with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
            f.write(yaml.safe_dump(cfg))
        return LDMAEConfig.from_yaml(f.name)

    def _reference_name(self, train_config, ckpt_path):
        # the reference's exact expression (inference.py:45-52)
        folder_name = f"{train_config['model']['model_type'].replace('/', '-')}-ckpt-{ckpt_path.split('/')[-1].split('.')[0]}-{train_config['sample']['sampling_method']}-{train_config['sample']['num_sampling_steps']}".lower()
        cfg_scale = train_config['sample']['cfg_scale']
        cfg_interval_start = train_config['sample'].get('cfg_interval_start', 0)
        timestep_shift = train_config['sample'].get('timestep_shift', 0)
        if cfg_scale > 1.0:
            folder_name += f"-interval{cfg_interval_start:.2f}" + f"-cfg{cfg_scale:.2f}"
            folder_name += f"-shift{timestep_shift:.2f}"
        return folder_name

    def test_cfg_name_matches_reference(self):
        from ldmae_tpu.eval.save_npz import folder_name_from_config

        config = self._config()
        ref = self._reference_name(
            {"model": {"model_type": "LightningDiT-B/1"},
             "sample": {"sampling_method": "euler", "num_sampling_steps": 250,
                        "cfg_scale": 10.0, "cfg_interval_start": 0.10,
                        "timestep_shift": 0.3}},
            "output/exp/checkpoints/0100000.pt",
        )
        assert folder_name_from_config(config) == ref
        assert ref == "lightningdit-b-1-ckpt-0100000-euler-250-interval0.10-cfg10.00-shift0.30"

    def test_uncond_name_has_no_cfg_suffix(self):
        from ldmae_tpu.eval.save_npz import folder_name_from_config

        config = self._config(cfg_scale=1.0)
        assert folder_name_from_config(config) == \
            "lightningdit-b-1-ckpt-0100000-euler-250"


class TestSaveNpzStreaming:
    def test_config_mode_and_streamed_npz(self, tmp_path):
        """--config re-derives the folder like the reference and the
        streamed npz equals a dense np.stack."""
        import subprocess
        import sys

        import yaml
        from PIL import Image

        rng = np.random.default_rng(0)
        cfg = {
            "ckpt_path": "ck/0000123.pt",
            "data": {"data_path": "/x", "image_size": 16, "num_classes": 4},
            "vae": {"model_name": "vmae", "downsample_ratio": 8},
            "model": {"model_type": "LightningDiT-debug", "in_chans": 16},
            "train": {"output_dir": str(tmp_path / "out"), "exp_name": "e"},
            "sample": {"sampling_method": "euler", "num_sampling_steps": 4,
                       "cfg_scale": 4.0, "cfg_interval_start": 0.10,
                       "timestep_shift": 0.3},
        }
        p = tmp_path / "cfg.yaml"
        p.write_text(yaml.safe_dump(cfg))
        from ldmae_tpu.core.config import LDMAEConfig
        from ldmae_tpu.eval.save_npz import folder_name_from_config

        config = LDMAEConfig.from_yaml(str(p))
        d = tmp_path / "out" / "e" / folder_name_from_config(config)
        d.mkdir(parents=True)
        imgs = rng.integers(0, 255, (7, 16, 16, 3), dtype=np.uint8)
        for i, im in enumerate(imgs):
            Image.fromarray(im).save(d / f"{i:06d}.png")
        env = dict(os.environ, LDMAE_PLATFORM="cpu", PYTHONPATH=REPO)
        r = subprocess.run(
            [sys.executable, "-m", "ldmae_tpu.eval.save_npz",
             "--config", str(p), "--num", "7"],
            env=env, cwd=REPO, capture_output=True, text=True, timeout=600,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        with np.load(str(d) + ".npz") as f:
            np.testing.assert_array_equal(f["arr_0"], imgs)
