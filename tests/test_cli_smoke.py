"""CLI driver smoke tests (subprocess, tiny configs, CPU)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

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
        for i in range(8):
            Image.fromarray(
                rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
            ).save(d / f"{i}.png")
    return str(root)


class TestTrainVMAECLI:
    def test_two_epochs(self, image_folder, tmp_path):
        out = tmp_path / "vmae_out"
        cmd = [
            sys.executable, "-m", "ldmae_tpu.cli.train_vmae",
            "--model", "mae_for_ldmae_f8d16_small",
            "--data_path", image_folder,
            "--output_dir", str(out),
            "--input_size", "32",
            "--batch_size", "2",
            "--epochs", "2",
            "--warmup_epochs", "1",
            "--save_epochs", "2",
            "--steps_per_epoch", "2",
            "--mask_ratio", "0.25",
            "--no_cls", "--smooth_output",
            "--kl_loss_weight", "1e-6",
        ]
        env = dict(ENV)
        r = subprocess.run(
            cmd, env=env, cwd=REPO, capture_output=True, text=True, timeout=900
        )
        assert r.returncode == 0, r.stderr[-3000:]
        log = (out / "log.txt").read_text().strip().splitlines()
        assert len(log) == 2  # one JSON line per epoch
        rec = json.loads(log[-1])
        assert "train_loss" in rec and np.isfinite(rec["train_loss"])
        # checkpoint written
        assert (out / "checkpoints").is_dir()


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
