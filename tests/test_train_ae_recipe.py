"""Pin scripts/train_ae.sh to the published recipe and test the stage-3
warm-start path.

The reference trains stage 1 at 128² with perceptual_loss_ratio 0.5,
fixed_std 1e-3, visible_loss_ratio 0.75, warmup 10, wd 0.05, and stage 3 at
256² with perceptual_loss_ratio 10.0, visible_loss_ratio 0.5, save_epochs 1,
resuming from CHECKPOINT-90 (/root/reference/VMAE/train_ae.sh:26-106).
"""

import os
import re
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "train_ae.sh")
ENV = dict(
    os.environ,
    LDMAE_PLATFORM="cpu",
    XLA_FLAGS="--xla_force_host_platform_device_count=2",
    PYTHONPATH=REPO,
)

# the reference's flag sets, train_ae.sh:26-46 (stage 1) and 84-106 (stage 3)
STAGE1_FLAGS = {
    "--model": "mae_for_ldmae_f8d16_prev",
    "--input_size": "128",
    "--batch_size": "128",
    "--accum_iter": "2",
    "--epochs": "400",
    "--warmup_epochs": "10",
    "--blr": "1.0e-4",
    "--weight_decay": "0.05",
    "--mask_ratio": "0.25",
    "--visible_loss_ratio": "0.75",
    "--perceptual_loss_ratio": "0.5",
    "--fixed_std": "1e-3",
    "--kl_loss_weight": "1e-6",
}
STAGE3_FLAGS = {
    "--model": "mae_for_ldmae_f8d16_prev",
    "--input_size": "256",
    "--batch_size": "16",
    "--accum_iter": "16",
    "--epochs": "10",
    "--save_epochs": "1",
    "--warmup_epochs": "0",
    "--blr": "1.0e-5",
    "--weight_decay": "0.05",
    "--mask_ratio": "0.0",
    "--visible_loss_ratio": "0.5",
    "--perceptual_loss_ratio": "10.0",
    "--kl_loss_weight": "0.0",
}


def _parse_stages():
    text = open(SCRIPT).read()
    stages = []
    for block in re.findall(
        r"python -m ldmae_tpu\.cli\.train_vmae(.*?)\"\$@\"", text, re.S
    ):
        flags = {}
        bools = set()
        toks = block.replace("\\\n", " ").split()
        i = 0
        while i < len(toks):
            if toks[i].startswith("--"):
                if i + 1 < len(toks) and not toks[i + 1].startswith("--"):
                    flags[toks[i]] = toks[i + 1].strip('"')
                    i += 2
                    continue
                bools.add(toks[i])
            i += 1
        stages.append((flags, bools))
    return stages


class TestRecipePin:
    def test_two_stages(self):
        assert len(_parse_stages()) == 2

    def test_stage1_flags(self):
        flags, bools = _parse_stages()[0]
        for k, v in STAGE1_FLAGS.items():
            assert flags.get(k) == v, f"stage1 {k}: {flags.get(k)} != {v}"
        assert {"--no_cls", "--smooth_output"} <= bools
        assert "--tune_decoder" not in bools

    def test_stage3_flags(self):
        flags, bools = _parse_stages()[1]
        for k, v in STAGE3_FLAGS.items():
            assert flags.get(k) == v, f"stage3 {k}: {flags.get(k)} != {v}"
        assert {"--no_cls", "--smooth_output", "--tune_decoder"} <= bools
        # the checkpoint-90 handoff (train_ae.sh:106)
        assert flags.get("--resume", "").endswith("checkpoint-90")


class TestCrossStageResume:
    def test_orbax_warm_start(self, tmp_path):
        """Stage-3-style --resume from a stage-1 Orbax checkpoint dir loads
        the weights (the old script pointed --resume at a directory, which
        the CLI silently ignored — stage 3 trained from random init)."""
        root = tmp_path / "imgs"
        rng = np.random.default_rng(0)
        for ci in range(2):
            d = root / f"c{ci}"
            d.mkdir(parents=True)
            for i in range(4):
                Image.fromarray(
                    rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
                ).save(d / f"{i}.png")

        stage1 = tmp_path / "stage1"
        base = [
            sys.executable, "-m", "ldmae_tpu.cli.train_vmae",
            "--model", "mae_for_ldmae_f8d16_small",
            "--data_path", str(root),
            "--input_size", "32",
            "--batch_size", "2",
            "--epochs", "1", "--warmup_epochs", "0",
            "--save_epochs", "1", "--steps_per_epoch", "2",
            "--mask_ratio", "0.25",
            "--no_cls", "--smooth_output",
            "--kl_loss_weight", "1e-6",
        ]
        r = subprocess.run(
            base + ["--output_dir", str(stage1)],
            env=ENV, cwd=REPO, capture_output=True, text=True, timeout=900,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        alias = stage1 / "checkpoints" / "checkpoint-0"
        assert alias.is_symlink() or alias.is_dir(), os.listdir(stage1 / "checkpoints")

        # stage 3: tune_decoder, resume from the epoch alias
        r = subprocess.run(
            base + [
                "--output_dir", str(tmp_path / "stage3"),
                "--mask_ratio", "0.0", "--tune_decoder",
                "--kl_loss_weight", "0.0",
                "--resume", str(alias),
            ],
            env=ENV, cwd=REPO, capture_output=True, text=True, timeout=900,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert "resumed weights from Orbax checkpoint" in r.stdout

    def test_resume_missing_raises(self, tmp_path):
        r = subprocess.run(
            [
                sys.executable, "-m", "ldmae_tpu.cli.train_vmae",
                "--model", "mae_for_ldmae_f8d16_small",
                "--data_path", str(tmp_path),
                "--input_size", "32",
                "--resume", str(tmp_path / "nonexistent"),
            ],
            env=ENV, cwd=REPO, capture_output=True, text=True, timeout=900,
        )
        assert r.returncode != 0


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


class TestSaveCadence:
    def test_reference_epoch_cadence(self, tmp_path):
        """Checkpoints at epoch 0, S, 2S, ... plus the final epoch
        (main_pretrain.py:286) — stage 3's checkpoint-90 handoff depends on
        epoch-90 existing at the default save_epochs=10 (the old
        (epoch+1)%S cadence produced 9, 19, ..., never 90)."""
        root = tmp_path / "imgs" / "c0"
        root.mkdir(parents=True)
        rng = np.random.default_rng(0)
        for i in range(4):
            Image.fromarray(
                rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
            ).save(root / f"{i}.png")
        out = tmp_path / "out"
        r = subprocess.run(
            [
                sys.executable, "-m", "ldmae_tpu.cli.train_vmae",
                "--model", "mae_for_ldmae_f8d16_small",
                "--data_path", str(tmp_path / "imgs"),
                "--output_dir", str(out),
                "--input_size", "32", "--batch_size", "2",
                "--epochs", "5", "--warmup_epochs", "0",
                "--save_epochs", "2", "--steps_per_epoch", "1",
                "--mask_ratio", "0.25", "--no_cls", "--smooth_output",
            ],
            env=ENV, cwd=REPO, capture_output=True, text=True, timeout=900,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        aliases = sorted(
            f for f in os.listdir(out / "checkpoints")
            if f.startswith("checkpoint-")
        )
        # epochs 0, 2, 4 by cadence + final epoch 4 (already covered)
        assert aliases == ["checkpoint-0", "checkpoint-2", "checkpoint-4"], aliases
