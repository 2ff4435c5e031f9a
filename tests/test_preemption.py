"""Graceful preemption: SIGTERM during training saves a checkpoint and
exits cleanly, and the next launch resumes from it (no reference
equivalent — the reference loses up to ckpt_every steps of work)."""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest
import yaml
from safetensors.numpy import save_file

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(
    os.environ,
    LDMAE_PLATFORM="cpu",
    XLA_FLAGS="--xla_force_host_platform_device_count=2",
    PYTHONPATH=REPO,
)


@pytest.mark.timeout(600)
def test_sigterm_checkpoints_and_resumes(tmp_path):
    ldir = tmp_path / "latents_sample"
    ldir.mkdir()
    rng = np.random.default_rng(0)
    save_file(
        {
            "latents": rng.standard_normal((64, 32, 8, 8)).astype(np.float32),
            "latents_flip": rng.standard_normal((64, 32, 8, 8)).astype(np.float32),
            "labels": rng.integers(0, 4, 64).astype(np.int64),
        },
        str(ldir / "latents_rank00_shard000.safetensors"),
    )
    cfg = {
        "data": {"data_path": str(tmp_path / "latents"), "image_size": 64,
                 "num_classes": 4, "latent_norm": True, "sample": True},
        "vae": {"downsample_ratio": 8, "weight_path": ""},
        "model": {"model_type": "LightningDiT-debug", "in_chans": 16,
                  "use_qknorm": True, "use_swiglu": True, "use_rope": True,
                  "use_rmsnorm": True},
        "train": {"max_steps": 100000, "global_batch_size": 4,
                  "output_dir": str(tmp_path / "out"), "exp_name": "pre",
                  "log_every": 2, "ckpt_every": 1000000},
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    log_path = tmp_path / "out" / "pre" / "log.txt"

    proc = subprocess.Popen(
        [sys.executable, "-m", "ldmae_tpu.cli.train_dit", "--config", str(p)],
        env=ENV, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    try:
        # wait until training is actually stepping (first logged step)
        deadline = time.time() + 420
        while time.time() < deadline:
            if log_path.exists() and "Train Loss" in log_path.read_text():
                break
            time.sleep(1)
        else:
            raise AssertionError("trainer never reached the first log line")
        proc.send_signal(signal.SIGTERM)
        out, err = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, err[-3000:]
    log = log_path.read_text()
    assert "Saved preemption checkpoint" in log
    ckpts = os.listdir(tmp_path / "out" / "pre" / "checkpoints")
    steps = [c for c in ckpts if c.isdigit()]
    assert steps, ckpts

    # resume continues from the preempted step
    cfg["train"]["max_steps"] = int(max(steps)) + 1
    p.write_text(yaml.safe_dump(cfg))
    r = subprocess.run(
        [sys.executable, "-m", "ldmae_tpu.cli.train_dit", "--config", str(p)],
        env=ENV, cwd=REPO, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert f"resumed from step {int(max(steps))}" in log_path.read_text()


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


@pytest.mark.timeout(600)
def test_vmae_in_dir_checkpoint_beats_resume(tmp_path):
    """A checkpoint in the stage's own output_dir (e.g. from a preemption)
    must win over the --resume warm start on relaunch — otherwise a
    preempted stage 3 restarts from stage 1's checkpoint-90 and loses all
    its progress."""
    from PIL import Image

    root = tmp_path / "imgs" / "c0"
    root.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(
            rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        ).save(root / f"{i}.png")
    base = [
        sys.executable, "-m", "ldmae_tpu.cli.train_vmae",
        "--model", "mae_for_ldmae_f8d16_small",
        "--data_path", str(tmp_path / "imgs"),
        "--input_size", "32", "--batch_size", "2",
        "--warmup_epochs", "0", "--save_epochs", "1",
        "--steps_per_epoch", "2", "--mask_ratio", "0.25",
        "--no_cls", "--smooth_output",
    ]
    stage1 = tmp_path / "s1"
    r = subprocess.run(base + ["--output_dir", str(stage1), "--epochs", "1"],
                       env=ENV, cwd=REPO, capture_output=True, text=True,
                       timeout=420)
    assert r.returncode == 0, r.stderr[-3000:]

    stage3 = tmp_path / "s3"
    s3 = base + ["--output_dir", str(stage3), "--tune_decoder",
                 "--resume", str(stage1 / "checkpoints" / "checkpoint-0")]
    r = subprocess.run(s3 + ["--epochs", "1"], env=ENV, cwd=REPO,
                       capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "resumed weights from Orbax checkpoint" in r.stdout

    # relaunch (as after a preemption): the stage-3 checkpoint wins
    r = subprocess.run(s3 + ["--epochs", "2"], env=ENV, cwd=REPO,
                       capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "overrides --resume warm start" in r.stdout
