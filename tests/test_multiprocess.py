"""True multi-PROCESS distributed test (2 CPU processes, localhost gRPC).

Everything else in the suite runs single-process on a virtual 8-device mesh;
this launches two actual processes through the env:// rendezvous that
``parallel/distributed.py`` implements (the reference's
init_distributed_mode, VMAE/util/misc.py:367-402) and checks:
cross-process psum, per-process dataset sharding, and barrier.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest
from safetensors.numpy import save_file

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_two_process_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _communicate_all(procs, timeout=420):
    """communicate() EVERY rank before asserting, and show every rank's
    stderr on failure: when one rank dies, the coordination service kills
    the others with a generic "Shutdown barrier has failed" — asserting
    rank-by-rank surfaces that cascade instead of the real traceback in
    the rank that died first."""
    results = []
    for p in procs:
        try:
            results.append(p.communicate(timeout=timeout))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
    if any(p.returncode != 0 for p in procs):
        report = "\n".join(
            f"--- rank {r} rc={p.returncode} ---\n{err[-4000:]}\n{out[-2000:]}"
            for r, (p, (out, err)) in enumerate(zip(procs, results))
        )
        raise AssertionError(f"multi-process run failed:\n{report}")
    return [out for out, _ in results]


@pytest.fixture(scope="module")
def latent_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mp_latents")
    rng = np.random.default_rng(0)
    # labels are 0..N-1 so each worker can report exactly which rows it saw
    for shard, lo in enumerate([0, 9]):
        n = 9 if shard == 0 else 7
        save_file(
            {
                "latents": rng.standard_normal((n, 4, 2, 2)).astype(np.float32),
                "latents_flip": rng.standard_normal((n, 4, 2, 2)).astype(np.float32),
                "labels": np.arange(lo, lo + n).astype(np.int64),
            },
            str(d / f"latents_rank00_shard{shard:03d}.safetensors"),
        )
    return str(d)


@pytest.mark.timeout(600)
def test_two_process_rendezvous_psum_and_sharding(latent_dir):
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(
            os.environ,
            RANK=str(rank),
            WORLD_SIZE="2",
            MASTER_ADDR="127.0.0.1",
            MASTER_PORT=str(port),
            PYTHONPATH=REPO,
        )
        env.pop("JAX_PLATFORMS", None)  # worker sets its own
        env["XLA_FLAGS"] = ""  # drop conftest's 8-device flag; worker uses 2
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, latent_dir],
                env=env,
                cwd=REPO,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = _communicate_all(procs)

    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        kv = dict(item.split("=") for item in line.split()[1:])
        results[kv["rank"]] = kv

    assert results["0"]["main"] == "True" and results["1"]["main"] == "False"
    for r in results.values():
        assert r["sum"] == "33.0"
        assert r["disjoint"] == "True"
        assert r["complete"] == "True"
    # 16 rows split across 2 processes
    assert int(results["0"]["n_local"]) + int(results["1"]["n_local"]) == 16

    # shard_batch regression (parallel/mesh.py:62-72): the 2-process DiT step
    # on per-process HALVES of a global batch must reproduce the single-
    # process loss on the whole batch — a plain device_put would have each
    # process contribute global-index rows of its local half (half the data
    # twice), shifting the loss.
    assert results["0"]["dit_loss"] == results["1"]["dit_loss"]
    ref = _single_process_dit_loss()
    assert abs(float(results["0"]["dit_loss"]) - ref) < 5e-4, (
        results["0"]["dit_loss"], ref,
    )

    # PROCESS-SPANNING dp x tp mesh (VERDICT r4 next #4): the dp(2 proc) x
    # tp(2 dev) global train step must reproduce the same loss, and the
    # inference local-mesh rule must hold alongside the live global backend
    assert results["0"]["dit_loss_tp"] == results["1"]["dit_loss_tp"]
    assert abs(float(results["0"]["dit_loss_tp"]) - ref) < 5e-4, (
        results["0"]["dit_loss_tp"], ref,
    )
    for r in results.values():
        assert r["local_mesh_agree"] == "True"


def _single_process_dit_loss() -> float:
    """The same tiny DiT step the worker runs, unsharded in this process."""
    import jax
    import jax.numpy as jnp

    from ldmae_tpu.models.lightningdit import DiTConsts, DiTSpec, init_dit_params
    from ldmae_tpu.train.state import init_train_state
    from ldmae_tpu.train.train_dit import make_optimizer, make_train_step
    from ldmae_tpu.transport import create_transport

    spec = DiTSpec(
        input_size=4, patch_size=1, in_channels=4, hidden_size=32, depth=2,
        num_heads=4, num_classes=8, use_swiglu=True, use_rmsnorm=True,
    )
    consts = DiTConsts(spec)
    tx = make_optimizer(1e-3, 0.95, max_grad_norm=1.0)
    state = init_train_state(init_dit_params(jax.random.key(0), spec), tx)
    transport = create_transport("Linear", "velocity", use_lognorm=False)
    step = make_train_step(
        spec, consts, transport, tx, grad_accum=1, compute_dtype=jnp.float32
    )
    grng = np.random.default_rng(123)
    batch = {
        "x": jnp.asarray(grng.standard_normal((1, 8, 4, 4, 4)).astype(np.float32)),
        "y": jnp.asarray(grng.integers(0, 8, (1, 8)).astype(np.int32)),
    }
    _, metrics = jax.jit(step)(state, batch, jax.random.key(5))
    return float(metrics["loss"])


def test_local_batch_indices_partition():
    """Concatenating every process's slice reconstructs exactly the global
    batch (incl. the wrap-around case) — pins the fix for each process
    loading the FULL global batch (which shard_batch's multiprocess path
    would assemble into a doubled, duplicated global array)."""
    from ldmae_tpu.cli.train_vmae import local_batch_indices

    order = np.random.default_rng(0).permutation(10)
    for step, per_step, P_ in [(0, 4, 2), (1, 4, 2), (2, 4, 4), (3, 6, 2)]:
        slices = [
            local_batch_indices(order, step, per_step, pi, P_) for pi in range(P_)
        ]
        assert all(len(s) == per_step // P_ for s in slices)
        # the global batch the reference semantics define (wrapping reuse)
        g = order[(step * per_step) % len(order):][:per_step]
        if len(g) < per_step:
            g = np.concatenate([g, order[: per_step - len(g)]])
        np.testing.assert_array_equal(np.concatenate(slices), g)
    # single process: the slice IS the global batch
    np.testing.assert_array_equal(
        local_batch_indices(order, 1, 4, 0, 1), order[4:8]
    )


@pytest.fixture(scope="module")
def image_folder(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("mp_imgs")
    rng = np.random.default_rng(0)
    for ci in range(2):
        d = root / f"c{ci}"
        d.mkdir()
        for i in range(8):
            Image.fromarray(
                rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
            ).save(d / f"{i}.png")
    return str(root)


@pytest.mark.timeout(600)
def test_two_process_vmae_cli(image_folder, tmp_path):
    """The VMAE trainer CLI end-to-end over 2 real processes (1 CPU device
    each): rendezvous, per-process batch slices, shard_batch assembly, one
    epoch, rank-0 log/checkpoint."""
    port = _free_port()
    out = tmp_path / "vmae_mp"
    procs = []
    for rank in range(2):
        env = dict(
            os.environ,
            RANK=str(rank),
            WORLD_SIZE="2",
            MASTER_ADDR="127.0.0.1",
            MASTER_PORT=str(port),
            PYTHONPATH=REPO,
            LDMAE_PLATFORM="cpu",
            XLA_FLAGS="",  # 1 CPU device per process
        )
        env.pop("JAX_PLATFORMS", None)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m", "ldmae_tpu.cli.train_vmae",
                    "--model", "mae_for_ldmae_f8d16_small",
                    "--data_path", image_folder,
                    "--output_dir", str(out),
                    "--input_size", "32",
                    "--batch_size", "2",
                    "--epochs", "1",
                    "--warmup_epochs", "1",
                    "--save_epochs", "1",
                    "--steps_per_epoch", "2",
                    "--mask_ratio", "0.25",
                    "--no_cls",
                    "--kl_loss_weight", "1e-6",
                ],
                env=env,
                cwd=REPO,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    _communicate_all(procs, timeout=540)
    import json

    rec = json.loads((out / "log.txt").read_text().strip().splitlines()[-1])
    assert np.isfinite(rec["train_loss"])
    assert (out / "checkpoints").is_dir()


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


@pytest.fixture(scope="module")
def image_cfg(tmp_path_factory):
    from PIL import Image
    import yaml

    t = tmp_path_factory.mktemp("mp_extract")
    rng = np.random.default_rng(1)
    img_dir = t / "imgs" / "cls0"
    img_dir.mkdir(parents=True)
    for i in range(12):
        Image.fromarray(
            rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        ).save(str(img_dir / f"{i}.png"))
    cfg = {
        "data": {"origin_path": str(t / "imgs"), "data_path": str(t / "lat"),
                 "image_size": 32, "num_classes": 1, "latent_norm": True,
                 "sample": True},
        "vae": {"model_name": "vmae_f8d16", "downsample_ratio": 8,
                "weight_path": ""},
        "model": {"model_type": "LightningDiT-debug", "in_chans": 16},
        "train": {"output_dir": str(t / "out"), "exp_name": "mp"},
    }
    p = t / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p), str(t / "lat_sample")


@pytest.mark.timeout(600)
def test_two_process_extraction_driver(image_cfg):
    """End-to-end 2-process extract_features: per-rank shards, the global
    --limit split, and the pre-stats barrier (rank 0 computes
    latents_stats.pt only after every rank flushed)."""
    cfg, out_dir = image_cfg
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(
            os.environ,
            RANK=str(rank),
            WORLD_SIZE="2",
            MASTER_ADDR="127.0.0.1",
            MASTER_PORT=str(port),
            PYTHONPATH=REPO,
            LDMAE_PLATFORM="cpu",
            JAX_PLATFORMS="cpu",
        )
        env["XLA_FLAGS"] = ""
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "ldmae_tpu.cli.extract_features",
                 "--config", cfg, "--batch", "2", "--limit", "10"],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    _communicate_all(procs)

    import glob

    from safetensors import safe_open

    shards0 = glob.glob(os.path.join(out_dir, "latents_rank00_*.safetensors"))
    shards1 = glob.glob(os.path.join(out_dir, "latents_rank01_*.safetensors"))
    assert shards0 and shards1, os.listdir(out_dir)
    total = 0
    for s in shards0 + shards1:
        with safe_open(s, framework="numpy", device="cpu") as f:
            total += f.get_slice("labels").get_shape()[0]
    assert total == 10  # global --limit, not per-rank
    assert os.path.exists(os.path.join(out_dir, "latents_stats.pt"))


def _spawn_two(argv, extra_env=None, timeout=420):
    """Launch argv as 2 env:// ranks (1 CPU device each); return stdouts."""
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(
            os.environ,
            RANK=str(rank),
            WORLD_SIZE="2",
            MASTER_ADDR="127.0.0.1",
            MASTER_PORT=str(port),
            PYTHONPATH=REPO,
            LDMAE_PLATFORM="cpu",
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="",
        )
        env.update(extra_env or {})
        procs.append(
            subprocess.Popen(
                [sys.executable] + argv, env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    return _communicate_all(procs, timeout=timeout)


def _read_latents(shards):
    from safetensors import safe_open

    rows = []
    for s in shards:
        with safe_open(s, framework="numpy", device="cpu") as f:
            lat = f.get_tensor("latents")
            rows.append(lat.reshape(lat.shape[0], -1))
    return np.concatenate(rows)


@pytest.mark.timeout(900)
def test_two_process_extraction_matches_single_process(image_cfg, tmp_path_factory):
    """The merged 2-rank extraction equals the 1-process run row-for-row
    (as multisets — rank-interleaving reorders), proving the interleaved
    quota split is disjoint AND complete; latents_stats.pt must also agree,
    which fails if rank 0 computed stats before rank 1 flushed (the
    pre-stats barrier, reference extract_features.py:215-218)."""
    import glob

    import torch
    import yaml

    cfg2, out2 = image_cfg
    t = tmp_path_factory.mktemp("sp_extract")
    c = yaml.safe_load(open(cfg2))
    c["data"]["data_path"] = str(t / "lat")
    cfg1 = str(t / "cfg.yaml")
    open(cfg1, "w").write(yaml.safe_dump(c))
    out1 = str(t / "lat_sample")

    # depends on test_two_process_extraction_driver having produced out2;
    # rerun here if the ordering changed (resume skip makes this cheap)
    if not glob.glob(os.path.join(out2, "latents_rank01_*.safetensors")):
        _spawn_two(["-m", "ldmae_tpu.cli.extract_features",
                    "--config", cfg2, "--batch", "2", "--limit", "10"])

    r = subprocess.run(
        [sys.executable, "-m", "ldmae_tpu.cli.extract_features",
         "--config", cfg1, "--batch", "2", "--limit", "10"],
        env=dict(os.environ, PYTHONPATH=REPO, LDMAE_PLATFORM="cpu",
                 JAX_PLATFORMS="cpu", XLA_FLAGS=""),
        cwd=REPO, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-3000:]

    rows2 = _read_latents(sorted(glob.glob(os.path.join(out2, "*.safetensors"))))
    rows1 = _read_latents(sorted(glob.glob(os.path.join(out1, "*.safetensors"))))
    assert rows1.shape == rows2.shape == (10, rows1.shape[1])
    # multiset equality via lexicographic row sort: catches any overlap
    # (a row twice + a row missing) or divergence
    o1 = np.lexsort(rows1.T[::-1])
    o2 = np.lexsort(rows2.T[::-1])
    np.testing.assert_allclose(rows2[o2], rows1[o1], rtol=1e-5, atol=1e-6)

    # barrier proof: the stats rank 0 wrote must equal a deterministic
    # recompute (seed=0, sorted shards) over BOTH ranks' shards — had rank 0
    # computed before rank 1 flushed, its file set (rank00 only) would give
    # different stats. (Exact 1-proc vs 2-proc stats equality is NOT
    # expected: with sample=True the stats draw posterior eps against the
    # row order, which rank-interleaving permutes.)
    import shutil

    from ldmae_tpu.data.latent_dataset import ImgLatentDataset

    merged = tmp_path_factory.mktemp("merged_shards")
    for s in glob.glob(os.path.join(out2, "*.safetensors")):
        shutil.copy(s, str(merged))
    ds = ImgLatentDataset(str(merged), latent_norm=True, sample=True)
    s2 = torch.load(os.path.join(out2, "latents_stats.pt"), weights_only=False)
    np.testing.assert_allclose(np.asarray(s2["mean"]), ds._latent_mean, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s2["std"]), ds._latent_std, rtol=1e-6)


@pytest.fixture(scope="module")
def inference_cfg(tmp_path_factory):
    import yaml

    t = tmp_path_factory.mktemp("mp_inference")
    cfg = {
        "data": {"data_path": str(t / "nolatents"), "image_size": 32,
                 "num_classes": 8, "latent_norm": True, "sample": True},
        "vae": {"model_name": "vmae_f8d16", "downsample_ratio": 8,
                "weight_path": ""},
        "model": {"model_type": "LightningDiT-debug", "in_chans": 16,
                  "use_qknorm": True, "use_swiglu": True, "use_rope": True,
                  "use_rmsnorm": True},
        "train": {"output_dir": str(t / "out"), "exp_name": "mp_inf"},
        "sample": {"num_sampling_steps": 2, "cfg_scale": 4.0,
                   "per_proc_batch_size": 4, "fid_num": 10},
    }
    p = t / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p), str(t / "out")


@pytest.mark.timeout(900)
def test_two_process_inference_interleave(inference_cfg):
    """2-rank PNG sampling covers EXACTLY fid_num indices with no overlap:
    rank r takes batches r, r+world, ... (reference inference.py:294-298),
    the final batch is trimmed to fid_num, and both ranks contribute."""
    import glob

    cfg, out_root = inference_cfg
    outs = _spawn_two(
        ["-m", "ldmae_tpu.cli.inference", "--config", cfg, "--skip_fid"]
    )
    pngs = glob.glob(os.path.join(out_root, "**", "*.png"), recursive=True)
    idxs = sorted(int(os.path.basename(p)[:-4]) for p in pngs)
    # fid_num=10, per_batch=4 -> 3 batches: rank0 gets 0..3 and 8..9
    # (batch 2 trimmed), rank1 gets 4..7; exact cover, no dupes, no gaps
    assert idxs == list(range(10)), idxs
    assert "batch 1/3" in outs[0] and "batch 2/3" in outs[1]


@pytest.mark.timeout(600)
def test_two_process_evaluate_tokenizer(image_cfg, tmp_path_factory):
    """2-process tokenizer eval (the reference is DDP with metric
    all-reduce, evaluate_tokenizer.py:47,186-189): interleaved batches per
    rank, cross-process metric averaging, rank-0-only rFID report, and the
    pre-rFID barrier."""
    cfg, _ = image_cfg
    out = str(tmp_path_factory.mktemp("mp_rfid"))
    import yaml

    data_path = yaml.safe_load(open(cfg))["data"]["origin_path"]
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(
            os.environ,
            RANK=str(rank),
            WORLD_SIZE="2",
            MASTER_ADDR="127.0.0.1",
            MASTER_PORT=str(port),
            PYTHONPATH=REPO,
            LDMAE_PLATFORM="cpu",
            JAX_PLATFORMS="cpu",
        )
        env["XLA_FLAGS"] = ""
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "ldmae_tpu.cli.evaluate_tokenizer",
                 "--config", cfg, "--data_path", data_path,
                 "--output_path", out, "--batch", "2", "--limit", "10",
                 "--epsilon", "0.0"],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = _communicate_all(procs)

    # rank 0 reports, rank 1 does not
    assert "Final Metrics" in outs[0] and "rfid" in outs[0]
    assert "Final Metrics" not in outs[1]
    # each rank wrote its interleaved half of the global 10-image budget
    ref_dir = os.path.join(out, "reference")
    dec_dir = os.path.join(out, "vmae_f8d16_0.0")
    r0 = [f for f in os.listdir(ref_dir) if "_rank_0_" in f]
    r1 = [f for f in os.listdir(ref_dir) if "_rank_1_" in f]
    assert len(r0) == 5 and len(r1) == 5, (len(r0), len(r1))
    assert len(os.listdir(dec_dir)) == 10
