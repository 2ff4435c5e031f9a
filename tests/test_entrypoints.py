"""Driver entry points must at minimum import and build cleanly on CPU —
bench.py and __graft_entry__.py are executed by the round driver, so
import-time bitrot there is costlier than anywhere else."""

import pytest
import os
import subprocess
import sys

import numpy as np

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO, XLA_FLAGS="")


def test_bench_imports():
    r = subprocess.run(
        [sys.executable, "-c", "import bench; print('ok', bench.A100_BASELINE_IMGS_PER_SEC)"],
        env=ENV, cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ok 0.4" in r.stdout


def test_graft_entry_single_chip():
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g, jax; fn, args = g.entry(); "
         "out = jax.jit(fn)(*args); print('entry', out.shape)"],
        env=ENV, cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "entry (8, 16, 32, 32)" in r.stdout


def test_psnr_batch_np_matches_psnr():
    import jax.numpy as jnp

    from ldmae_tpu.eval.metrics import psnr, psnr_batch_np

    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (3, 8, 8, 3)).astype(np.uint8)
    b = rng.integers(0, 255, (3, 8, 8, 3)).astype(np.uint8)
    batched = psnr_batch_np(a, b)
    for i in range(3):
        single = float(psnr(jnp.asarray(a[i], jnp.float32), jnp.asarray(b[i], jnp.float32)))
        np.testing.assert_allclose(batched[i], single, rtol=1e-5)
