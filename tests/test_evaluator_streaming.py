"""Streaming ADM evaluator: O(batch) host memory at 50k scale.

The reference evaluator streams npz batches through Inception
(/root/reference/LDMAE/tools/evaluator.py:448-585); round 2's port instead
converted the whole array to fp32 in one shot (~39 GB at 50k×256²) and
np.stack'ed whole folders. These tests pin the streamed reader: identical
metric values, batch-sized reads, and a no-full-copy memory bound.
"""

import os
import tracemalloc

import numpy as np
import pytest
from PIL import Image

from ldmae_tpu.eval.evaluator import (
    Evaluator,
    _append_npz_arrays,
    _npz_has_members,
    iter_npz_batches,
)


class TestNpzStreaming:
    def test_batches_roundtrip(self, tmp_path):
        arr = np.random.default_rng(0).integers(
            0, 255, (37, 8, 8, 3), dtype=np.uint8
        )
        p = str(tmp_path / "x.npz")
        np.savez(p, arr_0=arr)
        got = np.concatenate(list(iter_npz_batches(p, "arr_0", 10)))
        np.testing.assert_array_equal(got, arr)
        # batch shapes: 10,10,10,7
        sizes = [len(b) for b in iter_npz_batches(p, "arr_0", 10)]
        assert sizes == [10, 10, 10, 7]

    def test_limit(self, tmp_path):
        arr = np.arange(20 * 4, dtype=np.float32).reshape(20, 4)
        p = str(tmp_path / "x.npz")
        np.savez(p, arr_0=arr)
        got = np.concatenate(list(iter_npz_batches(p, "arr_0", 8, limit=13)))
        np.testing.assert_array_equal(got, arr[:13])

    def test_compressed_npz(self, tmp_path):
        """savez_compressed members decompress incrementally too."""
        arr = np.random.default_rng(1).standard_normal((23, 5)).astype(np.float32)
        p = str(tmp_path / "c.npz")
        np.savez_compressed(p, arr_0=arr)
        got = np.concatenate(list(iter_npz_batches(p, "arr_0", 7)))
        np.testing.assert_array_equal(got, arr)

    def test_append_members(self, tmp_path):
        arr = np.random.default_rng(2).integers(0, 255, (6, 4, 4, 3), dtype=np.uint8)
        p = str(tmp_path / "a.npz")
        np.savez(p, arr_0=arr)
        assert not _npz_has_members(p, ("arr_1", "arr_2"))
        _append_npz_arrays(p, {"arr_1": np.ones((6, 2)), "arr_2": np.zeros((6, 3))})
        assert _npz_has_members(p, ("arr_1", "arr_2"))
        with np.load(p) as f:
            np.testing.assert_array_equal(f["arr_0"], arr)  # untouched
            assert f["arr_1"].shape == (6, 2)


@pytest.fixture()
def cheap_evaluator():
    """Evaluator with a stub forward — these tests exercise the streaming
    plumbing, not Inception."""
    ev = Evaluator.__new__(Evaluator)
    ev.batch_size = 64
    ev._fc = None
    ev._fwd = lambda x: (
        np.asarray(x).reshape(len(x), -1)[:, :8].astype(np.float32),
        np.asarray(x).reshape(len(x), -1)[:, :4].astype(np.float32),
    )
    return ev


class TestStreamedActivations:
    def test_npz_matches_inmemory(self, cheap_evaluator, tmp_path):
        ev = cheap_evaluator
        imgs = np.random.default_rng(0).integers(
            0, 255, (150, 8, 8, 3), dtype=np.uint8
        )
        p = str(tmp_path / "imgs.npz")
        np.savez(p, arr_0=imgs)
        direct = ev.compute_activations(imgs)
        streamed = ev.read_activations(p)
        np.testing.assert_allclose(streamed[0], direct[0], rtol=1e-6)
        np.testing.assert_allclose(streamed[1], direct[1], rtol=1e-6)
        # activations got cached into the npz and are reused
        assert _npz_has_members(p, ("arr_1", "arr_2"))
        cached = ev.read_activations(p)
        np.testing.assert_array_equal(cached[0], streamed[0])

    def test_folder_matches_inmemory(self, cheap_evaluator, tmp_path):
        ev = cheap_evaluator
        ev.batch_size = 4
        d = tmp_path / "pngs"
        d.mkdir()
        rng = np.random.default_rng(3)
        imgs = rng.integers(0, 255, (10, 8, 8, 3), dtype=np.uint8)
        for i, im in enumerate(imgs):
            Image.fromarray(im).save(d / f"{i:03d}.png")
        streamed = ev.read_activations(str(d))
        direct = ev.compute_activations(imgs)
        np.testing.assert_allclose(streamed[0], direct[0], rtol=1e-6)

    def test_memory_stays_o_batch(self, cheap_evaluator, tmp_path):
        """25k×32²×3 uint8 (~73 MB): a one-shot fp32 conversion would
        allocate ~294 MB; the streamed path must stay well under that."""
        ev = cheap_evaluator
        n = 25000
        imgs = np.zeros((n, 32, 32, 3), dtype=np.uint8)
        p = str(tmp_path / "big.npz")
        np.savez(p, arr_0=imgs)
        del imgs
        tracemalloc.start()
        ev.read_activations(p, limit=n)  # limit → no caching write
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        assert peak < 120 * 1024 * 1024, f"peak {peak/1e6:.0f} MB"


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


class TestReadStatistics:
    def test_folder_reference_falls_through(self, cheap_evaluator, tmp_path):
        """A folder reference path must compute stats from activations, not
        np.load the directory (full_report passes ref_path through when no
        stats npz is given)."""
        acts = (
            np.random.default_rng(0).standard_normal((16, 8)),
            np.random.default_rng(1).standard_normal((16, 4)),
        )
        d = tmp_path / "refdir"
        d.mkdir()
        s1, s2 = cheap_evaluator.read_statistics(str(d), acts)
        np.testing.assert_allclose(s1.mu, acts[0].mean(axis=0))
        assert s2.sigma.shape == (4, 4)

    def test_stats_npz_is_used(self, cheap_evaluator, tmp_path):
        p = str(tmp_path / "stats.npz")
        np.savez(p, mu=np.ones(8), sigma=np.eye(8),
                 mu_s=np.zeros(4), sigma_s=np.eye(4))
        acts = (np.zeros((4, 8)), np.zeros((4, 4)))
        s1, s2 = cheap_evaluator.read_statistics(p, acts)
        np.testing.assert_array_equal(s1.mu, np.ones(8))
        np.testing.assert_array_equal(s2.sigma, np.eye(4))
