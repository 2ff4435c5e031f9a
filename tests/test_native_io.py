"""Native C++ IO: PNG encoding round-trips through PIL; shard gather matches
safetensors; throughput sanity vs PIL."""

import os
import time

import numpy as np
import pytest
from PIL import Image

from ldmae_tpu.data.native_io import NativeShard, get_lib, write_pngs
from safetensors.numpy import save_file


needs_native = pytest.mark.skipif(get_lib() is None, reason="no native toolchain")


class TestPng:
    @needs_native
    def test_roundtrip_via_pil(self, tmp_path):
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 256, (4, 37, 53, 3), dtype=np.uint8)
        paths = [str(tmp_path / f"{i}.png") for i in range(4)]
        n = write_pngs(imgs, paths)
        assert n == 4
        for i, p in enumerate(paths):
            back = np.asarray(Image.open(p).convert("RGB"))
            np.testing.assert_array_equal(back, imgs[i])

    @needs_native
    def test_faster_than_pil(self, tmp_path):
        rng = np.random.default_rng(1)
        imgs = rng.integers(0, 256, (32, 256, 256, 3), dtype=np.uint8)
        native_paths = [str(tmp_path / f"n{i}.png") for i in range(32)]
        pil_paths = [str(tmp_path / f"p{i}.png") for i in range(32)]
        t0 = time.time()
        write_pngs(imgs, native_paths, level=1)
        t_native = time.time() - t0
        t0 = time.time()
        for img, p in zip(imgs, pil_paths):
            Image.fromarray(img).save(p)
        t_pil = time.time() - t0
        # threaded native encode should beat sequential PIL comfortably
        assert t_native < t_pil, (t_native, t_pil)


class TestShardReader:
    @needs_native
    def test_gather_matches_safetensors(self, tmp_path):
        rng = np.random.default_rng(0)
        lat = rng.standard_normal((50, 8, 4, 4)).astype(np.float32)
        lab = np.arange(50, dtype=np.int64)
        path = str(tmp_path / "shard.safetensors")
        save_file({"latents": lat, "labels": lab}, path)

        shard = NativeShard(path)
        assert shard.num_rows("latents") == 50
        idx = np.array([3, 17, 0, 49, 17])
        out = shard.gather("latents", idx)
        np.testing.assert_array_equal(out, lat[idx])
        labs = shard.gather("labels", idx)
        np.testing.assert_array_equal(labs.reshape(-1), lab[idx])
        shard.close()

    @needs_native
    def test_out_of_range_raises(self, tmp_path):
        lat = np.zeros((5, 2), np.float32)
        path = str(tmp_path / "s.safetensors")
        save_file({"latents": lat, "labels": np.zeros(5, np.int64)}, path)
        shard = NativeShard(path)
        with pytest.raises(IndexError):
            shard.gather("latents", np.array([99]))


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


class TestGatherDtypes:
    def test_int32_and_float32_not_confused(self, tmp_path):
        """gather's dtype comes from the safetensors header, not itemsize —
        an int32 tensor must not come back as a float32 bit-view."""
        pytest.importorskip("safetensors")
        from safetensors.numpy import save_file

        from ldmae_tpu.data.native_io import NativeShard, get_lib

        if get_lib() is None:
            pytest.skip("native lib unavailable")
        p = str(tmp_path / "s.safetensors")
        save_file(
            {
                "ints": np.arange(12, dtype=np.int32).reshape(4, 3),
                "floats": np.linspace(0, 1, 12, dtype=np.float32).reshape(4, 3),
            },
            p,
        )
        sh = NativeShard(p)
        ints = sh.gather("ints", np.array([0, 2]))
        floats = sh.gather("floats", np.array([1]))
        assert ints.dtype == np.int32
        np.testing.assert_array_equal(ints, [[0, 1, 2], [6, 7, 8]])
        assert floats.dtype == np.float32
        np.testing.assert_allclose(floats[0], np.linspace(0, 1, 12)[3:6], rtol=1e-6)

    def test_truncated_shard_fails_cleanly(self, tmp_path):
        from safetensors.numpy import save_file

        from ldmae_tpu.data.native_io import NativeShard, get_lib

        if get_lib() is None:
            pytest.skip("native lib unavailable")
        p = str(tmp_path / "t.safetensors")
        save_file({"x": np.zeros((4, 8), np.float32)}, p)
        data = open(p, "rb").read()
        # corrupt the 8-byte header-length field to a huge value
        open(p, "wb").write(b"\xff\xff\xff\xff\xff\xff\xff\x0f" + data[8:])
        with pytest.raises(OSError):
            NativeShard(p)
