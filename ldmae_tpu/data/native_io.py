"""ctypes bindings for the native C++ IO data-plane (native/ldmae_io.cpp).

Replaces the Python hot host paths with native threads:
  * ``write_pngs`` — batch PNG encoding for the 50k-image FID dumps
    (inference.py:294-298 writes these with PIL per-image)
  * ``NativeShard`` — mmap safetensors reader with threaded row gather
    (img_latent_dataset.py re-opens files per item in DataLoader workers)

The library is compiled on first use with g++ (cached under native/); all
callers fall back to the pure-Python paths when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "ldmae_io.cpp"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "libldmae_io.so"))

_lib = None
_lock = threading.Lock()


_build_failed = False


def _build() -> Optional[str]:
    global _build_failed
    if _build_failed:
        # don't re-run a failing g++ on every write_pngs call
        return None
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                _SRC, "-lz", "-lpthread", "-o", _SO,
            ],
            check=True,
            capture_output=True,
        )
        return _SO
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        import warnings

        warnings.warn(f"native IO build failed ({e}); using Python fallbacks")
        _build_failed = True
        return None


def get_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.png_encode_batch.restype = ctypes.c_int
        lib.png_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ]
        lib.shard_open.restype = ctypes.c_void_p
        lib.shard_open.argtypes = [ctypes.c_char_p]
        lib.shard_close.argtypes = [ctypes.c_void_p]
        lib.shard_num_rows.restype = ctypes.c_int64
        lib.shard_num_rows.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.shard_row_bytes.restype = ctypes.c_int64
        lib.shard_row_bytes.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.shard_gather.restype = ctypes.c_int64
        lib.shard_gather.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def write_pngs(
    images: np.ndarray, paths: List[str], level: int = 1, num_threads: int = 0
) -> int:
    """images: (N, H, W, 3) uint8 contiguous → N PNG files. Returns count
    written. Falls back to PIL when the native lib is unavailable."""
    lib = get_lib()
    images = np.ascontiguousarray(images, dtype=np.uint8)
    n, h, w, c = images.shape
    assert c == 3
    if lib is None:
        from PIL import Image

        for img, p in zip(images, paths):
            Image.fromarray(img).save(p)
        return n
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    ok = lib.png_encode_batch(
        images.ctypes.data_as(ctypes.c_void_p), n, h, w, arr, level, num_threads
    )
    if ok != n:
        # the C side skips files whose open/write fails (e.g. disk full);
        # surface that instead of silently finishing with missing PNGs
        raise OSError(f"native PNG writer wrote {ok}/{n} files (disk full or "
                      f"unwritable path?)")
    return ok


_DTYPES = {
    "F32": np.float32,
    "F16": np.float16,
    "BF16": None,  # viewed as uint16; caller converts
    "I64": np.int64,
    "I32": np.int32,
    "U8": np.uint8,
}


class NativeShard:
    """mmap safetensors reader. Row-gather returns (n, *trailing_shape)."""

    def __init__(self, path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native IO unavailable")
        self._lib = lib
        self._handle = lib.shard_open(path.encode())
        if not self._handle:
            raise OSError(f"failed to open shard {path}")
        self.path = path
        # shapes/dtypes via safetensors' own python header parse (cheap)
        from safetensors import safe_open

        self.meta = {}
        self.dtypes = {}
        with safe_open(path, framework="numpy", device="cpu") as f:
            for k in f.keys():
                sl = f.get_slice(k)
                self.meta[k] = tuple(sl.get_shape())
                dt = str(sl.get_dtype())
                if dt not in _DTYPES:
                    raise TypeError(f"unsupported safetensors dtype {dt!r} for {k}")
                self.dtypes[k] = dt

    def num_rows(self, name: str) -> int:
        return int(self._lib.shard_num_rows(self._handle, name.encode()))

    def gather(self, name: str, indices: np.ndarray, num_threads: int = 8) -> np.ndarray:
        indices = np.ascontiguousarray(indices, dtype=np.int64)
        row_bytes = int(self._lib.shard_row_bytes(self._handle, name.encode()))
        out = np.empty((len(indices), row_bytes), dtype=np.uint8)
        copied = self._lib.shard_gather(
            self._handle,
            name.encode(),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(indices),
            out.ctypes.data_as(ctypes.c_void_p),
            num_threads,
        )
        if copied != len(indices):
            raise IndexError(f"gather copied {copied}/{len(indices)} rows")
        shape = self.meta[name]
        trailing = shape[1:]
        # dtype from the safetensors header, NOT itemsize (itemsize alone
        # cannot distinguish I32/F32, BF16/F16/U16, ...)
        dtype = _DTYPES[self.dtypes[name]]
        if dtype is None:  # BF16: no numpy dtype — view u16, caller converts
            return out.view(np.uint16).reshape(len(indices), *trailing)
        return out.view(dtype).reshape(len(indices), *trailing)

    def close(self):
        if self._handle:
            self._lib.shard_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
