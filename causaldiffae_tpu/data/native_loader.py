"""ctypes bindings for the native C++ data-pipeline core.

Builds the packaged `causaldiffae_tpu/native/fastloader.cpp` on first use
(g++ -O3 -shared, cached next to the source, or under
~/.cache/causaldiffae_tpu when the install dir is read-only) and exposes:

- `gunzip_file` - zlib whole-file decompression (IDX archives)
- `gather_normalize` - multithreaded batch gather with fused
  uint8->float32 normalization
- `NativeBatchIterator` - a double-buffered prefetch loader: the next
  shuffled, normalized batch is assembled on C++ worker threads while the
  device is busy with the current step

Everything degrades gracefully to the numpy implementations in
`data/loaders.py` when a compiler is unavailable (`native_available()`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Dict, Iterator, Optional

import numpy as np

__all__ = ["native_available", "gunzip_file", "gather_normalize", "NativeBatchIterator"]

# The C++ source ships inside the wheel (pyproject package-data), so
# non-editable installs keep the native path too.
_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB = None
_LIB_ERR = None


def _build_dir() -> Path:
    """Build cache next to the source, or ~/.cache when that's read-only
    (site-packages installs on locked-down hosts)."""
    primary = _NATIVE_DIR / "build"
    try:
        primary.mkdir(parents=True, exist_ok=True)
        return primary
    except OSError:
        alt = Path.home() / ".cache" / "causaldiffae_tpu" / "native-build"
        alt.mkdir(parents=True, exist_ok=True)
        return alt


def _build_and_load():
    global _LIB, _LIB_ERR
    if _LIB is not None or _LIB_ERR is not None:
        return _LIB
    src = _NATIVE_DIR / "fastloader.cpp"
    try:
        so = _build_dir() / "libfastloader.so"
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", str(so), str(src), "-lz", "-lpthread"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(so))
        lib.fl_gunzip_file.restype = ctypes.c_int
        lib.fl_gunzip_file.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.fl_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        lib.fl_gather_u8_to_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.fl_loader_create.restype = ctypes.c_void_p
        lib.fl_loader_create.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_float, ctypes.c_float,
            ctypes.c_uint64, ctypes.c_int,
        ]
        lib.fl_loader_next.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.fl_loader_destroy.argtypes = [ctypes.c_void_p]
        _LIB = lib
    except Exception as e:  # pragma: no cover - compiler missing
        _LIB_ERR = e
    return _LIB


def native_available() -> bool:
    return _build_and_load() is not None


def gunzip_file(path: str) -> bytes:
    lib = _build_and_load()
    if lib is None:
        import gzip

        with gzip.open(path, "rb") as f:
            return f.read()
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = ctypes.c_int64()
    rc = lib.fl_gunzip_file(str(path).encode(), ctypes.byref(out), ctypes.byref(n))
    if rc != 0:
        raise IOError(f"fl_gunzip_file({path}) failed: {rc}")
    try:
        return ctypes.string_at(out, n.value)
    finally:
        lib.fl_free(out)


def gather_normalize(images_u8: np.ndarray, indices: np.ndarray,
                     scale: float = 1.0 / 255.0, offset: float = 0.0,
                     threads: int = 4) -> np.ndarray:
    """out[b] = images_u8[indices[b]].astype(f32) * scale + offset."""
    lib = _build_and_load()
    images_u8 = np.ascontiguousarray(images_u8, dtype=np.uint8)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    sample_elems = int(np.prod(images_u8.shape[1:]))
    out = np.empty((len(indices),) + images_u8.shape[1:], dtype=np.float32)
    if lib is None:
        np.multiply(images_u8[indices], np.float32(scale), out=out)
        out += np.float32(offset)
        return out
    lib.fl_gather_u8_to_f32(
        images_u8.ctypes.data, sample_elems, indices.ctypes.data, len(indices),
        scale, offset, out.ctypes.data, threads,
    )
    return out


class NativeBatchIterator:
    """Infinite shuffled batch iterator backed by the C++ prefetch loader.

    Keeps images as uint8 in host RAM (4x smaller than float32) and
    materializes normalized float32 batches on worker threads.
    """

    def __init__(self, images_u8: np.ndarray, batch_size: int,
                 c: Optional[np.ndarray] = None, y: Optional[np.ndarray] = None,
                 scale: float = 1.0 / 255.0, offset: float = 0.0,
                 seed: int = 0, threads: int = 4):
        lib = _build_and_load()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_LIB_ERR}")
        self._lib = lib
        self.images = np.ascontiguousarray(images_u8, dtype=np.uint8)
        self.c = None if c is None else np.ascontiguousarray(c, dtype=np.float32)
        self.y = None if y is None else np.ascontiguousarray(y, dtype=np.int64)
        self.batch_size = batch_size
        self.sample_shape = self.images.shape[1:]
        sample_elems = int(np.prod(self.sample_shape))
        self._handle = lib.fl_loader_create(
            self.images.ctypes.data, len(self.images), sample_elems,
            None if self.c is None else self.c.ctypes.data,
            0 if self.c is None else self.c.shape[1],
            None if self.y is None else self.y.ctypes.data,
            batch_size, scale, offset, seed, threads,
        )
        self._lock = threading.Lock()

    def __iter__(self):
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        img = np.empty((self.batch_size,) + self.sample_shape, dtype=np.float32)
        cb = None if self.c is None else np.empty(
            (self.batch_size, self.c.shape[1]), dtype=np.float32)
        yb = None if self.y is None else np.empty((self.batch_size,), dtype=np.int64)
        with self._lock:
            self._lib.fl_loader_next(
                self._handle, img.ctypes.data,
                None if cb is None else cb.ctypes.data,
                None if yb is None else yb.ctypes.data,
            )
        out = {"image": img}
        if cb is not None:
            out["c"] = cb
        if yb is not None:
            out["y"] = yb
        return out

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.fl_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
