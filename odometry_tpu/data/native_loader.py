"""ctypes bindings for the native C++ PNG decode / prefetch runtime.

Builds ``odometry_tpu/native/png_loader.cpp`` with g++ on first use (cached
as a .so next to the source). Falls back cleanly: callers can catch
``NativeLoaderUnavailable`` and use the PIL path (data/kitti.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "png_loader.cpp")
_SO = os.path.join(_NATIVE_DIR, "libotpu_png.so")
_lock = threading.Lock()
_lib = None


class NativeLoaderUnavailable(RuntimeError):
    pass


def _build() -> str:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        os.path.abspath(_SRC), "-o", os.path.abspath(_SO), "-lz",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", str(e))
        raise NativeLoaderUnavailable(f"native build failed: {detail}")
    return _SO


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        so = _SO
        src_mtime = os.path.getmtime(_SRC)
        if not os.path.exists(so) or os.path.getmtime(so) < src_mtime:
            so = _build()
        lib = ctypes.CDLL(os.path.abspath(so))
        lib.otpu_png_read_gray.restype = ctypes.c_int
        lib.otpu_png_read_gray.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.otpu_loader_open.restype = ctypes.c_void_p
        lib.otpu_loader_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.otpu_loader_next.restype = ctypes.c_int
        lib.otpu_loader_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.otpu_loader_close.restype = None
        lib.otpu_loader_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def png_read_gray(path: str) -> np.ndarray:
    """Decode one PNG to float32 grayscale with the native decoder."""
    lib = _load()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.otpu_png_read_gray(path.encode(), None, ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise IOError(f"native PNG decode failed: {path}")
    out = np.empty((h.value, w.value), np.float32)
    rc = lib.otpu_png_read_gray(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(w),
        ctypes.byref(h),
    )
    if rc != 0:
        raise IOError(f"native PNG decode failed: {path}")
    return out


class StereoPrefetcher:
    """Background-threaded stereo pair stream (decode overlaps compute)."""

    def __init__(
        self,
        left_paths: Sequence[str],
        right_paths: Sequence[str],
        height: int,
        width: int,
        prefetch: int = 4,
        num_threads: int = 2,
    ):
        if len(left_paths) != len(right_paths):
            raise ValueError("left/right path counts differ")
        lib = _load()
        self._lib = lib
        self._n = len(left_paths)
        self._shape = (height, width)
        self._larr = (ctypes.c_char_p * self._n)(*[p.encode() for p in left_paths])
        self._rarr = (ctypes.c_char_p * self._n)(*[p.encode() for p in right_paths])
        self._handle = lib.otpu_loader_open(self._larr, self._rarr, self._n,
                                            prefetch, num_threads)
        if not self._handle:
            raise NativeLoaderUnavailable("loader_open failed")

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        try:
            while True:
                left = np.empty(self._shape, np.float32)
                right = np.empty(self._shape, np.float32)
                rc = self._lib.otpu_loader_next(
                    self._handle,
                    left.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    right.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                )
                if rc == 1:
                    return
                if rc != 0:
                    raise IOError("native decode error in prefetcher")
                yield left, right
        finally:
            self.close()

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.otpu_loader_close(self._handle)
            self._handle = None
