"""ctypes bindings for the native C++ loader (native/dss_loader.cpp).

Builds the shared library on first use (g++, cached next to the source) and
falls back cleanly when the toolchain or libpng is unavailable — callers
check `available()`.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libdss_loader.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "dss_loader.cpp")

_lib = None
_lock = threading.Lock()


def _build() -> Optional[str]:
    if not os.path.exists(_SRC_PATH):
        return None
    if os.path.exists(_SO_PATH) and os.path.getmtime(_SO_PATH) >= os.path.getmtime(_SRC_PATH):
        return _SO_PATH
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        _SRC_PATH, "-o", _SO_PATH, "-lpng", "-lz", "-pthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    return _SO_PATH


def _get_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.dss_pool_create.restype = ctypes.c_void_p
        lib.dss_pool_create.argtypes = [ctypes.c_int]
        lib.dss_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.dss_decode_png_f32.restype = ctypes.c_int
        lib.dss_decode_png_f32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.dss_load_images_f32.restype = ctypes.c_int
        lib.dss_load_images_f32.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.dss_prefetch_create.restype = ctypes.c_void_p
        lib.dss_prefetch_create.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ]
        lib.dss_prefetch_destroy.argtypes = [ctypes.c_void_p]
        lib.dss_prefetch_submit.restype = ctypes.c_int
        lib.dss_prefetch_submit.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ]
        lib.dss_prefetch_get.restype = ctypes.c_int
        lib.dss_prefetch_get.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _get_lib() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativePool:
    def __init__(self, n_threads: int = 0):
        self.lib = _get_lib()
        if self.lib is None:
            raise RuntimeError("native loader unavailable")
        self.handle = self.lib.dss_pool_create(n_threads)

    def load_images(self, paths: List[str], h: int, w: int, c: int) -> np.ndarray:
        """Parallel PNG decode → (N, h, w, c) float32 in [0, 1]."""
        n = len(paths)
        out = np.empty((n, h, w, c), np.float32)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        failures = self.lib.dss_load_images_f32(
            self.handle, arr, n, _fptr(out), h, w, c
        )
        if failures:
            raise IOError(f"native loader: {failures} decode failures")
        return out

    def __del__(self):
        if getattr(self, "handle", None) and self.lib is not None:
            self.lib.dss_pool_destroy(self.handle)
            self.handle = None


class BatchPrefetcher:
    """Double-buffered async batch assembly over in-memory (V,H,W,·) arrays:
    submit(indices) starts background copy; get() blocks and returns the
    assembled (B,H,W,3)/(B,H,W) batch while the next submit can overlap with
    device compute."""

    def __init__(self, pool: NativePool, images: np.ndarray, masks: np.ndarray,
                 batch: int):
        self.lib = pool.lib
        self.images = np.ascontiguousarray(images, np.float32)
        self.masks = np.ascontiguousarray(masks, np.float32)
        v, h, w = self.masks.shape
        self.shape = (batch, h, w)
        self.handle = self.lib.dss_prefetch_create(
            pool.handle, _fptr(self.images), _fptr(self.masks), v, h, w, batch
        )

    def submit(self, indices: np.ndarray) -> None:
        idx = np.ascontiguousarray(indices, np.int64)
        rc = self.lib.dss_prefetch_submit(
            self.handle, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(idx)
        )
        if rc:
            raise RuntimeError("prefetch submit while busy or wrong batch size")

    def get(self) -> Tuple[np.ndarray, np.ndarray]:
        b, h, w = self.shape
        img = np.empty((b, h, w, 3), np.float32)
        msk = np.empty((b, h, w), np.float32)
        self.lib.dss_prefetch_get(self.handle, _fptr(img), _fptr(msk))
        return img, msk

    def __del__(self):
        if getattr(self, "handle", None) is not None and self.lib is not None:
            self.lib.dss_prefetch_destroy(self.handle)
            self.handle = None
