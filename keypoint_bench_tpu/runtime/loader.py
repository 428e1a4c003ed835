"""ctypes bindings for the native C++ prefetching loader (loader.cpp).

Builds the shared library on first use (g++, cached next to the source).
Falls back gracefully when no compiler is available: `native_available()`
gates use, and the datasets keep their pure-Python path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader.cpp")
_LIB = os.path.join(_HERE, "libkbt_loader.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", _LIB, _SRC, "-lpthread"],
            check=True, capture_output=True)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or \
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    lib = ctypes.CDLL(_LIB)
    lib.kbt_prefetcher_create.restype = ctypes.c_void_p
    lib.kbt_prefetcher_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.kbt_prefetcher_create_s2d.restype = ctypes.c_void_p
    lib.kbt_prefetcher_create_s2d.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.kbt_prefetcher_next.restype = ctypes.c_int64
    lib.kbt_prefetcher_next.argtypes = [ctypes.c_void_p,
                                        ctypes.POINTER(ctypes.c_float)]
    lib.kbt_prefetcher_destroy.argtypes = [ctypes.c_void_p]
    lib.kbt_load_pnm_resized.restype = ctypes.c_int
    lib.kbt_load_pnm_resized.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def load_pnm_resized(path: str, out_w: int, out_h: int) -> np.ndarray:
    """Decode a P5/P6 PNM and bilinearly resize to (out_h, out_w, 3) float32
    RGB in [0,1] (cv2.resize half-pixel convention)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable (no g++?)")
    out = np.empty((out_h, out_w, 3), np.float32)
    rc = lib.kbt_load_pnm_resized(
        path.encode(), out_w, out_h,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise IOError(f"failed to decode {path}")
    return out


class NativePrefetcher:
    """Ordered multi-threaded decode+resize pipeline over a path list.

    With s2d_block=b > 1 the frames come out directly in the space-to-depth
    block layout [out_h/b, out_w/b, b*b*3] (the Alike_s2d stem input —
    models/alike_s2d.host_s2d_images semantics), emitted for free during
    decode so the device graph never pays the layout transpose."""

    def __init__(self, paths, out_w: int, out_h: int, n_threads: int = 2,
                 capacity: int = 4, s2d_block: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable (no g++?)")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._n = len(paths)
        b = int(s2d_block)
        self._shape = (out_h // b, out_w // b, b * b * 3) if b > 1 \
            else (out_h, out_w, 3)
        self._handle = lib.kbt_prefetcher_create_s2d(
            arr, self._n, out_w, out_h, n_threads, capacity, b)
        if not self._handle:
            raise ValueError(
                f"prefetcher rejected config (size {out_w}x{out_h} not "
                f"divisible by s2d_block={b}?)")

    def __iter__(self):
        for _ in range(self._n):
            out = np.empty(self._shape, np.float32)
            idx = self._lib.kbt_prefetcher_next(
                self._handle, out.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_float)))
            if idx < 0:
                return
            yield idx, out

    def close(self):
        if self._handle:
            self._lib.kbt_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
