"""ctypes bindings for the native C++ helpers in `native/`.

Builds `libfourdgs_native.so` on first use (cold-path tolerance: g++ is a
build-time dependency only). Falls back to the pure-numpy implementations
in `ops.knn` when a compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so = os.path.join(_NATIVE_DIR, "libfourdgs_native.so")
        if not os.path.exists(so):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               check=True, capture_output=True)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(so)
            lib.fourdgs_knn3.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
            lib.fourdgs_knn3.restype = None
            _LIB = lib
        except OSError:
            return None
        return _LIB


def available() -> bool:
    return _load() is not None


def mean_dist2_to_3nn(points: np.ndarray, window: int = 48,
                      threads: int = 0) -> np.ndarray:
    """(N,) mean squared distance to the 3 nearest neighbors. Native
    multithreaded path when buildable, numpy fallback otherwise
    (reference `simple_knn._C.distCUDA2`, `gaussian_model.py:274`)."""
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    if lib is None:
        from .ops.knn import mean_dist2_to_3nn as np_fallback
        return np_fallback(pts, window=window)
    out = np.empty(pts.shape[0], np.float32)
    lib.fourdgs_knn3(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(pts.shape[0]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(window), ctypes.c_int(threads))
    return out
