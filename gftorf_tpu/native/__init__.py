"""Native (C++) runtime components, loaded via ctypes.

The compute path is JAX/Pallas; these are the host-side native pieces
mirroring where the reference uses native code outside the GPU kernels:
the simple-knn scale-initialization query (simple_knn.cu) gets a
Morton-ordered OpenMP implementation here, used for large point clouds
at scene init (with the exact on-device jnp version as fallback).

The shared library builds on first use with g++ and is cached next to
the sources.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "_gftorf_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    src = os.path.join(_HERE, "knn.cpp")
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-o", _LIB_PATH, src,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(os.path.join(_HERE, "knn.cpp")):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.mean_knn_sq_dist.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.mean_knn_sq_dist.restype = None
            _lib = lib
            return _lib
        except OSError:
            _build_failed = True
            return None


def available() -> bool:
    return _load() is not None


def mean_knn_sq_dist_native(points: np.ndarray, k: int = 3,
                            window: int = 48) -> Optional[np.ndarray]:
    """Mean of the k smallest neighbor squared distances, or None if the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float32)
    n = pts.shape[0]
    out = np.empty((n,), np.float32)
    lib.mean_knn_sq_dist(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n), ctypes.c_int(k), ctypes.c_int(window),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
