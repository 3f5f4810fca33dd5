"""ctypes binding for the native point-cloud ops (libpointcloud_ops.so).

Builds lazily with ``make`` on first use if the shared library is missing
(g++ is part of the baked toolchain); callers fall back to the numpy/sklearn
paths in :mod:`cropnerf_tpu.counting.clustering` when unavailable.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libpointcloud_ops.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-s"], cwd=_DIR, check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    lib.voxel_downsample.restype = ctypes.c_int
    lib.voxel_downsample.argtypes = [f32p, ctypes.c_int, ctypes.c_float, f32p]
    lib.dbscan.restype = ctypes.c_int
    lib.dbscan.argtypes = [f32p, ctypes.c_int, ctypes.c_float, ctypes.c_int,
                           i32p]
    lib.statistical_outlier_removal.restype = None
    lib.statistical_outlier_removal.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float, u8p]
    lib.kmeans.restype = None
    lib.kmeans.argtypes = [f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                           ctypes.c_uint32, i32p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def voxel_downsample(points: np.ndarray, voxel_size: float) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty_like(pts)
    m = lib.voxel_downsample(pts, len(pts), voxel_size, out)
    return out[:m].copy()


def dbscan(points: np.ndarray, eps: float, min_points: int) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    labels = np.empty(len(pts), np.int32)
    lib.dbscan(pts, len(pts), eps, min_points, labels)
    return labels.astype(np.int64)


def statistical_outlier_removal(points: np.ndarray, nb_neighbors: int = 20,
                                std_ratio: float = 2.0) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    keep = np.empty(len(pts), np.uint8)
    lib.statistical_outlier_removal(pts, len(pts), nb_neighbors, std_ratio,
                                    keep)
    return np.where(keep > 0)[0]


def kmeans(points: np.ndarray, k: int, seed: int = 0,
           iters: int = 50) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    labels = np.zeros(len(pts), np.int32)
    lib.kmeans(pts, len(pts), k, iters, seed, labels)
    return labels.astype(np.int64)
