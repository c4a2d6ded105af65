"""ctypes loader for the native helper library (builds on first use)."""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libf3dgs_native.so")
_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.knn_mean_sq_dist.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.knn_mean_sq_dist.restype = ctypes.c_int
        lib.colmap_scan_points3d.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_double)]
        lib.colmap_scan_points3d.restype = ctypes.c_int
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def knn_mean_sq_dist(points: np.ndarray) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty(pts.shape[0], np.float32)
    rc = lib.knn_mean_sq_dist(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pts.shape[0], out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise RuntimeError("native knn failed")
    return out


def colmap_scan_points3d(data: bytes, n: int):
    lib = _load()
    buf = np.frombuffer(data, np.uint8)
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty(n, np.float64)
    rc = lib.colmap_scan_points3d(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size, n,
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        err.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        raise RuntimeError("points3D.bin scan failed (truncated file?)")
    return xyz, rgb, err
