"""Native (C++) components, loaded via ctypes with pure-numpy fallbacks.

The reference's native runtime pieces (OptiX BVH build, thrust sort) map to:
* bvh_builder.cpp — binned-SAH BVH build (host, once per scene)
The shared library compiles on first use (g++ -O3); if no toolchain is
available the numpy fallback in accel.bvh takes over.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "libbvh_builder.so"
_lib = None
_build_failed = False


def _compile() -> bool:
    src = _HERE / "bvh_builder.cpp"
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(src), "-o", str(_LIB_PATH)],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """ctypes handle to the native builder, or None if unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not _LIB_PATH.exists():
        if not _compile():
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _build_failed = True
        return None
    lib.build_bvh.restype = ctypes.c_int
    lib.build_bvh.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    _lib = lib
    return _lib


def build_bvh_native(prim_min: np.ndarray, prim_max: np.ndarray,
                     centroid: np.ndarray, leaf_size: int):
    """Run the C++ builder. Returns (nodes_min, nodes_max, nodes_a, nodes_b,
    order) or None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = prim_min.shape[0]
    max_nodes = max(4 * n, 64)
    pmn = np.ascontiguousarray(prim_min, np.float32)
    pmx = np.ascontiguousarray(prim_max, np.float32)
    cen = np.ascontiguousarray(centroid, np.float32)
    nmn = np.empty((max_nodes, 3), np.float32)
    nmx = np.empty((max_nodes, 3), np.float32)
    na = np.empty((max_nodes,), np.int32)
    nb = np.empty((max_nodes,), np.int32)
    order = np.empty((n,), np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    count = lib.build_bvh(
        pmn.ctypes.data_as(fp), pmx.ctypes.data_as(fp),
        cen.ctypes.data_as(fp), n, leaf_size,
        nmn.ctypes.data_as(fp), nmx.ctypes.data_as(fp),
        na.ctypes.data_as(ip), nb.ctypes.data_as(ip),
        order.ctypes.data_as(ip), max_nodes)
    if count <= 0:
        return None
    return (nmn[:count], nmx[:count], na[:count], nb[:count], order)
