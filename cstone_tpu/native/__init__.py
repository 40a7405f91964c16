"""Native host-side runtime: C++ kernels for host buffers (IO, initial
conditions, checkpoint tooling) loaded via ctypes.

The library is compiled from csrc/cstone_host.cpp with g++ on first use and
cached next to the source. All functions are validated against the JAX
implementations in tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

import numpy as np

__all__ = ["hilbert_encode", "compute_octree_host", "available"]

_HERE = pathlib.Path(__file__).parent
_SRC = _HERE / "csrc" / "cstone_host.cpp"
_LIB = _HERE / "csrc" / "libcstone_host.so"
_lock = threading.Lock()
_lib = None


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++20", "-shared", "-fPIC",
        "-pthread", "-o", str(_LIB), str(_SRC),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            return None
        lib.cst_hilbert_encode_u64.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.cst_hilbert_encode_u32.argtypes = lib.cst_hilbert_encode_u64.argtypes
        lib.cst_compute_octree_u64.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_uint32, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.cst_compute_octree_u64.restype = ctypes.c_int64
        lib.cst_compute_octree_u32.argtypes = lib.cst_compute_octree_u64.argtypes
        lib.cst_compute_octree_u32.restype = ctypes.c_int64
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def hilbert_encode(x: np.ndarray, y: np.ndarray, z: np.ndarray,
                   box_limits, key_dtype=np.uint64) -> np.ndarray:
    """Host-side Hilbert encode of float32 coordinate arrays."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    x = np.ascontiguousarray(x, dtype=np.float32)
    y = np.ascontiguousarray(y, dtype=np.float32)
    z = np.ascontiguousarray(z, dtype=np.float32)
    lims = np.ascontiguousarray(box_limits, dtype=np.float32)
    n = x.shape[0]
    dt = np.dtype(key_dtype)
    out = np.empty(n, dtype=dt)
    fn = lib.cst_hilbert_encode_u64 if dt == np.uint64 else lib.cst_hilbert_encode_u32
    fn(x.ctypes.data, y.ctypes.data, z.ctypes.data, n, lims.ctypes.data,
       out.ctypes.data)
    return out


def compute_octree_host(sorted_codes: np.ndarray, bucket_size: int,
                        capacity: int | None = None):
    """Host-side cornerstone tree build from sorted keys.

    Returns (tree_keys (n_nodes+1,), counts (n_nodes,)).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    dt = sorted_codes.dtype
    n = sorted_codes.shape[0]
    if capacity is None:
        capacity = max(4096, 3 * n // max(1, bucket_size) + 4096)
    codes = np.ascontiguousarray(sorted_codes)
    tree = np.empty(capacity + 1, dtype=dt)
    counts = np.empty(capacity, dtype=np.uint32)
    fn = (lib.cst_compute_octree_u64 if dt == np.dtype(np.uint64)
          else lib.cst_compute_octree_u32)
    n_nodes = fn(codes.ctypes.data, n, bucket_size, tree.ctypes.data,
                 counts.ctypes.data, capacity)
    if n_nodes < 0:
        raise RuntimeError(f"octree capacity too small, need {-n_nodes}")
    return tree[: n_nodes + 1].copy(), counts[:n_nodes].copy()
