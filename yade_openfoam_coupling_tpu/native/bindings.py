"""ctypes bindings for the native runtime (libyofc_native.so).

Lazily builds the shared library with the in-tree Makefile on first use
(the role wmake/Allwmake plays for the reference, `/root/reference/Allwmake`).
Pure-Python fallbacks exist for every entry point, so environments without
a toolchain still work — the native path is a host-side speedup, never a
correctness requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libyofc_native.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not _LIB_PATH.exists():
            try:
                subprocess.run(
                    ["make", "-C", str(_DIR)], check=True,
                    capture_output=True, timeout=120,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            _build_failed = True
            return None

        lib.yofc_tree_build.restype = ctypes.c_void_p
        lib.yofc_tree_build.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
        ]
        lib.yofc_tree_free.argtypes = [ctypes.c_void_p]
        lib.yofc_tree_nearest.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
        ]
        lib.yofc_tree_range.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
            ctypes.c_double, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.yofc_bin_points.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class MeshTree:
    """k-d tree over a point cloud (cell centres): the C2 capability.

    Native when the toolchain is present, numpy brute force otherwise."""

    def __init__(self, points: np.ndarray):
        self.points = np.ascontiguousarray(points, np.float64).reshape(-1, 3)
        self._lib = _load()
        self._handle = None
        if self._lib is not None:
            self._handle = ctypes.c_void_p(self._lib.yofc_tree_build(
                _dptr(self.points), np.int32(self.points.shape[0])
            ))

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.yofc_tree_free(self._handle)

    def nearest(self, queries: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        q = np.ascontiguousarray(queries, np.float64).reshape(-1, 3)
        nq = q.shape[0]
        if self._handle is not None:
            idx = np.empty(nq, np.int32)
            d2 = np.empty(nq, np.float64)
            self._lib.yofc_tree_nearest(
                self._handle, _dptr(q), np.int32(nq),
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                d2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            )
            return idx, d2
        d2 = ((q[:, None, :] - self.points[None]) ** 2).sum(-1)
        idx = d2.argmin(1).astype(np.int32)
        return idx, d2[np.arange(nq), idx]

    def range_query(self, queries: np.ndarray, radius: float, cap: int = 64):
        q = np.ascontiguousarray(queries, np.float64).reshape(-1, 3)
        nq = q.shape[0]
        if self._handle is not None:
            idx = np.empty((nq, cap), np.int32)
            n = np.empty(nq, np.int32)
            self._lib.yofc_tree_range(
                self._handle, _dptr(q), np.int32(nq),
                ctypes.c_double(radius), np.int32(cap),
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                n.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            return idx, n
        d2 = ((q[:, None, :] - self.points[None]) ** 2).sum(-1)
        idx = np.full((nq, cap), -1, np.int32)
        n = np.zeros(nq, np.int32)
        for i in range(nq):
            hits = np.nonzero(d2[i] <= radius * radius)[0][:cap]
            idx[i, : len(hits)] = hits
            n[i] = len(hits)
        return idx, n


def bin_points(points: np.ndarray, origin, spacing, dims):
    """CSR spatial binning on the host (particle-set preprocessing).

    Returns (cell_of (n,), order (n,), cell_start (ncell+2,)) with the
    out-of-domain scrap bin at index ncell."""
    p = np.ascontiguousarray(points, np.float64).reshape(-1, 3)
    n = p.shape[0]
    dims = np.asarray(dims, np.int32)
    ncell = int(dims[0]) * int(dims[1]) * int(dims[2])
    lib = _load()
    if lib is not None:
        cell_of = np.empty(n, np.int32)
        order = np.empty(n, np.int64)
        cell_start = np.empty(ncell + 2, np.int64)
        o = np.ascontiguousarray(origin, np.float64)
        s = np.ascontiguousarray(spacing, np.float64)
        lib.yofc_bin_points(
            _dptr(p), np.int64(n), _dptr(o), _dptr(s),
            dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cell_of.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            cell_start.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return cell_of, order, cell_start
    # numpy fallback
    ijk = np.floor((p - np.asarray(origin)) / np.asarray(spacing)).astype(np.int64)
    ok = ((ijk >= 0) & (ijk < dims)).all(1)
    flat = (ijk[:, 0] * dims[1] + ijk[:, 1]) * dims[2] + ijk[:, 2]
    flat = np.where(ok, np.clip(flat, 0, ncell - 1), ncell).astype(np.int32)
    order = np.argsort(flat, kind="stable").astype(np.int64)
    counts = np.bincount(flat, minlength=ncell + 1)
    cell_start = np.zeros(ncell + 2, np.int64)
    cell_start[1:] = np.cumsum(counts)
    return flat, order, cell_start
