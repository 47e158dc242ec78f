"""Dynamic time warping (replaces the fastdtw dependency of
`objective_measure.py`). Exact O(nm) DP; the accumulation/backtrack hot loop
runs in the native C++ core (`native/dtw.cpp`, built on first use and loaded
via ctypes) with a pure-numpy fallback."""
from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

__all__ = ["dtw_path", "dtw_distance"]

_lib = None
_lib_tried = False


def _native_lib():
    """Lazily build + load the C++ DTW core; None when unavailable."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        import sys
        native_dir = Path(__file__).resolve().parents[2] / "native"
        sys.path.insert(0, str(native_dir))
        try:
            from build import build_dtw  # type: ignore
        finally:
            sys.path.pop(0)
        so = build_dtw()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        dp = ctypes.POINTER(ctypes.c_double)
        ip = ctypes.POINTER(ctypes.c_int64)
        lib.dtw_accumulate.argtypes = [dp, ctypes.c_int64, ctypes.c_int64, dp]
        lib.dtw_accumulate.restype = None
        lib.dtw_backtrack.argtypes = [dp, ctypes.c_int64, ctypes.c_int64,
                                      ip, ip]
        lib.dtw_backtrack.restype = ctypes.c_int64
        _lib = lib
    except Exception:  # noqa: BLE001 — fall back to numpy silently
        _lib = None
    return _lib


def _cost_matrix(x, y):
    x = np.atleast_2d(np.asarray(x, np.float64))
    y = np.atleast_2d(np.asarray(y, np.float64))
    # pairwise euclidean
    x2 = np.sum(x ** 2, axis=1)[:, None]
    y2 = np.sum(y ** 2, axis=1)[None, :]
    d2 = np.maximum(x2 + y2 - 2.0 * (x @ y.T), 0.0)
    return np.sqrt(d2)


def dtw_path(x, y, band: int | None = None):
    """Align sequences x (n, d) and y (m, d); returns (distance, path) where
    path is a list of (i, j) index pairs (like fastdtw's output)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    if x.ndim == 1:
        x = x[:, None]
    if y.ndim == 1:
        y = y[:, None]
    n, m = x.shape[0], y.shape[0]
    cost = _cost_matrix(x, y)
    if band is not None:
        mask = np.abs(np.arange(n)[:, None] - np.arange(m)[None, :]
                      * (n / m)) > band
        cost = np.where(mask, np.inf, cost)

    lib = _native_lib()
    if lib is not None and band is None:
        cost = np.ascontiguousarray(cost, np.float64)
        acc = np.empty((n + 1, m + 1), np.float64)
        dp = ctypes.POINTER(ctypes.c_double)
        lib.dtw_accumulate(cost.ctypes.data_as(dp), n, m,
                           acc.ctypes.data_as(dp))
        pi = np.empty(n + m, np.int64)
        pj = np.empty(n + m, np.int64)
        ip = ctypes.POINTER(ctypes.c_int64)
        length = lib.dtw_backtrack(acc.ctypes.data_as(dp), n, m,
                                   pi.ctypes.data_as(ip),
                                   pj.ctypes.data_as(ip))
        path = list(zip(pi[:length][::-1].tolist(),
                        pj[:length][::-1].tolist()))
        return float(acc[n, m]), path

    acc = np.full((n + 1, m + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, n + 1):
        prev = acc[i - 1]
        cur = acc[i]
        c = cost[i - 1]
        # cur[j] = c[j-1] + min(prev[j], prev[j-1], cur[j-1]) — sequential in j
        for j in range(1, m + 1):
            cur[j] = c[j - 1] + min(prev[j], prev[j - 1], cur[j - 1])
    # backtrack
    path = []
    i, j = n, m
    while i > 0 and j > 0:
        path.append((i - 1, j - 1))
        moves = [(acc[i - 1, j - 1], i - 1, j - 1),
                 (acc[i - 1, j], i - 1, j),
                 (acc[i, j - 1], i, j - 1)]
        _, i, j = min(moves)
    path.reverse()
    return float(acc[n, m]), path


def dtw_distance(x, y, band: int | None = None) -> float:
    return dtw_path(x, y, band)[0]
