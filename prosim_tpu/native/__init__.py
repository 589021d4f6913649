"""Native (C++) host-side data engine.

The device side is all XLA; the host side feeds it. At >1000 compiled scene
rollouts/sec per chip, the Python formatter becomes the bottleneck (profiled:
~95% of format_scene inside the per-lane vectorization loop), so the hot
loops live in a small C++ library called through ctypes.

The library builds on first use with g++ (cached next to this file); every
entry point has a pure-numpy fallback so the framework works without a
toolchain.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "lane_vectorize.cpp")
_LIB = os.path.join(_HERE, "liblanevec.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
                    check=True,
                    capture_output=True,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.vectorize_lanes.restype = ctypes.c_int
        lib.vectorize_lanes.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def vectorize_lanes_native(
    pts: np.ndarray,       # [P, 2] float64 world points (parts concatenated)
    offsets: np.ndarray,   # [K+1] int64
    types: np.ndarray,     # [K] float32
    tls: np.ndarray,       # [K] float32
    rates: np.ndarray,     # [K] int64
    center_xy,
    center_h: float,
    map_range: float,
    max_lane_pts: int,
):
    """Returns [M, max_lane_pts-1, 6] float32 chunks, or None if the native
    library is unavailable."""
    lib = _load()
    if lib is None:
        return None

    pts = np.ascontiguousarray(pts, np.float64)
    offsets = np.ascontiguousarray(offsets, np.int64)
    types = np.ascontiguousarray(types, np.float32)
    tls = np.ascontiguousarray(tls, np.float32)
    rates = np.ascontiguousarray(rates, np.int64)

    max_chunks = int(len(pts) // max(1, max_lane_pts) + len(offsets) + 8)
    while True:
        out = np.zeros((max_chunks, max_lane_pts - 1, 6), np.float32)
        n = lib.vectorize_lanes(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(pts),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(offsets) - 1,
            types.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            tls.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            float(center_xy[0]), float(center_xy[1]), float(center_h),
            float(map_range), int(max_lane_pts),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_chunks,
        )
        if n >= 0:
            return out[:n]
        max_chunks = -n * 2  # undersized: grow and retry
