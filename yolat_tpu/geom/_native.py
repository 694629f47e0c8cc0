"""ctypes binding for the native geometry kernel (csrc/geomcore.cpp).

Compiled lazily with the system C++ compiler and cached next to the source;
every entry point has a numpy fallback, so the package works without a
toolchain (pure-Python wheel semantics).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False


def _csrc_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "csrc")


def load_library():
    """Compile (once) and load libgeomcore.so; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        src = os.path.join(_csrc_dir(), "geomcore.cpp")
        so = os.path.join(_csrc_dir(), "libgeomcore.so")
        try:
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(so)
            lib.angle_stats.restype = ctypes.c_long
            lib.angle_stats.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.c_long,
                ctypes.POINTER(ctypes.c_double), ctypes.c_long,
                ctypes.c_double, ctypes.POINTER(ctypes.c_double),
            ]
            lib.rect_membership.restype = None
            lib.rect_membership.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_long, ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def angle_stats_native(edges_local: np.ndarray, pos_local: np.ndarray,
                       th: float):
    """Returns the stats dict of proposals._angle_stats or None (no pairs /
    library unavailable -> caller falls back)."""
    lib = load_library()
    if lib is None:
        return None
    edges = np.ascontiguousarray(edges_local, dtype=np.int64)
    pos = np.ascontiguousarray(pos_local, dtype=np.float64)
    out = np.zeros(7, dtype=np.float64)
    n = lib.angle_stats(
        edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(edges),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(pos),
        float(th), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if n == 0:
        return {"empty": True}
    return dict(
        n_90=int(out[0]), n_less90=int(out[1]), n_more90=int(out[2]),
        mean=out[3], max=out[4], min=out[5], std=out[6],
    )
