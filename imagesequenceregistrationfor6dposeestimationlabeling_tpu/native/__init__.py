"""Native (C++) host-side kernels, built on demand with g++ + ctypes.

The reference's host-side heavy lifting lives in C++ libraries (PyMCubes,
OpenCV, Open3D — SURVEY.md §2b).  Device compute belongs to XLA/Pallas;
genuinely-host work (isosurface topology extraction) is native here too.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build() -> str | None:
    src = os.path.join(_HERE, "march_tets.cpp")
    out = os.path.join(_HERE, "libmarchtets.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return out
    except Exception:
        return None


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.march_tets.restype = ctypes.c_int64
        lib.march_tets.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _LIB = lib
        return _LIB


def march_tets_native(density: np.ndarray, threshold: float):
    """Returns (verts, tris) or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    density = np.ascontiguousarray(density, np.float32)
    R = density.shape[0]
    cap_v, cap_t = 1 << 20, 1 << 21
    for _ in range(4):
        verts = np.empty((cap_v, 3), np.float32)
        tris = np.empty((cap_t, 3), np.int64)
        n_verts = ctypes.c_int64(0)
        nt = lib.march_tets(
            density.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            R,
            ctypes.c_float(threshold),
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            cap_v,
            cap_t,
            ctypes.byref(n_verts),
        )
        if nt >= 0:
            return verts[: n_verts.value].copy(), tris[:nt].copy()
        cap_v *= 4
        cap_t *= 4
    return None
