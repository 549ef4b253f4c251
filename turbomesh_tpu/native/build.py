"""On-demand build + ctypes loading of the native kernels.

Compiles winslow.cpp with g++ -O3 -fopenmp into a shared library cached
next to the sources; callers fall back to NumPy when the toolchain or the
library is unavailable (e.g. wasm-like restricted environments).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

log = logging.getLogger("turbomesh.native")

_lib = None
_tried = False


def _build(src: str, out: str) -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-std=c++17", src, "-o", out,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # noqa: BLE001 — any failure means fallback
        log.info("native build failed (%s); using NumPy fallback", e)
        return False


def load_native():
    """Return the loaded ctypes library, or None (NumPy fallback)."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True

    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "winslow.cpp")
    out = os.path.join(here, "libturbomesh_native.so")

    if (not os.path.exists(out)
            or os.path.getmtime(out) < os.path.getmtime(src)):
        if not _build(src, out):
            return None
    try:
        lib = ctypes.CDLL(out)
    except OSError as e:
        log.info("native load failed (%s); using NumPy fallback", e)
        return None

    lib.winslow_interior_apply.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.c_int64,
    ]
    lib.winslow_interior_apply.restype = None
    _lib = lib
    return _lib


def winslow_interior_apply(base, cf, v, out):
    """C++ interior stencil application for one (ni, nj, 2) block; returns
    False if the native library is unavailable (caller uses NumPy)."""
    import numpy as np

    lib = load_native()
    if lib is None:
        return False
    for a in (base, cf, v, out):
        assert a.dtype == np.float64 and a.flags["C_CONTIGUOUS"]
    ni, nj = base.shape[:2]
    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    lib.winslow_interior_apply(p(base), p(cf), p(v), p(out), ni, nj)
    return True
