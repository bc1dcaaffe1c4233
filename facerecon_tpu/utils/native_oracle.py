"""ctypes binding for the native C++ CPU rasterizer (native/raster_oracle.cc).

Builds the shared library on first use (g++, cached next to the source) and
falls back to the pure-numpy oracle if the toolchain is unavailable. Output
is bitwise-identical to facerecon_tpu.oracle.rasterize (same float32
operation order, FMA contraction disabled), ~100x faster at full resolution.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native",
    "raster_oracle.cc")
_LIB = os.path.join(os.path.dirname(_SRC), "libraster_oracle.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O2", "-ffp-contract=off", "-shared", "-fPIC",
                     _SRC, "-o", _LIB],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB)
            lib.rasterize_cpu.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.rasterize_cpu.restype = None
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def is_available() -> bool:
    return _load() is not None


def rasterize(verts_ndc: np.ndarray, faces: np.ndarray,
              height: int, width: int):
    """Same contract as oracle.rasterize; numpy fallback if no toolchain."""
    lib = _load()
    if lib is None:
        from facerecon_tpu import oracle
        return oracle.rasterize(verts_ndc, faces, height, width)
    verts = np.ascontiguousarray(verts_ndc, dtype=np.float32)
    faces = np.ascontiguousarray(faces, dtype=np.int32)
    tri_id = np.empty((height, width), dtype=np.int32)
    bary = np.empty((height, width, 3), dtype=np.float32)
    zbuf = np.empty((height, width), dtype=np.float32)
    lib.rasterize_cpu(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        verts.shape[0],
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        faces.shape[0], height, width,
        tri_id.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        bary.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        zbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return tri_id, bary, zbuf
