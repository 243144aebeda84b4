"""Native (C++) components, built on demand with the system toolchain.

Currently: the mesh rasterizer (rasterizer.cpp) — the visualization-path
native component (the reference relies on OpenDR's C++/OpenGL renderer
for this role). Loaded through ctypes; callers fall back to the numpy
implementation when no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rasterizer.cpp")
_LIB = os.path.join(_DIR, "librasterizer.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_rasterizer() -> Optional[ctypes.CDLL]:
    """The compiled rasterizer library, building it on first use.
    Returns None when compilation is unavailable (callers fall back)."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not _build():
            _build_failed = True
            return None
        lib = ctypes.CDLL(_LIB)
        lib.rasterize_mesh.restype = None
        lib.rasterize_mesh.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # verts
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),  # faces
            ctypes.c_int64,
            ctypes.c_int64,  # height
            ctypes.c_int64,  # width
            ctypes.c_double,  # focal
            ctypes.c_double,  # cx
            ctypes.c_double,  # cy
            ctypes.POINTER(ctypes.c_double),  # color
            ctypes.POINTER(ctypes.c_double),  # light_dir
            ctypes.c_double,  # ambient
            ctypes.POINTER(ctypes.c_double),  # img
            ctypes.POINTER(ctypes.c_uint8),  # mask
        ]
        _lib = lib
        return _lib


def rasterize_native(
    verts: np.ndarray,
    faces: np.ndarray,
    height: int,
    width: int,
    focal: float,
    center: np.ndarray,
    color: np.ndarray,
    light_dir: np.ndarray,
    ambient: float,
    background: Optional[np.ndarray] = None,
):
    """ctypes front-end mirroring viz.renderer.rasterize_mesh's contract.
    Returns (img float64 [0,1], mask bool) or None when the native library
    is unavailable."""
    lib = get_rasterizer()
    if lib is None:
        return None
    verts = np.ascontiguousarray(verts, np.float64)
    faces = np.ascontiguousarray(faces, np.int64)
    img = (
        np.ascontiguousarray(background, np.float64).copy()
        if background is not None
        else np.ones((height, width, 3), np.float64)
    )
    mask = np.zeros((height, width), np.uint8)
    color = np.ascontiguousarray(color, np.float64)
    light = np.ascontiguousarray(light_dir, np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.rasterize_mesh(
        verts.ctypes.data_as(dp),
        verts.shape[0],
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        faces.shape[0],
        height,
        width,
        float(focal),
        float(center[0]),
        float(center[1]),
        color.ctypes.data_as(dp),
        light.ctypes.data_as(dp),
        float(ambient),
        img.ctypes.data_as(dp),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return img, mask.astype(bool)
