"""Native (C++) components, built on demand with the system toolchain.

Two libraries, loaded through ctypes with lazy g++ builds; callers fall
back to pure-Python implementations when no compiler is available:

* ``rasterizer.cpp`` — the visualization-path native component (the
  reference relies on OpenDR's C++/OpenGL renderer for this role,
  ref src/util/renderer.py:12-14).
* ``dataloader.cpp`` — multithreaded JPEG/PNG batch decode +
  fit-to-canvas for the host half of the input pipeline (the role
  tf.data's C++ runtime plays in the reference, ref train.py:35-40).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_lock = threading.Lock()
_libs = {}
_failed = set()


def _load(name: str, extra_flags: Sequence[str] = ()) -> Optional[ctypes.CDLL]:
    """Build (if stale) and dlopen native/<name>.cpp -> lib<name>.so."""
    src = os.path.join(_DIR, f"{name}.cpp")
    lib_path = os.path.join(_DIR, f"lib{name}.so")
    with _lock:
        if name in _libs:
            return _libs[name]
        if name in _failed:
            return None
        try:
            if not (
                os.path.exists(lib_path)
                and os.path.getmtime(lib_path) >= os.path.getmtime(src)
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", src, "-o", lib_path]
                    + list(extra_flags),
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(lib_path)
        except Exception:
            _failed.add(name)
            return None
        _libs[name] = lib
        return lib


def get_rasterizer() -> Optional[ctypes.CDLL]:
    """The compiled rasterizer library, building it on first use.
    Returns None when compilation is unavailable (callers fall back)."""
    lib = _load("rasterizer")
    if lib is None:
        return None
    if not getattr(lib, "_hpe_configured", False):
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
        lib._hpe_configured = True
    return lib


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


def get_dataloader() -> Optional[ctypes.CDLL]:
    """The compiled batch-decoder library (libjpeg + libpng), building it
    on first use. Returns None when unavailable (callers fall back)."""
    lib = _load("dataloader", extra_flags=["-ljpeg", "-lpng", "-lpthread"])
    if lib is None:
        return None
    if not getattr(lib, "_hpe_configured", False):
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.hpe_decode_fit_batch.restype = ctypes.c_int
        lib.hpe_decode_fit_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),  # jpeg_ptrs
            ctypes.POINTER(ctypes.c_int64),  # jpeg_sizes
            ctypes.POINTER(ctypes.c_void_p),  # png_ptrs
            ctypes.POINTER(ctypes.c_int64),  # png_sizes
            ctypes.c_int64,  # n
            ctypes.c_int,  # canvas
            ctypes.POINTER(ctypes.c_int32),  # centers (or NULL)
            ctypes.c_int,  # window_half
            u8p,  # out_img
            u8p,  # out_seg
            ctypes.POINTER(ctypes.c_int32),  # out_hw (n, 6)
            ctypes.POINTER(ctypes.c_float),  # out_scale
            ctypes.POINTER(ctypes.c_int32),  # out_err
            ctypes.c_int,  # num_threads
        ]
        lib._hpe_configured = True
    return lib


def decode_fit_batch(
    jpeg_bytes: Sequence[bytes],
    png_bytes: Optional[Sequence[bytes]],
    canvas: int,
    num_threads: int = 0,
    centers: Optional[np.ndarray] = None,
    window_half: int = 0,
):
    """Decode a batch of JPEGs (+ optional segmentation PNGs) into fixed
    uint8 canvases with the native multithreaded decoder.

    centers (N, 2) int32 (x, y) + window_half > 0 crop a person window at
    SOURCE resolution before the canvas fit (full detail for small people
    in large frames); offsets for label shifting come back per example.

    Returns (img (N,C,C,3) u8, seg (N,C,C,1) u8, hw (N,2) i32 new dims,
    win_hw (N,2) i32 pre-fit window dims, off_yx (N,2) i32 window offsets,
    scale (N,2) f32 = (fy, fx), err (N,) i32) or None when the native
    library is unavailable. err[i] != 0 marks a failed example (its
    outputs are zeroed); geometry matches
    data/npz_dataset._fit_to_canvas_np. For exact label/center rescaling
    compute hw/win_hw ratios in float64 rather than using the float32
    `scale`.
    """
    lib = get_dataloader()
    if lib is None:
        return None
    n = len(jpeg_bytes)
    jb = [np.frombuffer(b, np.uint8) for b in jpeg_bytes]
    jpeg_ptrs = (ctypes.c_void_p * n)(*[a.ctypes.data for a in jb])
    jpeg_sizes = (ctypes.c_int64 * n)(*[a.size for a in jb])
    if png_bytes is not None:
        pb = [np.frombuffer(b, np.uint8) if b else np.zeros(0, np.uint8) for b in png_bytes]
    else:
        pb = [np.zeros(0, np.uint8)] * n
    png_ptrs = (ctypes.c_void_p * n)(
        *[a.ctypes.data if a.size else None for a in pb]
    )
    png_sizes = (ctypes.c_int64 * n)(*[a.size for a in pb])

    i32p = ctypes.POINTER(ctypes.c_int32)
    if centers is not None and window_half > 0:
        centers_arr = np.ascontiguousarray(centers, np.int32)
        assert centers_arr.shape == (n, 2), centers_arr.shape
        centers_ptr = centers_arr.ctypes.data_as(i32p)
    else:
        centers_ptr = None

    img = np.zeros((n, canvas, canvas, 3), np.uint8)
    seg = np.zeros((n, canvas, canvas, 1), np.uint8)
    hw = np.zeros((n, 6), np.int32)
    scale = np.zeros((n, 2), np.float32)
    err = np.zeros(n, np.int32)
    lib.hpe_decode_fit_batch(
        jpeg_ptrs,
        jpeg_sizes,
        png_ptrs,
        png_sizes,
        n,
        canvas,
        centers_ptr,
        int(window_half),
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        seg.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        hw.ctypes.data_as(i32p),
        scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        err.ctypes.data_as(i32p),
        int(num_threads),
    )
    return (
        img,
        seg,
        hw[:, :2].copy(),
        hw[:, 2:4].copy(),
        hw[:, 4:6].copy(),
        scale,
        err,
    )
