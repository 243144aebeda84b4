"""Native C++ rasterizer: build, run, and pixel-parity vs the numpy spec."""
import time

import numpy as np
import pytest

from human_pose_estimation_tpu.native import get_rasterizer, rasterize_native
from human_pose_estimation_tpu.viz.renderer import (
    _AMBIENT,
    _LIGHT_DIR,
    rasterize_mesh,
)


@pytest.fixture(scope="module")
def mesh(request):
    tiny = request.getfixturevalue("tiny_model")
    rng = np.random.RandomState(0)
    verts = np.asarray(tiny.v_template, np.float64) + np.array([0.0, 0.0, 4.0])
    faces = np.asarray(tiny.faces, np.int64)
    return verts, faces


def test_native_builds():
    assert get_rasterizer() is not None, "g++ build of rasterizer.cpp failed"


def test_native_matches_numpy(mesh):
    verts, faces = mesh
    color = np.array([0.65, 0.74, 0.86])
    kwargs = dict(
        height=96, width=96, focal=120.0, center=np.array([48.0, 48.0]),
        color=color,
    )
    img_np, mask_np = rasterize_mesh(verts, faces, use_native=False, **kwargs)
    out = rasterize_native(
        verts, faces, 96, 96, 120.0, np.array([48.0, 48.0]), color,
        _LIGHT_DIR, _AMBIENT,
    )
    assert out is not None
    img_c, mask_c = out
    assert mask_np.any()
    # identical coverage and (up to depth-tie resolution) identical pixels
    assert (mask_np == mask_c).mean() > 0.999
    both = mask_np & mask_c
    np.testing.assert_allclose(img_np[both], img_c[both], atol=1e-6)


def test_native_with_background(mesh):
    verts, faces = mesh
    rng = np.random.RandomState(1)
    bg = rng.rand(64, 64, 3)
    out = rasterize_native(
        verts, faces, 64, 64, 80.0, np.array([32.0, 32.0]),
        np.array([0.9, 0.7, 0.7]), _LIGHT_DIR, _AMBIENT, background=bg,
    )
    img, mask = out
    # untouched background outside coverage
    np.testing.assert_allclose(img[~mask], bg[~mask])


def test_native_is_faster(mesh):
    verts, faces = mesh
    color = np.array([0.65, 0.74, 0.86])
    args = (verts, faces, 128, 128, 160.0, np.array([64.0, 64.0]), color)

    t0 = time.perf_counter()
    rasterize_mesh(*args, use_native=False)
    t_np = time.perf_counter() - t0

    rasterize_native(*args, _LIGHT_DIR, _AMBIENT)  # warm (already built)
    t0 = time.perf_counter()
    rasterize_native(*args, _LIGHT_DIR, _AMBIENT)
    t_c = time.perf_counter() - t0
    assert t_c < t_np  # typically 10-100x


def test_point_light_gouraud_mode(mesh):
    """lighting='points' (the reference's 3-point-light Lambertian model,
    ref src/util/renderer.py:157-192): same coverage as the directional
    path, but smoothly varying per-pixel shading (Gouraud) instead of
    per-face flat shading."""
    verts, faces = mesh
    color = np.array([1.0, 1.0, 1.0])
    kwargs = dict(
        height=96, width=96, focal=120.0, center=np.array([48.0, 48.0]),
        color=color, use_native=False,
    )
    img_d, mask_d = rasterize_mesh(verts, faces, lighting="directional", **kwargs)
    img_p, mask_p = rasterize_mesh(verts, faces, lighting="points", **kwargs)
    np.testing.assert_array_equal(mask_d, mask_p)  # lighting != geometry
    assert mask_p.any()
    # shading actually differs between the models
    assert np.abs(img_p[mask_p] - img_d[mask_d]).max() > 0.02
    # Gouraud: more distinct shade levels than flat per-face shading on
    # the same mesh (interpolation produces a near-continuous ramp)
    levels = lambda im, m: len(np.unique(np.round(im[m][:, 0], 3)))
    assert levels(img_p, mask_p) > levels(img_d, mask_d)
    # the white color stays in gamut
    assert img_p.max() <= 1.0 and img_p.min() >= 0.0
