"""Rotation utility tests (modes and helpers beyond the SMPL suite)."""
import numpy as np

import jax.numpy as jnp

from human_pose_estimation_tpu.core.rotations import (
    lrotmin,
    rodrigues,
    rotation_distance,
    skew,
)


def test_skew_cross_product(rng):
    v = rng.randn(5, 3).astype(np.float32)
    u = rng.randn(5, 3).astype(np.float32)
    out = np.einsum("nij,nj->ni", np.asarray(skew(jnp.asarray(v))), u)
    np.testing.assert_allclose(out, np.cross(v, u), atol=1e-6)


def test_rodrigues_modes_agree_away_from_zero(rng):
    theta = rng.randn(16, 3).astype(np.float32)
    a = np.asarray(rodrigues(jnp.asarray(theta), eps_mode="reference"))
    b = np.asarray(rodrigues(jnp.asarray(theta), eps_mode="safe"))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_rodrigues_safe_mode_zero_grad_finite():
    import jax

    g = jax.grad(lambda t: jnp.sum(rodrigues(t, eps_mode="safe")))(
        jnp.zeros((1, 3))
    )
    assert np.isfinite(np.asarray(g)).all()


def test_lrotmin_shape_and_zero_pose():
    theta = jnp.zeros((2, 72))
    out = np.asarray(lrotmin(theta))
    assert out.shape == (2, 207)
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_rotation_distance(rng):
    theta = rng.randn(8, 3).astype(np.float32)
    r = rodrigues(jnp.asarray(theta))
    np.testing.assert_allclose(
        np.asarray(rotation_distance(r, r)), 0.0, atol=2e-3
    )
    angle = np.linalg.norm(theta + 1e-8, axis=-1)
    eye = jnp.broadcast_to(jnp.eye(3), r.shape)
    d = np.asarray(rotation_distance(r, eye))
    # distance to identity == wrapped rotation angle
    wrapped = np.abs((angle + np.pi) % (2 * np.pi) - np.pi)
    np.testing.assert_allclose(d, wrapped, atol=1e-4)
