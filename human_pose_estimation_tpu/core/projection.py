"""Weak-perspective camera projection.

Capability parity with ref src/tf_smpl/projection.py:23-56.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["orth_project", "reproject_to_pixels"]


def orth_project(points: jax.Array, camera: jax.Array) -> jax.Array:
    """Weak-perspective projection with identity rotation.

    ``s * (X[..., :2] + [tx, ty])`` per batch element
    (ref batch_orth_proj_idrot, src/tf_smpl/projection.py:23-33).

    Args:
      points: (N, P, 3)
      camera: (N, 3) as [scale, tx, ty]
    Returns:
      (N, P, 2) projected points in the [-1, 1] image frame.
    """
    cam = camera.reshape(-1, 1, 3)
    return cam[..., :1] * (points[..., :2] + cam[..., 1:])


def reproject_to_pixels(
    verts: jax.Array, camera: jax.Array, img_size: float | jax.Array
) -> jax.Array:
    """Project vertices and map [-1, 1] coords to pixel coordinates.

    (ref reproject_vertices, src/tf_smpl/projection.py:45-56)

    Args:
      verts: (N, V, 3)
      camera: (N, 3)
      img_size: scalar or (2,) [h, w] image size in pixels.
    Returns:
      (N, V, 2) pixel coordinates.
    """
    projected = orth_project(verts, camera)
    return (projected + 1.0) * 0.5 * jnp.asarray(img_size, projected.dtype)
