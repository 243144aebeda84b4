"""Rotation math for the SMPL body model, in pure JAX.

Re-implements the capabilities of the reference's rotation kernels
(ref: src/tf_smpl/batch_lbs.py:15-88) as batched, XLA-friendly ops:

- ``skew``            ref batch_skew (src/tf_smpl/batch_lbs.py:15)
- ``rodrigues``       ref batch_rodrigues (src/tf_smpl/batch_lbs.py:42)
- ``lrotmin``         ref batch_lrotmin (src/tf_smpl/batch_lbs.py:67)

The reference builds the skew matrix with scatter_nd into a flat buffer; on
TPU that lowers poorly, so we assemble it with stacks (pure register
shuffles that XLA fuses into the surrounding elementwise work).

Numerics note: the reference computes the Rodrigues angle as
``norm(theta + 1e-8)`` — i.e. the epsilon is added to *each component*
before the norm, not to the norm itself (src/tf_smpl/batch_lbs.py:52).
We reproduce that exactly by default (``eps_mode='reference'``) so vertex
outputs match the TF2 implementation to <1e-6; ``eps_mode='safe'`` adds the
epsilon to the squared norm instead, which has better gradients at 0.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["skew", "rodrigues", "lrotmin", "rotation_distance"]


def skew(vec: jax.Array) -> jax.Array:
    """Skew-symmetric (cross-product) matrices for a batch of 3-vectors.

    Args:
      vec: (..., 3)
    Returns:
      (..., 3, 3) with ``skew(v) @ u == cross(v, u)``.
    """
    x, y, z = vec[..., 0], vec[..., 1], vec[..., 2]
    zero = jnp.zeros_like(x)
    rows = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


def rodrigues(theta: jax.Array, eps_mode: str = "reference") -> jax.Array:
    """Axis-angle vectors -> rotation matrices (batched).

    Args:
      theta: (..., 3) axis-angle.
      eps_mode: 'reference' reproduces the TF reference's
        ``norm(theta + 1e-8)`` quirk (src/tf_smpl/batch_lbs.py:52);
        'safe' uses ``sqrt(sum(theta^2) + eps^2)``.
    Returns:
      (..., 3, 3) rotation matrices.
    """
    if eps_mode == "reference":
        angle = jnp.linalg.norm(theta + 1e-8, axis=-1, keepdims=True)
    elif eps_mode == "safe":
        angle = jnp.sqrt(jnp.sum(jnp.square(theta), axis=-1, keepdims=True) + 1e-16)
    else:
        raise ValueError(f"unknown eps_mode: {eps_mode!r}")
    axis = theta / angle
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]
    outer = axis[..., :, None] * axis[..., None, :]
    eye = jnp.eye(3, dtype=theta.dtype)
    return cos * eye + (1.0 - cos) * outer + sin * skew(axis)


def lrotmin(theta: jax.Array) -> jax.Array:
    """Pose-dependent blendshape feature: flattened (R_k - I) for the 23
    non-root joints (SMPL eq. 9). ref batch_lrotmin (src/tf_smpl/batch_lbs.py:67).

    Args:
      theta: (N, 72) axis-angle pose including the global rotation.
    Returns:
      (N, 207)
    """
    body = theta[..., 3:].reshape(*theta.shape[:-1], 23, 3)
    rs = rodrigues(body)
    return (rs - jnp.eye(3, dtype=theta.dtype)).reshape(*theta.shape[:-1], 207)


def rotation_distance(r1: jax.Array, r2: jax.Array) -> jax.Array:
    """Geodesic angle between rotation matrices (test/eval helper)."""
    rel = jnp.einsum("...ij,...kj->...ik", r1, r2)
    trace = rel[..., 0, 0] + rel[..., 1, 1] + rel[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0))
