"""Kinematic Chain Space (KCS) representation for the critic.

Capability parity with ref src/models.py:97-139 (precompute_C_matrix,
get_kcs). The reference computes KCS through a tensordot/transpose/
diag-part contortion; here it collapses to two einsums that XLA maps onto
the MXU directly.

Skeleton topology (14 LSP joints -> 13 bones), as documented in the
reference (src/models.py:85-96):
  joints: 0 r-foot, 1 r-knee, 2 r-hip, 3 l-hip, 4 l-knee, 5 l-foot,
          6 r-wrist, 7 r-elbow, 8 r-shoulder, 9 l-shoulder, 10 l-elbow,
          11 l-wrist, 12 neck, 13 head.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NUM_KCS_JOINTS = 14
NUM_BONES = 13

# bone b connects joint b (+1) to _BONE_FAR_JOINT[b] (-1).
_BONE_FAR_JOINT = (1, 2, 8, 9, 3, 4, 7, 8, 12, 12, 9, 10, 13)


def bone_incidence_matrix(num_joints: int = NUM_KCS_JOINTS) -> np.ndarray:
    """The C matrix mapping joints -> directed bones (ref src/models.py:97)."""
    if num_joints != NUM_KCS_JOINTS:
        raise ValueError("only the 14-joint LSP skeleton is supported")
    c = np.zeros((num_joints, NUM_BONES), dtype=np.float32)
    c[np.arange(NUM_BONES), np.arange(NUM_BONES)] = 1.0
    c[np.asarray(_BONE_FAR_JOINT), np.arange(NUM_BONES)] = -1.0
    return c


def kcs(joints: jax.Array, c_matrix: jax.Array) -> jax.Array:
    """KCS = B^T B with B = J^T C (RepNet), batched.

    Args:
      joints: (N, >=14, 3) 3D joints; only the first 14 are used
        (ref src/models.py:123-126).
      c_matrix: (14, 13).
    Returns:
      (N, 13, 13); the diagonal is the squared bone lengths.
    """
    j = joints[:, :NUM_KCS_JOINTS, :]
    b = jnp.einsum("nkc,kb->nbc", j, c_matrix)  # (N, 13, 3) bone vectors
    return jnp.einsum("nbc,ndc->nbd", b, b)


def bone_lengths_sq(joints: jax.Array, c_matrix: jax.Array) -> jax.Array:
    """Squared bone lengths (KCS diagonal), used for bone-length evaluation
    (ref src/trainer.py:610-617) without materializing the full matrix."""
    j = joints[:, :NUM_KCS_JOINTS, :]
    b = jnp.einsum("nkc,kb->nbc", j, c_matrix)
    return jnp.sum(b * b, axis=-1)
