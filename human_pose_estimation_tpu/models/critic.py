"""RepNet-style KCS critic network for the adversarial pose/shape prior.

Capability parity with ref src/models.py:158-202: a 3-stream WGAN critic
scoring (KCS matrix + joints), shapes, and joint rotations independently,
returning (N, 3) scores. Leaky-relu slope 0.2 matches
``tf.nn.leaky_relu``'s default used by the reference.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

LEAKY_SLOPE = 0.2


class Critic(nn.Module):
    num_joints: int = 14
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, kcs, joints, shapes, rotations):
        """Args:
          kcs: (N, 13, 13) kinematic-chain-space matrix.
          joints: (N, 14, 3) 3D joints.
          shapes: (N, 10) SMPL betas.
          rotations: (N, 23, 3, 3) per-joint rotation matrices (no root).
        Returns:
          (N, 3) critic scores [skeleton, shape, rotation].
        """
        dense = lambda f, name: nn.Dense(
            f,
            kernel_init=nn.initializers.glorot_uniform(),
            dtype=self.compute_dtype,
            name=name,
        )
        lrelu = lambda x: nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)
        n = kcs.shape[0]

        kcs_h = lrelu(dense(100, "kcs_dense")(kcs.reshape(n, -1)))
        joints_h = lrelu(dense(100, "joints_dense")(joints.reshape(n, -1)))
        skel_score = dense(1, "combined_dense")(
            jnp.concatenate([kcs_h, joints_h], axis=-1)
        )

        s = nn.relu(dense(10, "shapes_dense_1")(shapes))
        s = nn.relu(dense(5, "shapes_dense_2")(s))
        shape_score = dense(1, "shapes_dense_3")(s)

        r = rotations.reshape(n, -1)
        r = lrelu(dense(300, "rotation_dense_1")(r))
        r = lrelu(dense(100, "rotation_dense_2")(r))
        rot_score = dense(1, "rotation_dense_3")(r)

        out = jnp.concatenate([skel_score, shape_score, rot_score], axis=-1)
        return out.astype(jnp.float32)
