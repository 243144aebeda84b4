"""IEF (iterative error feedback) SMPL-parameter regressor.

Capability parity with ref src/models.py:60-74: an MLP
2133 -> 1024 -> dropout(.5) -> 1024 -> dropout(.5) -> 85 predicting a
delta-Theta per IEF stage, with the reference's tiny-uniform init on the
output layer (limit = sqrt(3 * 0.02 / (1024 + 85)), src/models.py:71-72).
"""
from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

THETA_DIM = 85  # [cam 3 | pose 72 | shape 10]
FEATURE_DIM = 2048


def _tiny_uniform(limit):
    def init(key, shape, dtype=jnp.float32):
        import jax

        return jax.random.uniform(key, shape, dtype, -limit, limit)

    return init


class IEFRegressor(nn.Module):
    hidden_dim: int = 1024
    out_dim: int = THETA_DIM
    dropout_rate: float = 0.5
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, theta, train: bool = False):
        """One IEF stage: concat(features, theta) -> delta theta.

        Args:
          features: (N, 2048) image features.
          theta: (N, 85) current parameter estimate.
          train: enables dropout (reference enables it only on the final
            IEF stage — that policy lives in the caller, ref
            src/trainer.py:395-398).
        """
        x = jnp.concatenate([features, theta], axis=-1).astype(self.compute_dtype)
        x = nn.Dense(
            self.hidden_dim,
            kernel_init=nn.initializers.glorot_uniform(),
            dtype=self.compute_dtype,
            name="fc1",
        )(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(
            self.hidden_dim,
            kernel_init=nn.initializers.glorot_uniform(),
            dtype=self.compute_dtype,
            name="fc2",
        )(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        limit = math.sqrt(3.0 * 0.02 / (self.hidden_dim + self.out_dim))
        x = nn.Dense(
            self.out_dim,
            kernel_init=_tiny_uniform(limit),
            dtype=self.compute_dtype,
            name="out",
        )(x)
        return x.astype(jnp.float32)
