"""Evaluation metrics.

The reference's eval metric is the pair (mean KPR loss, mean MR loss)
over lsp_val (ref src/trainer.py:992-995). The rebuild target adds
PCK@0.5 (BASELINE.md: "LSP PCK@0.5 ... parity" — not computed by the
reference, added here).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# LSP joint ids used for the torso-size reference length.
_RIGHT_HIP = 2
_LEFT_SHOULDER = 9


def pck(
    kp_gt: jax.Array,  # (N, K, 3) [x, y, vis] (any consistent coord frame)
    kp_pred: jax.Array,  # (N, K, 2)
    alpha: float = 0.5,
) -> jax.Array:
    """PCK@alpha with torso-diameter normalization.

    A visible keypoint is correct when its prediction lies within
    ``alpha * ||gt[left_shoulder] - gt[right_hip]||`` of the ground truth.
    Returns the fraction of correct visible keypoints (scalar).
    """
    vis = kp_gt[..., 2]
    torso = jnp.linalg.norm(
        kp_gt[:, _LEFT_SHOULDER, :2] - kp_gt[:, _RIGHT_HIP, :2], axis=-1
    )
    torso = jnp.maximum(torso, 1e-6)[:, None]
    dist = jnp.linalg.norm(kp_gt[..., :2] - kp_pred, axis=-1)
    correct = (dist <= alpha * torso).astype(jnp.float32) * vis
    return jnp.sum(correct) / jnp.maximum(jnp.sum(vis), 1.0)


def mean_per_joint_error(kp_gt: jax.Array, kp_pred: jax.Array) -> jax.Array:
    """Mean Euclidean error over visible keypoints (scalar)."""
    vis = kp_gt[..., 2]
    dist = jnp.linalg.norm(kp_gt[..., :2] - kp_pred, axis=-1) * vis
    return jnp.sum(dist) / jnp.maximum(jnp.sum(vis), 1.0)


def pck_curve(
    kp_gt: jax.Array,  # (N, K, 3)
    kp_pred: jax.Array,  # (N, K, 2)
    thresholds=(0.1, 0.2, 0.3, 0.4, 0.5),
) -> jax.Array:
    """PCK at several torso-normalized thresholds — (len(thresholds),).

    One pass over the distance field; the standard pose-estimation
    summary the reference's two-loss eval lacks.
    """
    vis = kp_gt[..., 2]
    torso = jnp.linalg.norm(
        kp_gt[:, _LEFT_SHOULDER, :2] - kp_gt[:, _RIGHT_HIP, :2], axis=-1
    )
    torso = jnp.maximum(torso, 1e-6)[:, None]
    ndist = jnp.linalg.norm(kp_gt[..., :2] - kp_pred, axis=-1) / torso  # (N, K)
    ts = jnp.asarray(thresholds, jnp.float32)
    correct = (ndist[None] <= ts[:, None, None]).astype(jnp.float32) * vis[None]
    return jnp.sum(correct, axis=(1, 2)) / jnp.maximum(jnp.sum(vis), 1.0)


def pck_auc(
    kp_gt: jax.Array,
    kp_pred: jax.Array,
    max_threshold: float = 0.5,
    num: int = 20,
) -> jax.Array:
    """Area under the PCK curve over [0, max_threshold] (trapezoidal),
    normalized to [0, 1]."""
    ts = jnp.linspace(0.0, max_threshold, num)
    curve = pck_curve(kp_gt, kp_pred, ts)
    return jnp.trapezoid(curve, ts) / max_threshold


def per_joint_pck(
    kp_gt: jax.Array, kp_pred: jax.Array, alpha: float = 0.5
) -> jax.Array:
    """PCK@alpha per joint — (K,) with NaN-free zeros for never-visible
    joints. Localizes which parts of the skeleton a model gets wrong."""
    vis = kp_gt[..., 2]
    torso = jnp.linalg.norm(
        kp_gt[:, _LEFT_SHOULDER, :2] - kp_gt[:, _RIGHT_HIP, :2], axis=-1
    )
    torso = jnp.maximum(torso, 1e-6)[:, None]
    dist = jnp.linalg.norm(kp_gt[..., :2] - kp_pred, axis=-1)
    correct = (dist <= alpha * torso).astype(jnp.float32) * vis
    return jnp.sum(correct, axis=0) / jnp.maximum(jnp.sum(vis, axis=0), 1.0)
