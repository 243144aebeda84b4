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


def procrustes_align(
    pred: jax.Array,  # (N, P, 3) predicted point sets (verts or joints)
    gt: jax.Array,  # (N, P, 3) ground-truth point sets
) -> jax.Array:
    """Per-sample similarity (Procrustes) alignment of pred onto gt.

    Solves min_{s, R, t} ||s R pred + t - gt||_F per sample (orthogonal
    Procrustes with scale; Umeyama). Returns the aligned predictions
    (N, P, 3).

    Monocular weak-perspective reconstruction (the loss camera,
    core/projection.py) only determines geometry up to a similarity
    transform — camera scale trades against body size, and depth is
    unobserved — so raw model-space vertex error conflates that gauge
    freedom with actual pose error. Aligned error (the HMR literature's
    "PA-" metrics; the reference computes neither, having no ground-truth
    mesh) isolates recovered pose/shape quality.
    """
    mu_p = pred.mean(axis=1, keepdims=True)
    mu_g = gt.mean(axis=1, keepdims=True)
    pc = pred - mu_p
    gc = gt - mu_g
    # cross-covariance and its SVD give the optimal rotation
    cov = jnp.einsum("npi,npj->nij", gc, pc)  # (N, 3, 3)
    u, s, vt = jnp.linalg.svd(cov)
    # reflection guard: flip the smallest singular direction if det < 0
    det = jnp.linalg.det(jnp.einsum("nij,njk->nik", u, vt))
    d = jnp.stack(
        [jnp.ones_like(det), jnp.ones_like(det), jnp.sign(det)], axis=-1
    )
    r = jnp.einsum("nij,nj,njk->nik", u, d, vt)  # (N, 3, 3), gt <- pred
    var_p = jnp.sum(pc * pc, axis=(1, 2))
    scale = jnp.sum(s * d, axis=-1) / jnp.maximum(var_p, 1e-12)  # (N,)
    aligned = scale[:, None, None] * jnp.einsum("nij,npj->npi", r, pc) + mu_g
    return aligned


def pa_error(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Mean per-point Euclidean error after Procrustes alignment — (N,).

    With vertices this is PA-vertex error (PVE-PA); with joints it is
    PA-MPJPE, the standard monocular-3D-pose metric.
    """
    aligned = procrustes_align(pred, gt)
    return jnp.linalg.norm(aligned - gt, axis=-1).mean(axis=-1)


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
