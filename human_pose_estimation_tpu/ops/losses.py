"""Training losses, XLA-static throughout.

Capability parity with ref src/ops.py (kp_reprojection_loss,
mesh_reprojection_loss + helpers, compute_gradient_penalty), redesigned
for TPU:

* The mesh-reprojection (bidirectional chamfer) loss takes a *padded*
  per-image silhouette pixel tensor + mask instead of the reference's
  ragged ``tf.where`` output, and the batch loop becomes a batched,
  P-chunked computation with static shapes (SURVEY.md §7 hard part 1).
* The WGAN gradient penalty supports both the reference's
  norm-of-mean-gradient formulation (src/ops.py:153-163) and the paper's
  per-sample formulation behind a flag (SURVEY.md §8 quirk 7).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

__all__ = [
    "keypoint_reprojection_loss",
    "chamfer_loss",
    "mesh_reprojection_loss",
    "gradient_penalty",
]


def keypoint_reprojection_loss(kp_gt: jax.Array, kp_pred: jax.Array) -> jax.Array:
    """Visibility-weighted L1 keypoint loss.

    Matches ``tf.losses.absolute_difference(..., weights=vis)`` with its
    SUM_BY_NONZERO_WEIGHTS reduction (ref src/ops.py:35-47): the sum of
    visible |error| divided by the number of *broadcast* nonzero weight
    elements, i.e. 2 x (#visible keypoints).

    Args:
      kp_gt: (N, K, 3) [x, y, visibility].
      kp_pred: (N, K, 2).
    Returns:
      scalar loss.
    """
    vis = kp_gt[..., 2:3]
    # where(), not plain multiply: an invisible keypoint must contribute
    # an exact 0 even when the prediction is non-finite (NaN * 0 = NaN
    # would otherwise poison the whole batch — observed in padded-batch
    # eval, where all-zero pad images can produce non-finite preds).
    # Bit-identical to |err| * vis on finite inputs.
    err = jnp.where(vis > 0, jnp.abs(kp_gt[..., :2] - kp_pred) * vis, 0.0)
    num_present = jnp.count_nonzero(vis) * 2
    denom = jnp.maximum(num_present, 1).astype(err.dtype)
    return jnp.sum(err) / denom


_IBIG = 2**30  # integer sentinel for index-carrying mins


def _first_min_mask(cond: jax.Array, axis: int) -> jax.Array:
    """One-hot (bool) mask selecting the FIRST True element of ``cond``
    along ``axis`` — the index-carrying-min idiom shared by all XLA
    nearest-neighbor selections (tf.argmin first-index semantics without
    gathers). Indices are int32 on purpose: an iota in the *data* dtype
    collides above 256 for bf16 inputs and selects multiple columns."""
    axis = axis % len(cond.shape)  # broadcasted_iota rejects negative axes
    iota = jax.lax.broadcasted_iota(jnp.int32, cond.shape, axis)
    first = jnp.min(jnp.where(cond, iota, _IBIG), axis=axis, keepdims=True)
    return iota == first


def chamfer_loss(
    gt_points: jax.Array,
    gt_mask: jax.Array,
    pred_points: jax.Array,
    chunk_size: int = 1024,
) -> jax.Array:
    """Bidirectional chamfer between padded gt pixel sets and predicted
    vertex projections, per batch element.

    Subsumes the reference's find_nearest_neighbors + bidirectional_dist
    helpers (src/ops.py:60-102): the distance matrix, both argmin
    directions, and the two asymmetric reductions are fused into one
    chunked streaming computation instead of three materialized passes.

    Asymmetric like the reference (src/ops.py:83-102): gt->pred uses the
    L1 distance to the (L2-)nearest predicted vertex; pred->gt uses the L2
    distance to the nearest gt pixel. Padded gt entries are excluded from
    both directions.

    Streaming formulation: the (P, V) distance matrix is never fully
    materialized — gt pixels are processed in chunks of ``chunk_size``
    under ``lax.scan``, carrying a running (min-dist, nearest-xy) pair for
    the pred->gt direction. Peak memory is O(chunk_size * V) instead of
    O(P * V).

    Args:
      gt_points: (N, P, 2) padded gt pixel coordinates (x is free; the
        reference stacks [y, x]-order pixel coords — callers choose, both
        sides just need the same convention).
      gt_mask: (N, P) 1.0 for real pixels, 0.0 for padding.
      pred_points: (N, V, 2).
    Returns:
      (N,) unnormalized bidirectional distances.
    """
    n, p, _ = gt_points.shape
    v = pred_points.shape[1]
    big = jnp.asarray(jnp.finfo(gt_points.dtype).max, gt_points.dtype)

    pred_sq = jnp.sum(pred_points**2, axis=-1)  # (N, V)

    pad = (-p) % chunk_size
    if pad:
        gt_points = jnp.pad(gt_points, ((0, 0), (0, pad), (0, 0)))
        gt_mask = jnp.pad(gt_mask, ((0, 0), (0, pad)))
    num_chunks = gt_points.shape[1] // chunk_size
    gt_points_c = gt_points.reshape(n, num_chunks, chunk_size, 2).transpose(1, 0, 2, 3)
    gt_mask_c = gt_mask.reshape(n, num_chunks, chunk_size).transpose(1, 0, 2)

    def scan_body(carry, chunk):
        best_sq, best_xy, l1_acc = carry
        pts, mask = chunk  # (N, C, 2), (N, C)
        # Squared distances (N, C, V) for this chunk of gt pixels. The
        # cross-term matmul must run in full f32 (precision='highest'):
        # TPU's default bf16 matmul passes perturb distances enough to
        # flip nearest-neighbor selections.
        d = (
            jnp.sum(pts**2, axis=-1)[..., None]
            - 2.0
            * jnp.einsum("ncx,nvx->ncv", pts, pred_points, precision="highest")
            + pred_sq[:, None, :]
        )
        # All nearest-neighbor *selections* below use the masked-min trick
        # (where(d == dmin, value, +inf) -> min) instead of argmin +
        # take_along_axis: TPU lowers those gathers to serialized dynamic
        # slices, which is catastrophic at (N, C, V) scale. Exact ties
        # resolve first-index-wins via an index-carrying min, matching the
        # reference's tf.argmin (src/ops.py:64-71).
        # gt -> pred: L1 to the L2-nearest vertex, masked accumulate.
        dmin_pix = jnp.min(d, axis=-1, keepdims=True)  # (N, C, 1)
        near = _first_min_mask(d <= dmin_pix, axis=-1)  # (N, C, V)
        l1v = jnp.sum(
            jnp.abs(pts[:, :, None, :] - pred_points[:, None, :, :]), axis=-1
        )  # (N, C, V)
        l1 = jnp.min(jnp.where(near, l1v, big), axis=-1) * mask
        l1_acc = l1_acc + jnp.sum(l1, axis=-1)
        # pred -> gt: running min over masked gt pixels, tracking coords so
        # the final distance is an exact vector norm (not sqrt of a
        # cancellation-prone matrix entry). Ties take the first pixel index
        # (within-chunk via index-carrying min; across chunks the strict
        # `<` carry keeps the earlier chunk).
        d_masked = jnp.where(mask[..., None] > 0, d, big)
        chunk_min = jnp.min(d_masked, axis=1)  # (N, V)
        is_min = d_masked <= chunk_min[:, None, :]  # (N, C, V)
        sel = _first_min_mask(is_min, axis=1)  # one row per column
        chunk_x = jnp.min(
            jnp.where(sel, pts[:, :, 0:1], big), axis=1
        )  # (N, V)
        chunk_y = jnp.min(jnp.where(sel, pts[:, :, 1:2], big), axis=1)
        chunk_xy = jnp.stack([chunk_x, chunk_y], axis=-1)
        take_new = chunk_min < best_sq
        best_xy = jnp.where(take_new[..., None], chunk_xy, best_xy)
        best_sq = jnp.where(take_new, chunk_min, best_sq)
        return (best_sq, best_xy, l1_acc), None

    init = (
        jnp.full((n, v), big),
        jnp.zeros((n, v, 2), gt_points.dtype),
        jnp.zeros((n,), gt_points.dtype),
    )
    (best_sq, best_xy, l1_acc), _ = jax.lax.scan(
        scan_body, init, (gt_points_c, gt_mask_c)
    )

    has_gt = jnp.sum(gt_mask, axis=-1) > 0  # guard empty silhouettes
    # NaN-safe norm (double-where): a vertex exactly coincident with its
    # nearest pixel has sqrt(0) here, whose autodiff is NaN and would
    # poison the whole step; the analytic VJP paths guard the same case.
    d2 = jnp.sum(jnp.square(pred_points - best_xy), axis=-1)  # (N, V)
    nz = d2 > 0
    l2 = jnp.where(nz, jnp.sqrt(jnp.where(nz, d2, 1.0)), 0.0)
    l2_sum = jnp.where(has_gt, jnp.sum(l2, axis=-1), 0.0)
    l1_sum = jnp.where(has_gt, l1_acc, 0.0)
    return l2_sum + l1_sum


def mesh_reprojection_loss(
    gt_points: jax.Array,
    gt_mask: jax.Array,
    pred_points: jax.Array,
    scale_mode: str = "reference",
    chunk_size: int = 1024,
    impl: str = "auto",
) -> jax.Array:
    """Silhouette mesh-reprojection loss summed over the batch.

    ``scale_mode='reference'`` reproduces the reference's per-image scale
    1/(3 + V): the denominator uses silhouette_gt.shape[1] (=3, the
    coordinate dim — SURVEY.md §8 quirk 9) plus the vertex count
    (src/ops.py:129-130). ``scale_mode='count'`` divides by the true
    (pixels + vertices) count per image.

    Returns a scalar (sum over batch, as ref src/ops.py:117-137).

    impl: 'xla' = scan-chunked XLA version; 'pallas' = fused TPU kernel
    (ops/pallas_chamfer.py); 'auto' picks pallas on TPU backends.
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from .pallas_chamfer import chamfer_pallas

        per_image = chamfer_pallas(gt_points, gt_mask, pred_points)
    else:
        per_image = chamfer_loss(gt_points, gt_mask, pred_points, chunk_size)
    v = pred_points.shape[1]
    if scale_mode == "reference":
        denom = jnp.asarray(3.0 + v, per_image.dtype)
    elif scale_mode == "count":
        denom = jnp.sum(gt_mask, axis=-1) + v
    else:
        raise ValueError(f"unknown scale_mode: {scale_mode!r}")
    return jnp.sum(per_image / denom)


def gradient_penalty(
    grads: Sequence[jax.Array], mode: str = "reference"
) -> jax.Array:
    """WGAN-GP penalty over the critic's input gradients.

    ``mode='reference'`` penalizes ||mean-over-batch(grad)|| per input and
    sums the four penalties (ref src/ops.py:153-163 — NOT the per-sample
    norm of the WGAN-GP paper; SURVEY.md §8 quirk 7).
    ``mode='per_sample'`` implements the paper: the per-sample norm over
    all inputs jointly, squared deviation from 1, averaged over batch.
    """
    if mode == "reference":
        total = jnp.asarray(0.0, grads[0].dtype)
        for g in grads:
            mean_g = jnp.mean(g, axis=0)
            total = total + jnp.square(1.0 - jnp.linalg.norm(mean_g.reshape(-1)))
        return total
    elif mode == "per_sample":
        n = grads[0].shape[0]
        sq = jnp.zeros((n,), grads[0].dtype)
        for g in grads:
            sq = sq + jnp.sum(jnp.square(g.reshape(n, -1)), axis=-1)
        norms = jnp.sqrt(sq + 1e-12)
        return jnp.mean(jnp.square(1.0 - norms))
    raise ValueError(f"unknown mode: {mode!r}")
