"""Loss tests: hand-constructed cases + parity vs the TF2 reference ops."""
import numpy as np
import pytest

import jax.numpy as jnp

from human_pose_estimation_tpu.ops import losses
from human_pose_estimation_tpu.core import projection


def test_kp_loss_simple():
    # 1 batch, 2 kp: one visible with |err|=(0.1+0.2), one hidden.
    gt = jnp.asarray([[[0.0, 0.0, 1.0], [5.0, 5.0, 0.0]]])
    pred = jnp.asarray([[[0.1, -0.2], [0.0, 0.0]]])
    # sum|err| over visible = 0.3; denominator = 2 * 1 visible.
    np.testing.assert_allclose(
        losses.keypoint_reprojection_loss(gt, pred), 0.3 / 2, atol=1e-6
    )


def test_kp_loss_all_hidden_is_zero():
    gt = jnp.zeros((2, 14, 3))
    pred = jnp.ones((2, 14, 2))
    np.testing.assert_allclose(losses.keypoint_reprojection_loss(gt, pred), 0.0)


def test_kp_loss_nan_pred_on_hidden_kp_does_not_poison():
    """A non-finite prediction at an INVISIBLE keypoint must not leak into
    the batch loss (NaN * 0 = NaN otherwise). Real case: padded-batch
    eval, where all-zero pad images can produce non-finite predictions."""
    gt = jnp.asarray([[[0.0, 0.0, 1.0], [5.0, 5.0, 0.0]]])
    pred = jnp.asarray([[[0.1, -0.2], [np.nan, np.inf]]])
    np.testing.assert_allclose(
        losses.keypoint_reprojection_loss(gt, pred), 0.3 / 2, atol=1e-6
    )
    # whole padded example non-finite, zero visibility
    gt2 = jnp.concatenate([gt, jnp.zeros((1, 2, 3))])
    pred2 = jnp.concatenate([pred, jnp.full((1, 2, 2), np.nan)])
    np.testing.assert_allclose(
        losses.keypoint_reprojection_loss(gt2, pred2), 0.3 / 2, atol=1e-6
    )


def test_chamfer_identical_sets_zero():
    pts = jnp.asarray(np.random.RandomState(0).rand(2, 17, 2) * 100)
    mask = jnp.ones((2, 17))
    out = losses.chamfer_loss(pts, mask, pts, chunk_size=8)
    np.testing.assert_allclose(out, np.zeros(2), atol=1e-3)


def test_chamfer_hand_case():
    # One gt pixel at (0,0); two pred points at (3,4) and (1,0).
    gt = jnp.asarray([[[0.0, 0.0]]])
    mask = jnp.ones((1, 1))
    pred = jnp.asarray([[[3.0, 4.0], [1.0, 0.0]]])
    # pred->gt L2: 5 + 1 = 6. gt->pred L1 to nearest (1,0): 1. total 7.
    np.testing.assert_allclose(losses.chamfer_loss(gt, mask, pred), [7.0], atol=1e-5)


def test_chamfer_padding_ignored():
    rng = np.random.RandomState(1)
    real = rng.rand(1, 5, 2).astype(np.float32) * 50
    pred = rng.rand(1, 9, 2).astype(np.float32) * 50
    # Same pixels, one padded with garbage entries that are masked out.
    padded = np.concatenate([real, 1e3 * np.ones((1, 4, 2), np.float32)], axis=1)
    mask = np.concatenate([np.ones((1, 5)), np.zeros((1, 4))], axis=1)
    a = losses.chamfer_loss(jnp.asarray(real), jnp.ones((1, 5)), jnp.asarray(pred))
    b = losses.chamfer_loss(jnp.asarray(padded), jnp.asarray(mask), jnp.asarray(pred))
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_chamfer_chunking_invariant():
    rng = np.random.RandomState(2)
    gt = jnp.asarray(rng.rand(3, 37, 2) * 224)
    mask = jnp.asarray((rng.rand(3, 37) > 0.3).astype(np.float32))
    pred = jnp.asarray(rng.rand(3, 50, 2) * 224)
    a = losses.chamfer_loss(gt, mask, pred, chunk_size=7)
    b = losses.chamfer_loss(gt, mask, pred, chunk_size=64)
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_empty_silhouette_zero():
    gt = jnp.zeros((1, 8, 2))
    mask = jnp.zeros((1, 8))
    pred = jnp.asarray(np.random.rand(1, 10, 2))
    np.testing.assert_allclose(losses.chamfer_loss(gt, mask, pred), [0.0])


def test_gradient_penalty_modes():
    rng = np.random.RandomState(3)
    grads = [jnp.asarray(rng.randn(4, 13, 13)), jnp.asarray(rng.randn(4, 10))]
    ref = losses.gradient_penalty(grads, mode="reference")
    # manual
    expect = 0.0
    for g in grads:
        expect += (1.0 - np.linalg.norm(np.mean(np.asarray(g), axis=0))) ** 2
    np.testing.assert_allclose(ref, expect, rtol=1e-5)

    ps = losses.gradient_penalty(grads, mode="per_sample")
    sq = sum(
        np.sum(np.asarray(g).reshape(4, -1) ** 2, axis=-1) for g in grads
    )
    expect_ps = np.mean((1.0 - np.sqrt(sq + 1e-12)) ** 2)
    np.testing.assert_allclose(ps, expect_ps, rtol=1e-5)


def test_orth_project_matches_manual():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 7, 3).astype(np.float32)
    cam = rng.randn(2, 3).astype(np.float32)
    out = np.asarray(projection.orth_project(jnp.asarray(x), jnp.asarray(cam)))
    expect = cam[:, None, :1] * (x[..., :2] + cam[:, None, 1:])
    np.testing.assert_allclose(out, expect, atol=1e-6)


# ---------------------------------------------------------------------------
# Parity vs the TF2 reference (oracle only; skipped when absent).
# ---------------------------------------------------------------------------


def test_kp_loss_parity_vs_reference(reference_src, rng):
    tf = pytest.importorskip("tensorflow")
    from src import ops as ref_ops

    gt = rng.rand(4, 19, 3).astype(np.float32)
    gt[..., 2] = (gt[..., 2] > 0.4).astype(np.float32)
    pred = rng.rand(4, 19, 2).astype(np.float32)
    ref = ref_ops.kp_reprojection_loss(tf.constant(gt), tf.constant(pred)).numpy()
    ours = losses.keypoint_reprojection_loss(jnp.asarray(gt), jnp.asarray(pred))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_mesh_loss_parity_vs_reference(reference_src, rng):
    tf = pytest.importorskip("tensorflow")
    from src import ops as ref_ops

    batch, v = 3, 40
    pred = (rng.rand(batch, v, 2) * 224).astype(np.float32)
    # Build a ragged reference-style silhouette list [batch_idx, y, x] and
    # the equivalent padded representation.
    counts = [11, 5, 17]
    ragged = []
    p_max = max(counts)
    padded = np.zeros((batch, p_max, 2), np.float32)
    mask = np.zeros((batch, p_max), np.float32)
    for i, c in enumerate(counts):
        ys = (rng.rand(c) * 224).astype(np.float32)
        xs = (rng.rand(c) * 224).astype(np.float32)
        for y, x in zip(ys, xs):
            ragged.append([i, y, x])
        # reference stacks [x_col=silhouette[:,2], y_col=silhouette[:,1]]
        padded[i, :c, 0] = xs
        padded[i, :c, 1] = ys
        mask[i, :c] = 1.0
    ragged = np.asarray(ragged, np.float32)

    ref = ref_ops.mesh_reprojection_loss(
        tf.constant(ragged), tf.constant(pred), batch
    ).numpy()
    ours = losses.mesh_reprojection_loss(
        jnp.asarray(padded), jnp.asarray(mask), jnp.asarray(pred), chunk_size=8
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_projection_parity_vs_reference(reference_src, rng):
    tf = pytest.importorskip("tensorflow")
    from src.tf_smpl import projection as ref_proj

    x = rng.randn(4, 23, 3).astype(np.float32)
    cam = rng.randn(4, 3).astype(np.float32)
    ref = ref_proj.batch_orth_proj_idrot(tf.constant(x), tf.constant(cam)).numpy()
    ours = projection.orth_project(jnp.asarray(x), jnp.asarray(cam))
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    ref2 = ref_proj.reproject_vertices(
        tf.constant(x), tf.constant(cam), tf.constant([224.0, 224.0])
    ).numpy()
    ours2 = projection.reproject_to_pixels(jnp.asarray(x), jnp.asarray(cam), 224.0)
    np.testing.assert_allclose(ours2, ref2, atol=1e-4)


def test_kcs_parity_vs_reference(reference_src, rng):
    tf = pytest.importorskip("tensorflow")
    from src import models as ref_models
    from human_pose_estimation_tpu.ops import kcs as kcs_mod

    joints = rng.randn(6, 19, 3).astype(np.float32)
    c_ref = ref_models.precompute_C_matrix().numpy()
    c_ours = kcs_mod.bone_incidence_matrix()
    np.testing.assert_allclose(c_ours, c_ref)

    ref_kcs = ref_models.get_kcs(tf.constant(joints), tf.constant(c_ref)).numpy()
    ours = kcs_mod.kcs(jnp.asarray(joints), jnp.asarray(c_ours))
    np.testing.assert_allclose(ours, ref_kcs, atol=1e-5)
    # diagonal == squared bone lengths
    np.testing.assert_allclose(
        kcs_mod.bone_lengths_sq(jnp.asarray(joints), jnp.asarray(c_ours)),
        np.einsum("nii->ni", ref_kcs),
        atol=1e-5,
    )


def test_mesh_loss_invariant_to_silhouette_cap():
    """When the pixel budget exceeds the true silhouette size, the MR loss
    must not depend on the cap — the reference sums over EVERY silhouette
    pixel (ref src/ops.py:117-137), so truncation would change the gt->pred
    sum and make MR numbers incomparable to report.pdf Tables 1-2."""
    from human_pose_estimation_tpu.data.augment import extract_silhouette

    rng = np.random.RandomState(3)
    seg = np.zeros((2, 64, 64, 1), np.float32)
    seg[0, 10:50, 8:40] = 1.0  # 40*32 = 1280 pixels
    seg[1, 4:60, 20:52] = 1.0  # 56*32 = 1792 pixels
    pred = jnp.asarray(rng.rand(2, 97, 2) * 64)

    vals = []
    for cap in (2048, 4096, 8192):
        pts, mask = extract_silhouette(jnp.asarray(seg), cap)
        assert float(mask[0].sum()) == 1280.0 and float(mask[1].sum()) == 1792.0
        vals.append(
            float(losses.mesh_reprojection_loss(pts, mask, pred, impl="xla"))
        )
    np.testing.assert_allclose(vals[0], vals[1], rtol=1e-6)
    np.testing.assert_allclose(vals[0], vals[2], rtol=1e-6)


def test_mesh_loss_truncation_changes_value():
    """Sanity counterpart: a cap BELOW the silhouette size visibly changes
    the loss (this is why the default budget must cover real silhouettes)."""
    from human_pose_estimation_tpu.data.augment import extract_silhouette

    rng = np.random.RandomState(4)
    seg = np.zeros((1, 64, 64, 1), np.float32)
    seg[0, 4:60, 4:60] = 1.0  # 3136 pixels
    pred = jnp.asarray(rng.rand(1, 97, 2) * 64)
    pts_full, mask_full = extract_silhouette(jnp.asarray(seg), 4096)
    pts_cut, mask_cut = extract_silhouette(jnp.asarray(seg), 1024)
    full = float(losses.mesh_reprojection_loss(pts_full, mask_full, pred, impl="xla"))
    cut = float(losses.mesh_reprojection_loss(pts_cut, mask_cut, pred, impl="xla"))
    assert abs(full - cut) / abs(full) > 0.05
