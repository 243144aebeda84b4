"""Pallas chamfer kernel vs the XLA scan implementation (interpret mode on
the CPU mesh; the compiled path runs on real TPU via the benchmark)."""
import numpy as np
import pytest

import jax

import jax.numpy as jnp

from human_pose_estimation_tpu.ops.losses import chamfer_loss
from human_pose_estimation_tpu.ops.pallas_chamfer import chamfer_pallas


@pytest.mark.parametrize("shapes", [(2, 37, 50), (3, 300, 700), (1, 8, 8)])
def test_pallas_matches_xla(shapes, rng):
    n, p, v = shapes
    gt = jnp.asarray((rng.rand(n, p, 2) * 224).astype(np.float32))
    mask = jnp.asarray((rng.rand(n, p) > 0.3).astype(np.float32))
    pred = jnp.asarray((rng.rand(n, v, 2) * 224).astype(np.float32))
    ref = chamfer_loss(gt, mask, pred, chunk_size=64)
    out = chamfer_pallas(gt, mask, pred, chunk_size=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4)


def test_pallas_empty_mask(rng):
    gt = jnp.asarray((rng.rand(2, 16, 2) * 10).astype(np.float32))
    mask = jnp.zeros((2, 16), jnp.float32)
    pred = jnp.asarray((rng.rand(2, 12, 2) * 10).astype(np.float32))
    out = chamfer_pallas(gt, mask, pred, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.zeros(2))


def test_pallas_identical_sets(rng):
    pts = jnp.asarray((rng.rand(2, 20, 2) * 100).astype(np.float32))
    mask = jnp.ones((2, 20), jnp.float32)
    out = chamfer_pallas(pts, mask, pts, chunk_size=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.zeros(2), atol=1e-2)


def test_pallas_gradient_matches_xla_autodiff(rng):
    import jax

    n, p, v = 2, 45, 30
    gt = jnp.asarray((rng.rand(n, p, 2) * 100).astype(np.float32))
    mask = jnp.asarray((rng.rand(n, p) > 0.3).astype(np.float32))
    pred = jnp.asarray((rng.rand(n, v, 2) * 100).astype(np.float32))

    def loss_xla(pred):
        return jnp.sum(chamfer_loss(gt, mask, pred, chunk_size=16))

    def loss_pallas(pred):
        return jnp.sum(chamfer_pallas(gt, mask, pred, 16, True))

    g_ref = jax.grad(loss_xla)(pred)
    g_out = jax.grad(loss_pallas)(pred)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref), atol=2e-3)


def test_pallas_value_and_grad_single_pass_matches(rng):
    """The differentiated path runs ONE fused kernel (value + gradient
    residual); its value must equal the plain forward kernel's and its
    gradient the two-pass analytic one."""
    import jax

    n, p, v = 2, 100, 64
    gt = jnp.asarray((rng.rand(n, p, 2) * 224).astype(np.float32))
    mask = jnp.asarray((rng.rand(n, p) > 0.3).astype(np.float32))
    pred = jnp.asarray((rng.rand(n, v, 2) * 224).astype(np.float32))

    plain = chamfer_pallas(gt, mask, pred, 32, True)
    val, grads = jax.value_and_grad(
        lambda q: jnp.sum(chamfer_pallas(gt, mask, q, 32, True))
    )(pred)
    np.testing.assert_allclose(np.asarray(val), float(np.asarray(plain).sum()), rtol=1e-6)

    from human_pose_estimation_tpu.ops.pallas_chamfer import (
        _chamfer_grad_pred_pallas,
    )

    g_twopass = _chamfer_grad_pred_pallas(
        gt, mask, pred, jnp.ones(n), chunk_size=16, interpret=True
    )
    np.testing.assert_allclose(np.asarray(grads), np.asarray(g_twopass), atol=1e-5)


def test_tie_break_first_index_value():
    """Two vertices exactly L2-equidistant from the one gt pixel but with
    different L1 distances: first index must win (the reference's tf.argmin
    semantics, ref src/ops.py:64-71). Integer coordinates so the tie is
    exact in f32 under both the direct and expanded distance forms:
    v0=(3,4) has L1 7; v1=(5,0) has L1 5; both have d=25."""
    gt = jnp.zeros((1, 8, 2), jnp.float32)
    mask = jnp.zeros((1, 8), jnp.float32).at[0, 0].set(1.0)
    pred = jnp.asarray([[[3.0, 4.0], [5.0, 0.0]]], jnp.float32)
    expected = 7.0 + 5.0 + 5.0  # L1-of-first-nearest + two pred->gt L2s
    out_xla = chamfer_loss(gt, mask, pred, chunk_size=8)
    out_pl = chamfer_pallas(gt, mask, pred, 8, True)
    np.testing.assert_allclose(np.asarray(out_xla), [expected], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_pl), [expected], atol=1e-6)


def test_tie_break_first_index_gradient():
    """One vertex exactly equidistant from two gt pixels: the pred->gt
    gradient must be the unit vector from the FIRST pixel (p0), on both the
    XLA autodiff path and the Pallas analytic VJP."""
    import jax

    gt = jnp.zeros((1, 8, 2), jnp.float32)
    gt = gt.at[0, 0].set(jnp.asarray([3.0, 4.0])).at[0, 1].set(
        jnp.asarray([4.0, 3.0])
    )
    mask = jnp.zeros((1, 8), jnp.float32).at[0, :2].set(1.0)
    pred = jnp.zeros((1, 1, 2), jnp.float32)
    # Both pixels are at exact d=25 from the vertex (and no coordinate
    # diff is exactly zero — JAX's |0| autodiff convention differs from
    # the analytic sign(0)=0).
    # gt->pred: -sign(g - v) summed over both pixels = (-2, -2);
    # pred->gt from FIRST pixel p0: (v - p0)/5 = (-0.6, -0.8); a p1
    # selection would give (-0.8, -0.6) instead. Total (-2.6, -2.8).
    expected = np.asarray([[[-2.6, -2.8]]], np.float32)
    g_xla = jax.grad(lambda q: jnp.sum(chamfer_loss(gt, mask, q, chunk_size=8)))(pred)
    g_pl = jax.grad(lambda q: jnp.sum(chamfer_pallas(gt, mask, q, 8, True)))(pred)
    np.testing.assert_allclose(np.asarray(g_xla), expected, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_pl), expected, atol=1e-6)


def test_tie_break_first_index_across_chunks():
    """Equidistant pixels in DIFFERENT scan chunks / pallas tiles (indices
    0 and 9 with chunk 8): the cross-chunk strict-< carry must keep the
    earlier chunk's pixel, on the XLA autodiff and Pallas VJP paths."""
    import jax

    gt = jnp.zeros((1, 16, 2), jnp.float32)
    gt = gt.at[0, 0].set(jnp.asarray([3.0, 4.0])).at[0, 9].set(
        jnp.asarray([4.0, 3.0])
    )
    mask = jnp.zeros((1, 16), jnp.float32).at[0, 0].set(1.0).at[0, 9].set(1.0)
    pred = jnp.zeros((1, 1, 2), jnp.float32)
    # Same geometry as the within-chunk tie test: total (-2.6, -2.8) iff
    # the first chunk's pixel (3,4) wins the pred->gt selection.
    expected = np.asarray([[[-2.6, -2.8]]], np.float32)
    g_xla = jax.grad(lambda q: jnp.sum(chamfer_loss(gt, mask, q, chunk_size=8)))(pred)
    g_pl = jax.grad(lambda q: jnp.sum(chamfer_pallas(gt, mask, q, 8, True)))(pred)
    np.testing.assert_allclose(np.asarray(g_xla), expected, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_pl), expected, atol=1e-6)


def test_bf16_inputs_do_not_collide_indices():
    """bf16 integers above 256 are not exact, so an index iota in the DATA
    dtype collides adjacent vertices and selects several columns at once
    (regression: selections must use int32 indices regardless of input
    dtype). Vertex 257 is the unique L2-nearest of the one gt pixel; under
    a bf16-iota collision vertex 256 would ALSO receive the pixel's L1
    gradient. Check the two vertices' gradients — localized, so bf16
    rounding noise from the far vertices cannot mask the defect."""
    import jax

    v = 258
    pred = np.full((1, v, 2), 1000.0, np.float32)
    pred[0, 257] = [3.0, 4.0]  # d=25  <- the true (unique) nearest
    pred[0, 256] = [5.5, 0.0]  # d=30.25
    gt = np.zeros((1, 8, 2), np.float32)
    mask = np.zeros((1, 8), np.float32)
    mask[0, 0] = 1.0
    g = jax.grad(
        lambda q: jnp.sum(
            chamfer_loss(
                jnp.asarray(gt, jnp.bfloat16),
                jnp.asarray(mask, jnp.bfloat16),
                q,
                chunk_size=8,
            ).astype(jnp.float32)
        )
    )(jnp.asarray(pred, jnp.bfloat16))
    g = np.asarray(g, np.float32)
    # 257: l1 onto the nearest vertex -sign(g-p)=(1,1) + l2 unit (.6,.8)
    np.testing.assert_allclose(g[0, 257], [1.6, 1.8], atol=0.05)
    # 256: ONLY its own pred->gt unit vector (1,0); a collision adds (1,1)
    np.testing.assert_allclose(g[0, 256], [1.0, 0.0], atol=0.05)


def test_analytic_xla_grad_matches_pallas(rng):
    """_chamfer_grad_pred (the XLA scan analytic gradient — the readable
    spec of the kernel's math) must match _chamfer_grad_pred_pallas."""
    from human_pose_estimation_tpu.ops.pallas_chamfer import (
        _chamfer_grad_pred,
        _chamfer_grad_pred_pallas,
    )

    n, p, v = 2, 45, 30
    gt = jnp.asarray((rng.rand(n, p, 2) * 100).astype(np.float32))
    mask = jnp.asarray((rng.rand(n, p) > 0.3).astype(np.float32))
    pred = jnp.asarray((rng.rand(n, v, 2) * 100).astype(np.float32))
    ct = jnp.asarray(rng.rand(n).astype(np.float32))
    g_xla = _chamfer_grad_pred(gt, mask, pred, ct, chunk_size=16)
    g_pl = _chamfer_grad_pred_pallas(gt, mask, pred, ct, chunk_size=16, interpret=True)
    np.testing.assert_allclose(np.asarray(g_xla), np.asarray(g_pl), atol=1e-5)


def test_xla_gradient_finite_at_coincident_points(rng):
    """A predicted vertex exactly on its nearest gt pixel hits sqrt(0) in
    the pred->gt norm; the backward must be finite (0), not NaN."""
    import jax

    pts = jnp.asarray((rng.rand(2, 20, 2) * 100).astype(np.float32))
    mask = jnp.ones((2, 20), jnp.float32)
    g = jax.grad(lambda q: jnp.sum(chamfer_loss(pts, mask, q, chunk_size=8)))(pts)
    assert np.isfinite(np.asarray(g)).all()


def test_pallas_gradient_empty_mask_is_zero(rng):
    import jax

    gt = jnp.asarray((rng.rand(1, 8, 2) * 10).astype(np.float32))
    mask = jnp.zeros((1, 8), jnp.float32)
    pred = jnp.asarray((rng.rand(1, 6, 2) * 10).astype(np.float32))
    g = jax.grad(lambda p: jnp.sum(chamfer_pallas(gt, mask, p, 8, True)))(pred)
    np.testing.assert_allclose(np.asarray(g), np.zeros_like(np.asarray(g)))


def test_chunk_skip_correct_for_non_prefix_masks():
    """The per-image last-active-pixel gate must not skip valid pixels
    that sit BEYOND large masked gaps (production masks are prefixes, but
    the kernel contract allows arbitrary masks)."""
    rng = np.random.RandomState(11)
    n, p, v = 2, 1024, 33
    gt = jnp.asarray(rng.rand(n, p, 2).astype(np.float32) * 64)
    pred = jnp.asarray(rng.rand(n, v, 2).astype(np.float32) * 64)
    mask = np.zeros((n, p), np.float32)
    mask[0, :17] = 1.0
    mask[0, p - 1] = 1.0  # lone valid pixel in the very last tile
    mask[1, 500:540] = 1.0  # island in the middle, empty tail
    mask = jnp.asarray(mask)

    ours = chamfer_pallas(gt, mask, pred, 128, True)
    ref = chamfer_loss(gt, mask, pred, chunk_size=64)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5)

    # gradients agree too (the backward kernel shares the gate)
    g_ours = jax.grad(lambda q: jnp.sum(chamfer_pallas(gt, mask, q, 128, True)))(pred)
    g_ref = jax.grad(lambda q: jnp.sum(chamfer_loss(gt, mask, q)))(pred)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref), atol=1e-4)


def test_empty_and_full_budget_invariance():
    """A silhouette occupying a small prefix of a HUGE budget gives the
    same value as the tight budget (the gate skips the padded tail)."""
    rng = np.random.RandomState(12)
    pred = jnp.asarray(rng.rand(1, 50, 2).astype(np.float32) * 32)
    pts_small = rng.rand(1, 256, 2).astype(np.float32) * 32
    mask_small = np.zeros((1, 256), np.float32)
    mask_small[0, :199] = 1.0
    big_p = 4096
    pts_big = np.zeros((1, big_p, 2), np.float32)
    pts_big[:, :256] = pts_small
    mask_big = np.zeros((1, big_p), np.float32)
    mask_big[:, :256] = mask_small
    a = chamfer_pallas(jnp.asarray(pts_small), jnp.asarray(mask_small), pred, 128, True)
    b = chamfer_pallas(jnp.asarray(pts_big), jnp.asarray(mask_big), pred, 128, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
