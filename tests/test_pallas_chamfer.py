"""Pallas chamfer kernel vs the XLA scan implementation (interpret mode on
the CPU mesh; the compiled path runs on real TPU via the benchmark)."""
import numpy as np
import pytest

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


def test_pallas_gradient_empty_mask_is_zero(rng):
    import jax

    gt = jnp.asarray((rng.rand(1, 8, 2) * 10).astype(np.float32))
    mask = jnp.zeros((1, 8), jnp.float32)
    pred = jnp.asarray((rng.rand(1, 6, 2) * 10).astype(np.float32))
    g = jax.grad(lambda p: jnp.sum(chamfer_pallas(gt, mask, p, 8, True)))(pred)
    np.testing.assert_allclose(np.asarray(g), np.zeros_like(np.asarray(g)))
