"""HMR fused-forward tests: composition equals the hand-chained parts,
and the inference fast path matches the full path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from human_pose_estimation_tpu.core.projection import orth_project
from human_pose_estimation_tpu.core.smpl import smpl_forward
from human_pose_estimation_tpu.models.hmr import HMR, split_theta
from human_pose_estimation_tpu.utils.assets import synthetic_mean_params


@pytest.fixture(scope="module")
def hmr_setup(request):
    tiny = request.getfixturevalue("tiny_model")
    hmr = HMR(tiny, num_stage=3, joint_type="lsp", encoder_stage_sizes=(1, 1, 1, 1))
    variables = hmr.init(jax.random.PRNGKey(0), img_size=48)
    mean = jnp.asarray(synthetic_mean_params()[None, :])
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 48, 48, 3).astype(np.float32) * 2 - 1)
    return tiny, hmr, variables, mean, images


def test_forward_composition(hmr_setup):
    """The fused HMR forward must equal manually chaining encoder ->
    IEF regressor -> SMPL -> projection (same variables)."""
    tiny, hmr, variables, mean, images = hmr_setup
    stages, _ = hmr(variables, images, mean, train=False, smpl_stages="all")

    enc_vars = {
        "params": variables["params"]["encoder"],
        "batch_stats": variables["batch_stats"]["encoder"],
    }
    feats = hmr.encoder.apply(enc_vars, images, train=False)
    theta = jnp.tile(mean, (2, 1))
    for i in range(3):
        delta = hmr.regressor.apply(
            {"params": variables["params"]["regressor"]}, feats, theta, train=False
        )
        theta = theta + delta
        cam, pose, shape = split_theta(theta)
        out = smpl_forward(tiny, shape, pose, joint_type="lsp")
        kp = orth_project(out.joints, cam)
        np.testing.assert_allclose(
            np.asarray(stages[i].theta), np.asarray(theta), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(stages[i].verts), np.asarray(out.verts), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(stages[i].kp2d), np.asarray(kp), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(stages[i].rotations),
            np.asarray(out.rotations[:, 1:]),
            atol=1e-5,
        )


def test_fast_path_matches_full(hmr_setup):
    tiny, hmr, variables, mean, images = hmr_setup
    full, _ = hmr(variables, images, mean, train=False, smpl_stages="all")
    fast, _ = hmr(variables, images, mean, train=False, smpl_stages="last")
    np.testing.assert_allclose(
        np.asarray(full[-1].verts), np.asarray(fast[-1].verts), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(full[-1].theta), np.asarray(fast[-1].theta), atol=1e-6
    )
    assert fast[0].verts is None and fast[1].verts is None


def test_train_mode_dropout_only_last_stage(hmr_setup):
    """In train mode, stages 0/1 are deterministic (no dropout) while the
    final stage varies with the dropout rng (ref src/trainer.py:395-398)."""
    tiny, hmr, variables, mean, images = hmr_setup
    s1, _ = hmr(
        variables, images, mean, train=True, dropout_rng=jax.random.PRNGKey(1)
    )
    s2, _ = hmr(
        variables, images, mean, train=True, dropout_rng=jax.random.PRNGKey(2)
    )
    np.testing.assert_allclose(
        np.asarray(s1[1].theta), np.asarray(s2[1].theta), atol=1e-6
    )
    assert np.abs(np.asarray(s1[2].theta) - np.asarray(s2[2].theta)).max() > 0


def test_remat_encoder_same_results(hmr_setup):
    """jax.checkpoint on the encoder changes memory, not math."""
    tiny, hmr, variables, mean, images = hmr_setup
    from human_pose_estimation_tpu.models.hmr import HMR

    hmr_r = HMR(
        tiny, num_stage=3, joint_type="lsp",
        encoder_stage_sizes=(1, 1, 1, 1), remat_encoder=True,
    )

    def loss(hm):
        stages, _ = hm(
            variables, images, mean, train=True,
            dropout_rng=jax.random.PRNGKey(0),
        )
        return jnp.sum(stages[-1].verts ** 2)

    v1, v2 = loss(hmr), loss(hmr_r)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)

    g1 = jax.grad(lambda im: jnp.sum(hmr(variables, im, mean, train=True,
                                         dropout_rng=jax.random.PRNGKey(0))[0][-1].verts ** 2))(images)
    g2 = jax.grad(lambda im: jnp.sum(hmr_r(variables, im, mean, train=True,
                                           dropout_rng=jax.random.PRNGKey(0))[0][-1].verts ** 2))(images)
    # recompute reorders fp32 reductions; tolerance covers reassociation
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)
