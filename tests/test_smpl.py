"""SMPL core tests: internal invariants, numpy golden model, and numerical
parity against the TF2 reference implementation (SURVEY.md §4 test plan)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from human_pose_estimation_tpu.core import smpl as core_smpl
from human_pose_estimation_tpu.core.rotations import rodrigues
from human_pose_estimation_tpu.utils import assets


def _numpy_smpl_forward(model, beta, theta):
    """Independent numpy implementation of the standard SMPL formulation
    (Loper et al. 2015), used as a golden oracle."""
    n = beta.shape[0]
    v = np.asarray(model.v_template)
    shapedirs = np.asarray(model.shapedirs)
    posedirs = np.asarray(model.posedirs)
    jreg = np.asarray(model.j_regressor)
    weights = np.asarray(model.lbs_weights)
    kreg = np.asarray(model.joint_regressor)

    v_shaped = (beta @ shapedirs).reshape(n, -1, 3) + v
    joints = np.einsum("nvc,vk->nkc", v_shaped, jreg)

    # Rodrigues with the reference epsilon quirk.
    th = theta.reshape(n, 24, 3)
    angle = np.linalg.norm(th + 1e-8, axis=-1, keepdims=True)
    axis = th / angle
    K = np.zeros((n, 24, 3, 3))
    K[..., 0, 1], K[..., 0, 2] = -axis[..., 2], axis[..., 1]
    K[..., 1, 0], K[..., 1, 2] = axis[..., 2], -axis[..., 0]
    K[..., 2, 0], K[..., 2, 1] = -axis[..., 1], axis[..., 0]
    c = np.cos(angle)[..., None]
    s = np.sin(angle)[..., None]
    outer = axis[..., :, None] * axis[..., None, :]
    R = c * np.eye(3) + (1 - c) * outer + s * K

    pose_feature = (R[:, 1:] - np.eye(3)).reshape(n, 207)
    v_posed = (pose_feature @ posedirs).reshape(n, -1, 3) + v_shaped

    # FK with homogeneous 4x4s (textbook formulation).
    parents = model.parents
    A = np.zeros((n, 24, 4, 4))
    A[:, 0, :3, :3] = R[:, 0]
    A[:, 0, :3, 3] = joints[:, 0]
    A[:, 0, 3, 3] = 1
    for k in range(1, 24):
        local = np.zeros((n, 4, 4))
        local[:, :3, :3] = R[:, k]
        local[:, :3, 3] = joints[:, k] - joints[:, parents[k]]
        local[:, 3, 3] = 1
        A[:, k] = A[:, parents[k]] @ local
    posed_joints = A[:, :, :3, 3].copy()
    # Relative transform for skinning: subtract transformed rest joint.
    Arel = A.copy()
    Arel[:, :, :3, 3] -= np.einsum("nkij,nkj->nki", A[:, :, :3, :3], joints)

    T = np.einsum("vk,nkij->nvij", weights, Arel)
    homo = np.concatenate([v_posed, np.ones((n, v_posed.shape[1], 1))], axis=2)
    verts = np.einsum("nvij,nvj->nvi", T, homo)[..., :3]
    kp = np.einsum("nvc,vj->njc", verts, kreg)
    return verts, kp, R, posed_joints


def _random_inputs(rng, n=4):
    beta = rng.randn(n, 10).astype(np.float32) * 0.5
    theta = rng.randn(n, 72).astype(np.float32) * 0.3
    return beta, theta


def test_forward_shapes(tiny_model, rng):
    beta, theta = _random_inputs(rng)
    out = core_smpl.smpl_forward(tiny_model, jnp.asarray(beta), jnp.asarray(theta))
    v = tiny_model.num_verts
    assert out.verts.shape == (4, v, 3)
    assert out.joints.shape == (4, 19, 3)
    assert out.rotations.shape == (4, 24, 3, 3)
    assert out.joints_smpl.shape == (4, 24, 3)
    out_lsp = core_smpl.smpl_forward(
        tiny_model, jnp.asarray(beta), jnp.asarray(theta), joint_type="lsp"
    )
    assert out_lsp.joints.shape == (4, 14, 3)
    np.testing.assert_allclose(out_lsp.verts, out.verts)


def test_rodrigues_orthonormal(rng):
    theta = rng.randn(32, 3).astype(np.float32)
    R = np.asarray(rodrigues(jnp.asarray(theta)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(32), atol=1e-5)


def test_rodrigues_zero_pose_near_identity():
    R = np.asarray(rodrigues(jnp.zeros((2, 3))))
    np.testing.assert_allclose(R, np.tile(np.eye(3), (2, 1, 1)), atol=1e-5)


def test_forward_matches_numpy_golden(tiny_model, rng):
    beta, theta = _random_inputs(rng)
    out = core_smpl.smpl_forward(tiny_model, jnp.asarray(beta), jnp.asarray(theta))
    verts, kp, R, pj = _numpy_smpl_forward(tiny_model, beta, theta)
    np.testing.assert_allclose(out.verts, verts, atol=2e-5)
    np.testing.assert_allclose(out.joints, kp, atol=2e-5)
    np.testing.assert_allclose(out.rotations, R, atol=2e-5)
    np.testing.assert_allclose(out.joints_smpl, pj, atol=2e-5)


def test_zero_pose_identity_skinning(tiny_model):
    """With theta=0 and beta=0 the mesh must be (numerically) the template."""
    out = core_smpl.smpl_forward(
        tiny_model, jnp.zeros((1, 10)), jnp.zeros((1, 72))
    )
    np.testing.assert_allclose(
        np.asarray(out.verts)[0], np.asarray(tiny_model.v_template), atol=1e-4
    )


def test_pickle_roundtrip(tiny_model, tmp_path):
    pkl = str(tmp_path / "model.pkl")
    assets.write_reference_pickle(tiny_model, pkl)
    loaded = core_smpl.load_model(pkl)
    np.testing.assert_allclose(loaded.v_template, tiny_model.v_template, atol=1e-6)
    np.testing.assert_allclose(loaded.shapedirs, tiny_model.shapedirs, atol=1e-6)
    np.testing.assert_allclose(loaded.j_regressor, tiny_model.j_regressor, atol=1e-6)
    assert loaded.parents == tiny_model.parents
    assert loaded.faces is not None

    npz = str(tmp_path / "model.npz")
    core_smpl.save_model_npz(loaded, npz)
    loaded2 = core_smpl.load_model(npz)
    np.testing.assert_allclose(loaded2.posedirs, tiny_model.posedirs, atol=1e-6)
    assert loaded2.parents == tiny_model.parents


def test_forward_jit_and_grad(tiny_model, rng):
    beta, theta = _random_inputs(rng, n=2)

    @jax.jit
    def loss_fn(beta, theta):
        out = core_smpl.smpl_forward(tiny_model, beta, theta)
        return jnp.sum(out.verts**2) + jnp.sum(out.joints**2)

    g = jax.grad(loss_fn, argnums=(0, 1))(jnp.asarray(beta), jnp.asarray(theta))
    assert np.isfinite(np.asarray(g[0])).all()
    assert np.isfinite(np.asarray(g[1])).all()
    assert np.abs(np.asarray(g[1])).max() > 0


@pytest.mark.parametrize("joint_type", ["cocoplus", "lsp"])
def test_parity_vs_tf_reference(tiny_model, reference_src, tmp_path, rng, joint_type):
    """Vertex/keypoint outputs within 1e-3 (actually ~1e-5) of the TF2
    reference (BASELINE.md parity target), on a synthetic asset."""
    tf = pytest.importorskip("tensorflow")
    from src.tf_smpl.batch_smpl import SMPL as RefSMPL  # noqa: reference oracle

    pkl = str(tmp_path / "model.pkl")
    assets.write_reference_pickle(tiny_model, pkl)
    beta, theta = _random_inputs(rng)

    ref = RefSMPL(pkl, joint_type=joint_type)
    ref_verts, ref_joints, ref_rs = ref(
        tf.constant(beta), tf.constant(theta), get_skin=True
    )
    out = core_smpl.smpl_forward(
        tiny_model, jnp.asarray(beta), jnp.asarray(theta), joint_type=joint_type
    )
    np.testing.assert_allclose(out.verts, ref_verts.numpy(), atol=1e-4)
    np.testing.assert_allclose(out.joints, ref_joints.numpy(), atol=1e-4)
    np.testing.assert_allclose(out.rotations, ref_rs.numpy(), atol=1e-4)
