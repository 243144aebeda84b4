"""Config system, mean-params loading, and metric unit tests."""
import json
import os

import numpy as np

import jax.numpy as jnp

from human_pose_estimation_tpu.config import (
    Config,
    load_config,
    parse_config,
    prepare_dirs,
    run_name,
    save_config,
)
from human_pose_estimation_tpu.ops.metrics import mean_per_joint_error, pck
from human_pose_estimation_tpu.utils.mean_params import load_mean_theta


def test_config_defaults_match_reference():
    """Hyperparameter defaults mirror ref src/config.py:36-98."""
    cfg = Config()
    assert cfg.img_size == 224
    assert cfg.num_stage == 3
    assert cfg.batch_size == 8
    assert cfg.epoch == 125
    assert cfg.generator_lr == 1e-4
    assert cfg.critic_lr == 5e-4
    assert cfg.kpr_loss_weight == 60.0
    assert cfg.mr_loss_weight == 1e-3
    assert cfg.critic_loss_weight == 1e-2
    assert cfg.trans_max == 20
    assert cfg.scale_min == 0.8 and cfg.scale_max == 1.23
    assert cfg.datasets == ["lsp_train", "lsp_ext"]
    assert cfg.mocap_datasets == ["CMU", "jointLim"]
    assert cfg.use_kpr_loss and not cfg.use_mesh_repro_loss
    assert cfg.use_gradient_penalty and not cfg.encoder_only


def test_parse_config_cli_overrides():
    cfg = parse_config(
        [
            "--batch_size", "16",
            "--use_mesh_repro_loss", "true",
            "--datasets", "lsp_train",
            "--generator_lr", "0.001",
        ]
    )
    assert cfg.batch_size == 16
    assert cfg.use_mesh_repro_loss is True
    assert cfg.datasets == ["lsp_train"]
    assert cfg.generator_lr == 0.001


def test_prepare_dirs_and_params_json(tmp_path):
    cfg = Config(
        logs=str(tmp_path / "logs"), checkpoint_dir=str(tmp_path / "ckpt")
    )
    cfg = prepare_dirs(cfg)
    assert os.path.isdir(cfg.model_dir)
    name = os.path.basename(cfg.model_dir)
    assert name.startswith("HMR") and "kp" in name  # encodes loss config
    path = save_config(cfg)
    loaded = load_config(path)
    assert loaded.batch_size == cfg.batch_size
    assert loaded.model_dir == cfg.model_dir


def test_run_name_encodes_hyperparams():
    a = run_name(Config())
    b = run_name(Config(use_mesh_repro_loss=True))
    assert "mr" in b and a != b


def test_mean_theta_h5_and_fallback(tmp_path):
    import h5py

    pose = np.random.RandomState(0).randn(72).astype(np.float32)
    shape = np.random.RandomState(1).randn(10).astype(np.float32)
    p = str(tmp_path / "neutral_smpl_mean_params.h5")
    with h5py.File(p, "w") as f:
        f["pose"] = pose
        f["shape"] = shape
    mean = load_mean_theta(p)
    assert mean.shape == (1, 85)
    assert mean[0, 0] == 0.9
    np.testing.assert_allclose(mean[0, 3], np.pi)  # upright global pose
    np.testing.assert_allclose(mean[0, 4:6], 0.0)  # rest of global rot zeroed
    np.testing.assert_allclose(mean[0, 6:75], pose[3:], atol=1e-6)
    np.testing.assert_allclose(mean[0, 75:], shape, atol=1e-6)

    fallback = load_mean_theta(str(tmp_path / "missing.h5"))
    assert fallback.shape == (1, 85) and fallback[0, 0] == 0.9


def test_pck_metric():
    # 2 joints: one exactly right, one far; torso size defined by joints 2/9
    gt = np.zeros((1, 14, 3), np.float32)
    gt[0, :, 2] = 1.0
    gt[0, 9, :2] = [0.0, 10.0]  # torso length 10 -> threshold 5
    pred = gt[0, :, :2].copy()[None]
    pred[0, 0] += 20.0  # one joint far off
    pred[0, 1] += 1.0  # within threshold
    score = float(pck(jnp.asarray(gt), jnp.asarray(pred), alpha=0.5))
    np.testing.assert_allclose(score, 13 / 14, atol=1e-6)

    err = float(mean_per_joint_error(jnp.asarray(gt), jnp.asarray(pred)))
    expect = (20.0 * np.sqrt(2) + np.sqrt(2)) / 14
    np.testing.assert_allclose(err, expect, rtol=1e-5)


def test_config_validation():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        Config(data_format="NCHW")
    with _pytest.raises(ValueError):
        Config(joint_type="h36m")


def test_pck_curve_auc_per_joint():
    """PCK curve is monotone and consistent with scalar pck; AUC in [0,1];
    per-joint vector has one entry per joint."""
    import jax.numpy as jnp

    from human_pose_estimation_tpu.ops.metrics import (
        pck,
        pck_auc,
        pck_curve,
        per_joint_pck,
    )

    rng = np.random.RandomState(0)
    gt = np.concatenate(
        [rng.rand(8, 14, 2) * 100, np.ones((8, 14, 1))], axis=-1
    ).astype(np.float32)
    pred = gt[..., :2] + rng.randn(8, 14, 2).astype(np.float32) * 5

    curve = np.asarray(pck_curve(gt, pred))
    assert (np.diff(curve) >= 0).all()
    assert abs(curve[-1] - float(pck(gt, pred, 0.5))) < 1e-6
    auc = float(pck_auc(gt, pred))
    assert 0.0 <= auc <= 1.0
    # AUC is below the endpoint PCK (curve increases to it)
    assert auc <= curve[-1] + 1e-6
    pj = np.asarray(per_joint_pck(gt, pred))
    assert pj.shape == (14,) and ((0 <= pj) & (pj <= 1)).all()
    # perfect predictions -> all ones
    assert np.asarray(pck_curve(gt, gt[..., :2]))[0] == 1.0


def test_procrustes_align_recovers_similarity_transform():
    """pa_error is ~0 when pred differs from gt by exactly a similarity
    transform (the monocular gauge freedom), and raw error is not."""
    import jax.numpy as jnp

    from human_pose_estimation_tpu.ops.metrics import pa_error, procrustes_align

    rng = np.random.RandomState(3)
    gt = rng.randn(4, 50, 3).astype(np.float32)
    # random rotations via QR (det fixed positive)
    q, _ = np.linalg.qr(rng.randn(4, 3, 3))
    q = q * np.sign(np.linalg.det(q))[:, None, None]
    s = rng.uniform(0.5, 2.0, size=(4, 1, 1)).astype(np.float32)
    t = rng.randn(4, 1, 3).astype(np.float32)
    pred = s * np.einsum("nij,npj->npi", q, gt) + t

    raw = np.linalg.norm(pred - gt, axis=-1).mean()
    assert raw > 0.1
    err = np.asarray(pa_error(jnp.asarray(pred), jnp.asarray(gt)))
    assert err.shape == (4,)
    np.testing.assert_allclose(err, 0.0, atol=1e-4)

    aligned = np.asarray(procrustes_align(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(aligned, gt, atol=1e-4)


def test_procrustes_align_reflection_guard_and_residual():
    """A reflected point set cannot be aligned by a rotation: the solver
    must keep det(R)=+1 (not silently mirror), leaving a real residual;
    and alignment never increases error on noisy data."""
    import jax.numpy as jnp

    from human_pose_estimation_tpu.ops.metrics import pa_error, procrustes_align

    rng = np.random.RandomState(4)
    gt = rng.randn(2, 40, 3).astype(np.float32)
    mirrored = gt * np.array([1.0, 1.0, -1.0], np.float32)
    aligned = np.asarray(
        procrustes_align(jnp.asarray(mirrored), jnp.asarray(gt))
    )
    # rotations are orthogonal with det +1: residual stays nonzero
    assert np.linalg.norm(aligned - gt, axis=-1).mean() > 0.05

    noisy = gt + rng.randn(*gt.shape).astype(np.float32) * 0.1
    raw = np.linalg.norm(noisy - gt, axis=-1).mean(axis=-1)
    pa = np.asarray(pa_error(jnp.asarray(noisy), jnp.asarray(gt)))
    assert (pa <= raw + 1e-5).all()
