"""Reference-checkpoint import: a tf.train.Checkpoint written with the
reference's object graph (ref src/trainer.py:192-198) round-trips into a
native Orbax checkpoint with every weight intact.

The saver and the importer use SEPARATE model instances, so a silent
``expect_partial`` no-op restore (weights left at random init) fails the
equality checks.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _assert_trees_close(ours, theirs, atol=0.0):
    leaves_a, tdef_a = jax.tree.flatten(ours)
    leaves_b, tdef_b = jax.tree.flatten(theirs)
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)


@pytest.mark.slow
def test_import_reference_checkpoint_roundtrip(tmp_path, rng):
    tf = pytest.importorskip("tensorflow")

    from human_pose_estimation_tpu.config import Config
    from human_pose_estimation_tpu.core.smpl import save_model_npz
    from human_pose_estimation_tpu.models import port_reference as pr
    from human_pose_estimation_tpu.models.port_keras import port_resnet50
    from human_pose_estimation_tpu.utils.assets import synthetic_model

    # --- write a "reference" checkpoint from one set of model instances --
    src_encoder = pr.build_reference_encoder()
    src_regressor = pr.build_reference_regressor()
    src_critic = pr.build_reference_critic()
    theta0 = (rng.randn(1, 85) * 0.1).astype(np.float32)
    ckpt = pr.make_reference_checkpoint(
        src_encoder, src_regressor, src_critic, tf.Variable(theta0)
    )
    ref_dir = tmp_path / "ref_ckpts"
    ckpt.save(str(ref_dir / "ckpt"))

    # --- import through the real pipeline (fresh instances inside) -------
    model_path = tmp_path / "model.npz"
    save_model_npz(synthetic_model(num_verts=120, seed=0), str(model_path))
    cfg = Config(
        smpl_model_path=str(model_path),
        checkpoint_dir=str(tmp_path / "orbax"),
    )
    state, inital_theta = pr.import_reference_checkpoint(
        str(ref_dir), cfg.checkpoint_dir, cfg
    )

    np.testing.assert_allclose(inital_theta, theta0)
    np.testing.assert_allclose(
        np.asarray(state.gen_params["mean_theta"]), theta0
    )

    # every ported weight equals the SOURCE models' weights
    src_enc_params, src_enc_stats = port_resnet50(src_encoder)
    _assert_trees_close(state.gen_params["encoder"], src_enc_params)
    _assert_trees_close(state.batch_stats["encoder"], src_enc_stats)
    _assert_trees_close(
        state.gen_params["regressor"], pr.port_regressor(src_regressor)
    )
    _assert_trees_close(state.critic_params, pr.port_critic(src_critic))

    # --- the written Orbax checkpoint restores through the serving path --
    from human_pose_estimation_tpu.core.smpl import load_model
    from human_pose_estimation_tpu.models.hmr import HMR
    from human_pose_estimation_tpu.utils.checkpoint import restore_for_inference

    hmr = HMR(load_model(str(model_path)), encoder_dtype=jnp.float32)
    variables, mean_theta = restore_for_inference(cfg.checkpoint_dir, hmr, cfg)
    np.testing.assert_allclose(mean_theta, theta0)
    _assert_trees_close(variables["params"]["encoder"], src_enc_params)
    _assert_trees_close(variables["params"]["regressor"],
                        pr.port_regressor(src_regressor))

    # --- functional spot check: imported critic == reference critic ------
    from human_pose_estimation_tpu.models.critic import Critic

    kcs = rng.randn(4, 13, 13).astype(np.float32)
    joints = rng.randn(4, 14, 3).astype(np.float32)
    shapes = rng.randn(4, 10).astype(np.float32)
    rots = rng.randn(4, 23, 3, 3).astype(np.float32)
    ours = Critic().apply(
        {"params": state.critic_params},
        jnp.asarray(kcs), jnp.asarray(joints),
        jnp.asarray(shapes), jnp.asarray(rots),
    )
    theirs = src_critic(
        [tf.constant(kcs), tf.constant(joints), tf.constant(shapes),
         tf.constant(rots)],
        training=False,
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_port_regressor_rejects_wrong_layer_count():
    pytest.importorskip("tensorflow")
    from tensorflow import keras
    from tensorflow.keras import layers

    from human_pose_estimation_tpu.models.port_reference import port_regressor

    bad = keras.Sequential([layers.Input((8,)), layers.Dense(4)])
    with pytest.raises(ValueError, match="3 weighted layers"):
        port_regressor(bad)


@pytest.mark.slow
def test_import_encoder_cli_builds_init_donor(tmp_path):
    """cli/import_encoder: Keras ResNet-50 weights (local .h5 path, the
    offline ImageNet flow of ref src/models.py:35-41) -> step-0 donor
    checkpoint whose encoder subtree is exactly the ported weights and
    which restore_raw (the --init_encoder_from consumer) can read."""
    tf = pytest.importorskip("tensorflow")
    from tensorflow.keras import applications as kapps

    from human_pose_estimation_tpu.cli import import_encoder
    from human_pose_estimation_tpu.core.smpl import save_model_npz
    from human_pose_estimation_tpu.models.port_keras import port_resnet50
    from human_pose_estimation_tpu.utils import checkpoint as ckpt
    from human_pose_estimation_tpu.utils.assets import synthetic_model

    km = kapps.ResNet50(include_top=False, weights=None, pooling="avg")
    h5 = str(tmp_path / "rn50.weights.h5")
    km.save_weights(h5)
    exp_params, exp_stats = port_resnet50(km)

    model_path = str(tmp_path / "model.npz")
    save_model_npz(synthetic_model(num_verts=120, seed=0), model_path)
    donor = str(tmp_path / "donor")
    import_encoder.main(
        [
            "--keras_weights", h5,
            "--checkpoint_dir", donor,
            "--smpl_model_path", model_path,
            "--img_size", "56",
        ]
    )
    raw, step = ckpt.restore_raw(donor)
    assert step == 0
    _assert_trees_close(raw["gen_params"]["encoder"], exp_params)
    _assert_trees_close(raw["batch_stats"]["encoder"], exp_stats)
