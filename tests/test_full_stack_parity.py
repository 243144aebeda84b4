"""Full-stack inference parity: our fused HMR forward vs the reference
pipeline composed from its own pieces (Keras ResNet-50 encoder + MLP
regressor + tf_smpl SMPL + batch_orth_proj_idrot), with IDENTICAL weights
on both sides. This is the BASELINE.md "vertex/keypoint outputs within
1e-3 of the TF2 reference" check, end to end."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from human_pose_estimation_tpu.models.hmr import HMR
from human_pose_estimation_tpu.models.port_keras import port_resnet50
from human_pose_estimation_tpu.utils import assets


@pytest.mark.slow
def test_full_inference_stack_parity(reference_src, tiny_model, tmp_path, rng):
    tf = pytest.importorskip("tensorflow")
    from tensorflow import keras
    from tensorflow.keras.applications import ResNet50 as KerasResNet50

    from src.tf_smpl.batch_smpl import SMPL as RefSMPL
    from src.tf_smpl.projection import batch_orth_proj_idrot

    # --- shared weights -------------------------------------------------
    keras_encoder = KerasResNet50(include_top=False, weights=None, pooling="avg")
    enc_params, enc_stats = port_resnet50(keras_encoder)

    hmr = HMR(tiny_model, num_stage=3, joint_type="lsp")
    variables = hmr.init(jax.random.PRNGKey(0), img_size=224)
    variables = {
        "params": {
            "encoder": enc_params,
            "regressor": variables["params"]["regressor"],
        },
        "batch_stats": {"encoder": enc_stats},
    }
    reg = variables["params"]["regressor"]

    # reference-side regressor with the same weights (dropout is inactive
    # at inference, so plain Dense stacks are equivalent)
    keras_reg = keras.Sequential(
        [
            keras.layers.Input((2048 + 85,)),
            keras.layers.Dense(1024, activation="relu"),
            keras.layers.Dense(1024, activation="relu"),
            keras.layers.Dense(85),
        ]
    )
    keras_reg.set_weights(
        [
            np.asarray(reg["fc1"]["kernel"]), np.asarray(reg["fc1"]["bias"]),
            np.asarray(reg["fc2"]["kernel"]), np.asarray(reg["fc2"]["bias"]),
            np.asarray(reg["out"]["kernel"]), np.asarray(reg["out"]["bias"]),
        ]
    )

    pkl = str(tmp_path / "model.pkl")
    assets.write_reference_pickle(tiny_model, pkl)
    ref_smpl = RefSMPL(pkl, joint_type="lsp")

    mean_theta = assets.synthetic_mean_params()[None, :]
    images = rng.rand(2, 224, 224, 3).astype(np.float32) * 2 - 1

    # --- ours: one fused forward ---------------------------------------
    stages, _ = hmr(variables, jnp.asarray(images), jnp.asarray(mean_theta))
    last = stages[-1]

    # --- reference composition (ref predictor.predict structure,
    #     src/predictor.py:114-158) ---------------------------------------
    feats = keras_encoder(tf.constant(images), training=False)
    theta = tf.constant(np.tile(mean_theta, (2, 1)))
    for _ in range(3):
        delta = keras_reg(tf.concat([feats, theta], axis=1), training=False)
        theta = theta + delta
        cam = theta[:, :3]
        pose = theta[:, 3:75]
        shape = theta[:, 75:]
        verts, joints, rs = ref_smpl(shape, pose, get_skin=True)
        kp = batch_orth_proj_idrot(joints, cam)

    np.testing.assert_allclose(
        np.asarray(last.theta), theta.numpy(), atol=1e-3
    )
    np.testing.assert_allclose(np.asarray(last.verts), verts.numpy(), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(last.joints3d), joints.numpy(), atol=1e-3
    )
    np.testing.assert_allclose(np.asarray(last.kp2d), kp.numpy(), atol=1e-3)
    # typically ~1e-5; assert we are well inside the budget
    assert np.abs(np.asarray(last.verts) - verts.numpy()).max() < 5e-4
