"""Import a trained *reference* tf.train.Checkpoint into this framework.

Migration path for users of the reference: a checkpoint written by the
reference Trainer (ref src/trainer.py:192-198) — or its Predictor's
identical bundle (ref src/predictor.py:79-86) — becomes a native Orbax
checkpoint this framework's Trainer/Predictor restore directly.

The reference bundle's object graph:
  generator_optimizer / discriminator_optimizer   keras Adam (slots skipped)
  feature_extractor   keras ResNet50(include_top=False, pooling='avg')
                      (ref src/models.py:35-41)
  generator3d         Sequential 2133 -> 1024 -> drop -> 1024 -> drop -> 85
                      (ref src/models.py:60-74)
  discriminator       3-stream functional critic (ref src/models.py:158-202)
  inital_theta [sic]  (1, 85) initial mean-theta variable

This module rebuilds that graph under modern TF/Keras, restores the
checkpoint into it, and ports every weight onto this framework's pytrees.

Two deliberate semantic notes:
* SURVEY.md §8 quirk 5 — the reference trains a SECOND mean-theta
  (``mean_var``) it never checkpoints; ``inital_theta`` is all any
  restore (including the reference's own Predictor) can recover, so the
  import is exactly as faithful as the reference to itself.
* Optimizer moments are not imported (fresh optax state): the reference's
  own resume already restarts step/epoch accounting (SURVEY.md §5), and
  Keras<->optax slot-variable mapping is not stable across versions.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

CRITIC_DENSE_NAMES = (
    "kcs_dense",
    "joints_dense",
    "combined_dense",
    "shapes_dense_1",
    "shapes_dense_2",
    "shapes_dense_3",
    "rotation_dense_1",
    "rotation_dense_2",
    "rotation_dense_3",
)


# ---------------------------------------------------------------------------
# Reference network graphs (reconstructed, not imported from the reference)
# ---------------------------------------------------------------------------


def build_reference_encoder():
    """The reference EncoderNetwork graph (ref src/models.py:35-41),
    without the ImageNet download (weights come from the checkpoint)."""
    from tensorflow.keras.applications import ResNet50

    return ResNet50(include_top=False, weights=None, pooling="avg")


def build_reference_regressor(num_input: int = 2133, num_output: int = 85):
    """The reference RegressionNetwork graph (ref src/models.py:60-74)."""
    from tensorflow import keras
    from tensorflow.keras import layers

    model = keras.Sequential(
        [
            layers.Input((num_input,)),
            layers.Dense(1024, activation="relu"),
            layers.Dropout(0.5),
            layers.Dense(1024, activation="relu"),
            layers.Dropout(0.5),
            layers.Dense(num_output),
        ]
    )
    return model


def build_reference_critic():
    """The reference CriticNetwork graph (ref src/models.py:158-202).

    Rebuilt with keras.layers.Concatenate: the reference's ``tf.concat``
    on symbolic tensors no longer builds under Keras 3; layer names,
    sizes, activations and flatten order are reproduced 1:1 (this is the
    same oracle tests/test_critic_parity.py validates our Critic against).
    """
    import tensorflow as tf
    from tensorflow import keras
    from tensorflow.keras import layers

    kcs_in = layers.Input((13, 13), name="kcs_in")
    kcs = layers.Dense(100, activation=tf.nn.leaky_relu, name="kcs_dense")(
        layers.Flatten()(kcs_in)
    )
    joints_in = layers.Input((14, 3))
    joints = layers.Dense(100, activation=tf.nn.leaky_relu, name="joints_dense")(
        layers.Flatten()(joints_in)
    )
    skel = layers.Dense(1, name="combined_dense")(
        layers.Concatenate(axis=1)([kcs, joints])
    )
    shapes_in = layers.Input((10,))
    s = layers.Dense(10, activation="relu", name="shapes_dense_1")(shapes_in)
    s = layers.Dense(5, activation="relu", name="shapes_dense_2")(s)
    s = layers.Dense(1, name="shapes_dense_3")(s)
    rot_in = layers.Input((23, 3, 3), name="rotation_in")
    r = layers.Flatten()(rot_in)
    r = layers.Dense(300, activation=tf.nn.leaky_relu, name="rotation_dense_1")(r)
    r = layers.Dense(100, activation=tf.nn.leaky_relu, name="rotation_dense_2")(r)
    r = layers.Dense(1, name="rotation_dense_3")(r)
    out = layers.Concatenate(axis=1)([skel, s, r])
    return keras.Model(inputs=[kcs_in, joints_in, shapes_in, rot_in], outputs=out)


def make_reference_checkpoint(encoder, regressor, critic, inital_theta):
    """The reference's tf.train.Checkpoint object graph with its exact
    attribute names — including the ``inital_theta`` typo, which is part
    of the on-disk key space (ref src/trainer.py:192-198)."""
    import tensorflow as tf

    return tf.train.Checkpoint(
        generator_optimizer=tf.keras.optimizers.Adam(0.0),
        discriminator_optimizer=tf.keras.optimizers.Adam(0.0),
        feature_extractor=encoder,
        generator3d=regressor,
        discriminator=critic,
        inital_theta=inital_theta,
    )


def restore_reference_checkpoint(checkpoint_dir: str):
    """Rebuild the reference object graph and restore the latest
    checkpoint into it (as ref src/predictor.py:79-86 does).

    Returns (encoder, regressor, critic, inital_theta (1, 85) ndarray).
    """
    import tensorflow as tf

    encoder = build_reference_encoder()
    regressor = build_reference_regressor()
    critic = build_reference_critic()
    theta_var = tf.Variable(np.zeros((1, 85), np.float32))
    ckpt = make_reference_checkpoint(encoder, regressor, critic, theta_var)
    latest = tf.train.latest_checkpoint(checkpoint_dir)
    if latest is None:
        raise FileNotFoundError(f"no reference checkpoint under {checkpoint_dir}")
    ckpt.restore(latest).expect_partial()
    return encoder, regressor, critic, theta_var.numpy()


# ---------------------------------------------------------------------------
# Keras -> framework parameter ports
# ---------------------------------------------------------------------------


def port_regressor(keras_model) -> Dict[str, Any]:
    """Sequential Dense(1024)/Dense(1024)/Dense(85) -> IEFRegressor params
    ({'fc1','fc2','out'}; Dropout layers carry no weights)."""
    dense = [l for l in keras_model.layers if l.get_weights()]
    if len(dense) != 3:
        raise ValueError(
            f"expected 3 weighted layers in the regressor, got {len(dense)}"
        )
    out = {}
    for name, layer in zip(("fc1", "fc2", "out"), dense):
        kernel, bias = layer.get_weights()
        out[name] = {"kernel": np.asarray(kernel), "bias": np.asarray(bias)}
    return out


def port_critic(keras_model) -> Dict[str, Any]:
    """Name-for-name Dense port (our Critic uses the reference's layer
    names; flatten orders agree — row-major on both sides)."""
    out = {}
    for name in CRITIC_DENSE_NAMES:
        kernel, bias = keras_model.get_layer(name).get_weights()
        out[name] = {"kernel": np.asarray(kernel), "bias": np.asarray(bias)}
    return out


# ---------------------------------------------------------------------------
# Full import
# ---------------------------------------------------------------------------


def import_reference_checkpoint(
    checkpoint_dir: str, out_dir: str, config
) -> Tuple[Any, np.ndarray]:
    """Convert a reference checkpoint into a native Orbax checkpoint.

    Writes a step-0 checkpoint under ``out_dir`` that both
    ``Trainer(train_from_checkpoint=True)`` and ``Predictor`` restore.
    Returns (train_state, inital_theta) for callers that want the pytree.
    """
    import jax
    import jax.numpy as jnp
    from flax.core import FrozenDict

    from ..core.smpl import load_model
    from .critic import Critic
    from .hmr import HMR
    from .port_keras import port_resnet50
    from ..train.state import create_train_state
    from ..utils.checkpoint import save_train_state

    encoder_k, regressor_k, critic_k, inital_theta = restore_reference_checkpoint(
        checkpoint_dir
    )
    enc_params, enc_stats = port_resnet50(encoder_k)
    reg_params = port_regressor(regressor_k)
    critic_params = port_critic(critic_k)

    smpl = load_model(config.smpl_model_path)
    dtype = jnp.bfloat16 if config.encoder_dtype == "bfloat16" else jnp.float32
    hmr = HMR(
        smpl,
        num_stage=config.num_stage,
        joint_type=config.joint_type,
        encoder_dtype=dtype,
    )
    state = create_train_state(
        jax.random.PRNGKey(config.seed),
        hmr,
        Critic(),
        inital_theta,
        config.generator_lr,
        config.critic_lr,
        img_size=config.img_size,
    )
    gen_params = FrozenDict(
        {
            "encoder": jax.tree.map(jnp.asarray, enc_params),
            "regressor": jax.tree.map(jnp.asarray, reg_params),
            "mean_theta": jnp.asarray(inital_theta, jnp.float32),
        }
    )
    state = state.replace(
        gen_params=gen_params,
        batch_stats={"encoder": jax.tree.map(jnp.asarray, enc_stats)},
        critic_params=jax.tree.map(jnp.asarray, critic_params),
    )
    save_train_state(out_dir, state, step=0)
    return state, inital_theta
