"""Critic network parity: our Flax critic vs the reference CriticNetwork
(Keras functional, ref src/models.py:158-202) with identical weights."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from human_pose_estimation_tpu.models.critic import Critic


def _build_reference_critic():
    """The reference CriticNetwork graph (ref src/models.py:158-202),
    reconstructed with keras.layers.Concatenate — the reference's
    ``tf.concat`` on symbolic tensors no longer builds under Keras 3, so
    the architecture (layer names, sizes, activations, flatten order) is
    reproduced 1:1 here as the parity oracle."""
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


def test_critic_matches_reference(reference_src, rng):
    tf = pytest.importorskip("tensorflow")

    ref = _build_reference_critic()
    critic = Critic()
    variables = critic.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 13, 13)),
        jnp.zeros((1, 14, 3)),
        jnp.zeros((1, 10)),
        jnp.zeros((1, 23, 3, 3)),
    )
    params = variables["params"]

    # copy our weights into the reference model, by layer name
    for name in (
        "kcs_dense",
        "joints_dense",
        "combined_dense",
        "shapes_dense_1",
        "shapes_dense_2",
        "shapes_dense_3",
        "rotation_dense_1",
        "rotation_dense_2",
        "rotation_dense_3",
    ):
        layer = ref.get_layer(name)
        layer.set_weights(
            [np.asarray(params[name]["kernel"]), np.asarray(params[name]["bias"])]
        )

    n = 6
    kcs = rng.randn(n, 13, 13).astype(np.float32)
    joints = rng.randn(n, 14, 3).astype(np.float32)
    shapes = rng.randn(n, 10).astype(np.float32)
    rots = rng.randn(n, 23, 3, 3).astype(np.float32)

    ours = critic.apply(
        variables, jnp.asarray(kcs), jnp.asarray(joints),
        jnp.asarray(shapes), jnp.asarray(rots),
    )
    theirs = ref(
        [tf.constant(kcs), tf.constant(joints), tf.constant(shapes),
         tf.constant(rots)],
        training=False,
    ).numpy()
    assert theirs.shape == (n, 3)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)
