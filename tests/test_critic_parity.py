"""Critic network parity: our Flax critic vs the reference CriticNetwork
(Keras functional, ref src/models.py:158-202) with identical weights."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from human_pose_estimation_tpu.models.critic import Critic


def _build_reference_critic():
    """Canonical rebuild of the reference CriticNetwork graph
    (ref src/models.py:158-202) — shared with the checkpoint importer."""
    from human_pose_estimation_tpu.models.port_reference import (
        build_reference_critic,
    )

    return build_reference_critic()


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
