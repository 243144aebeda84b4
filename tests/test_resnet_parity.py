"""ResNet-50 encoder parity: our Flax model with ported Keras weights must
reproduce Keras outputs (the architecture-equivalence oracle that makes
ImageNet-weight ports exact; BASELINE.md <=1e-3 parity)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from human_pose_estimation_tpu.models.resnet import ResNet50
from human_pose_estimation_tpu.models.port_keras import port_resnet50


def _perturb_bn_stats(keras_model, seed=1):
    """Give every BatchNorm non-default moving statistics and affine
    params before porting. A PRETRAINED checkpoint differs from a fresh
    Keras model exactly here (moving_mean/var far from 0/1, gamma/beta
    far from 1/0) — the environment is offline (no ImageNet weights
    fetchable; README "Pretrained encoder weights"), so this makes the
    parity oracle sensitive to the same port bugs real weights would
    expose (eps placement, variance-vs-std, stat/affine swaps)."""
    rng = np.random.RandomState(seed)
    for v in keras_model.variables:
        arr = v.numpy()
        name = v.name
        if "moving_variance" in name:
            v.assign(rng.lognormal(0.0, 1.0, arr.shape).astype(arr.dtype))
        elif "moving_mean" in name:
            v.assign((rng.randn(*arr.shape) * 0.5).astype(arr.dtype))
        elif "gamma" in name:
            v.assign((1.0 + rng.randn(*arr.shape) * 0.3).astype(arr.dtype))
        elif "beta" in name:
            v.assign((rng.randn(*arr.shape) * 0.3).astype(arr.dtype))


@pytest.mark.slow
def test_resnet50_matches_keras():
    tf = pytest.importorskip("tensorflow")
    from tensorflow.keras.applications import ResNet50 as KerasResNet50

    keras_model = KerasResNet50(include_top=False, weights=None, pooling="avg")
    _perturb_bn_stats(keras_model)
    params, stats = port_resnet50(keras_model)

    model = ResNet50()
    rng = np.random.RandomState(0)
    x = rng.rand(2, 224, 224, 3).astype(np.float32) * 2 - 1

    ours = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    theirs = keras_model(tf.constant(x), training=False).numpy()
    assert ours.shape == theirs.shape == (2, 2048)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4, rtol=1e-3)


def test_resnet_small_shapes():
    model = ResNet50()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    out = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    assert out.shape == (2, 2048)
    # param count ~23.6M (ResNet50 sans top)
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))
    assert 23_000_000 < n_params < 26_000_000


@pytest.mark.slow
def test_resnet101_matches_keras():
    """The deeper encoder variants share the port path; verify the
    block-count table against Keras ResNet101 end to end."""
    tf = pytest.importorskip("tensorflow")
    from tensorflow.keras.applications import ResNet101 as KerasResNet101

    from human_pose_estimation_tpu.models.port_keras import port_resnet
    from human_pose_estimation_tpu.models.resnet import make_resnet

    keras_model = KerasResNet101(include_top=False, weights=None, pooling="avg")
    _perturb_bn_stats(keras_model, seed=2)
    params, stats = port_resnet(keras_model, depth=101)

    model = make_resnet(101)
    rng = np.random.RandomState(0)
    x = rng.rand(2, 224, 224, 3).astype(np.float32) * 2 - 1
    ours = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    theirs = keras_model(tf.constant(x), training=False).numpy()
    assert ours.shape == theirs.shape == (2, 2048)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4, rtol=1e-3)


def test_make_resnet_depths():
    from human_pose_estimation_tpu.models.resnet import make_resnet

    expected = {50: (23e6, 26e6), 101: (42e6, 45e6), 152: (58e6, 61e6)}
    for depth, (lo, hi) in expected.items():
        model = make_resnet(depth)
        variables = jax.eval_shape(
            lambda m=model: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        )
        n_params = sum(
            np.prod(p.shape) for p in jax.tree.leaves(variables["params"])
        )
        assert lo < n_params < hi, (depth, n_params)
    with pytest.raises(ValueError):
        make_resnet(34)


def test_s2d_stem_exactness():
    """The space-to-depth stem is a mathematically exact rewrite of the
    7x7/stride-2 stem: same features on the same (ported) weights."""
    from human_pose_estimation_tpu.models.resnet import (
        ResNet,
        convert_params_to_s2d,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    std = ResNet(stage_sizes=(1, 1, 1, 1))
    variables = std.init(jax.random.PRNGKey(0), x)
    out_std = std.apply(variables, x, train=False)

    s2d = ResNet(stage_sizes=(1, 1, 1, 1), stem="s2d")
    params_s2d = convert_params_to_s2d(dict(variables["params"]))
    out_s2d = s2d.apply(
        {"params": params_s2d, "batch_stats": variables["batch_stats"]},
        x,
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out_std), np.asarray(out_s2d), atol=1e-5
    )
