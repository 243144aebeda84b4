"""ResNet-50 image encoder in Flax, architecturally identical to
``keras.applications.ResNet50`` so ImageNet weights port 1:1.

Capability parity with the reference encoder (ref src/models.py:35-41:
``ResNet50(include_top=False, weights='imagenet', pooling='avg')``).

Keras-compat details that matter for the <=1e-3 parity target:
* classic v1 bottleneck: the stride-2 conv is the *first* 1x1 of each
  downsampling block (not the 3x3 as in v1.5);
* every conv has a bias (Keras default);
* BatchNorm epsilon 1.001e-5, momentum 0.99;
* stem: explicit 3-pixel zero pad -> 7x7/2 valid conv -> BN/relu ->
  1-pixel pad -> 3x3/2 valid max pool;
* NHWC, global average pool head -> (N, 2048).

``compute_dtype=bfloat16`` runs convolutions/matmuls on the MXU in bf16
while keeping parameters and BN statistics in float32.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

BN_EPS = 1.001e-5
BN_MOMENTUM = 0.99

STAGE_SIZES = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1(x4) bottleneck with projection shortcut on the
    first block of each stage."""

    filters: int
    stride: int
    project: bool
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        conv = lambda f, k, s, name: nn.Conv(
            f,
            (k, k),
            strides=(s, s),
            padding="SAME" if k > 1 else "VALID",
            use_bias=True,
            dtype=self.compute_dtype,
            name=name,
        )
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.compute_dtype,
            name=name,
        )
        shortcut = x
        if self.project:
            shortcut = conv(self.filters * 4, 1, self.stride, "conv_sc")(x)
            shortcut = bn("bn_sc")(shortcut)
        y = conv(self.filters, 1, self.stride, "conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = conv(self.filters, 3, 1, "conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = conv(self.filters * 4, 1, 1, "conv3")(y)
        y = bn("bn3")(y)
        return nn.relu(y + shortcut)


def space_to_depth_2x2(x: jax.Array) -> jax.Array:
    """(N, H, W, C) -> (N, H/2, W/2, 4C) with channel order (dy, dx, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def conv1_kernel_to_s2d(w7: jax.Array) -> jax.Array:
    """Exact rewrite of the 7x7/stride-2 stem kernel for a 2x2
    space-to-depth input: (7, 7, C, F) -> (4, 4, 4C, F).

    With the input transformed by space_to_depth_2x2 and padded (2, 1)
    per spatial axis, a 4x4 stride-1 conv with this kernel produces
    bit-identical outputs to pad-3 + 7x7 stride-2 on the raw image
    (the MLPerf-style TPU stem optimization: stride-2 convs over
    3-channel inputs waste the MXU; this trades them for a dense
    stride-1 conv over 12 channels at half resolution).
    """
    c, f = w7.shape[2], w7.shape[3]
    w8 = jnp.zeros((8, 8, c, f), w7.dtype).at[1:8, 1:8].set(w7)
    # w'[a, b, (dy, dx, cc), f] = w8[2a + dy, 2b + dx, cc, f]
    w = w8.reshape(4, 2, 4, 2, c, f).transpose(0, 2, 1, 3, 4, 5)
    return w.reshape(4, 4, 4 * c, f)


class ResNet(nn.Module):
    """ResNet v1 backbone with an average-pool feature head.

    stem='s2d' uses the space-to-depth stem (mathematically exact
    conv1 rewrite, see conv1_kernel_to_s2d); parameters stay in the
    (4, 4, 4C, 64) layout, ported from 7x7 weights on demand."""

    stage_sizes: Sequence[int] = STAGE_SIZES[50]
    compute_dtype: Any = jnp.float32
    stem: str = "standard"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.compute_dtype)
        if self.stem == "s2d":
            x = space_to_depth_2x2(x)
            x = jnp.pad(x, ((0, 0), (2, 1), (2, 1), (0, 0)))
            x = nn.Conv(
                64,
                (4, 4),
                strides=(1, 1),
                padding="VALID",
                use_bias=True,
                dtype=self.compute_dtype,
                name="conv1",
            )(x)
        else:
            x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
            x = nn.Conv(
                64,
                (7, 7),
                strides=(2, 2),
                padding="VALID",
                use_bias=True,
                dtype=self.compute_dtype,
                name="conv1",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.compute_dtype,
            name="bn1",
        )(x)
        x = nn.relu(x)
        # Keras ZeroPadding2D pads with zeros before the max pool; post-relu
        # activations are >= 0 so this matches exactly.
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        for stage, num_blocks in enumerate(self.stage_sizes):
            filters = 64 * 2**stage
            for block in range(num_blocks):
                stride = 2 if (block == 0 and stage > 0) else 1
                x = Bottleneck(
                    filters=filters,
                    stride=stride,
                    project=(block == 0),
                    compute_dtype=self.compute_dtype,
                    name=f"stage{stage + 1}_block{block + 1}",
                )(x, train=train)

        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (N, 2048)
        return x.astype(jnp.float32)


def ResNet50(compute_dtype=jnp.float32, stem: str = "standard") -> ResNet:
    return ResNet(
        stage_sizes=STAGE_SIZES[50], compute_dtype=compute_dtype, stem=stem
    )


def make_resnet(depth: int = 50, compute_dtype=jnp.float32, stem: str = "standard") -> ResNet:
    """ResNet-{50,101,152} v1 encoder (Keras-compatible layout at every
    depth, so keras.applications.ResNet{101,152} weights port the same way
    as ResNet-50 — models/port_keras.py)."""
    if depth not in STAGE_SIZES:
        raise ValueError(f"encoder depth must be one of {sorted(STAGE_SIZES)}")
    return ResNet(
        stage_sizes=STAGE_SIZES[depth], compute_dtype=compute_dtype, stem=stem
    )


def convert_params_to_s2d(params):
    """Rewrite a standard-stem parameter tree for stem='s2d' in place
    (kernel transform only; everything else is shared)."""
    new = dict(params)
    conv1 = dict(new["conv1"])
    conv1["kernel"] = conv1_kernel_to_s2d(jnp.asarray(conv1["kernel"]))
    new["conv1"] = conv1
    return new
