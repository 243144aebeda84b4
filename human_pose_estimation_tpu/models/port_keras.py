"""Keras ResNet -> Flax parameter port.

The reference initializes its encoder from Keras ImageNet weights
(ref src/models.py:35-41). This tool maps ``keras.applications.ResNet50``
(and the deeper ResNet101/152 variants, which share the layer-naming
scheme) weights onto models/resnet.py's parameter tree, giving (a)
ImageNet initialization for training parity and (b) an exact-architecture
oracle: ported weights must reproduce Keras outputs to float tolerance
(tests/test_resnet_parity.py).

Keras layer name -> Flax module name:
  conv1_conv / conv1_bn                 -> conv1 / bn1
  conv{s+1}_block{b}_0_conv (shortcut)  -> stage{s}_block{b}/conv_sc
  conv{s+1}_block{b}_{i}_conv (i=1..3)  -> stage{s}_block{b}/conv{i}
  (bns analogously; gamma/beta -> scale/bias, moving_* -> batch_stats)
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

STAGE_BLOCKS = {1: 3, 2: 4, 3: 6, 4: 3}  # ResNet-50

DEPTH_STAGE_BLOCKS = {
    50: {1: 3, 2: 4, 3: 6, 4: 3},
    101: {1: 3, 2: 4, 3: 23, 4: 3},
    152: {1: 3, 2: 8, 3: 36, 4: 3},
}


def _keras_weight_map(keras_model) -> Dict[str, list]:
    return {layer.name: layer.get_weights() for layer in keras_model.layers}


def port_resnet50(keras_model) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns (params, batch_stats) pytrees for models.resnet.ResNet50."""
    return port_resnet(keras_model, depth=50)


def port_resnet(keras_model, depth: int = 50) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Port keras.applications.ResNet{50,101,152} weights (same layer
    naming at every depth) onto models.resnet.make_resnet(depth)."""
    stage_blocks = DEPTH_STAGE_BLOCKS[depth]
    w = _keras_weight_map(keras_model)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_conv(flax_name, keras_name):
        kernel, bias = w[keras_name]
        params[flax_name] = {"kernel": np.asarray(kernel), "bias": np.asarray(bias)}

    def put_bn(flax_name, keras_name):
        gamma, beta, mean, var = w[keras_name]
        params[flax_name] = {"scale": np.asarray(gamma), "bias": np.asarray(beta)}
        stats[flax_name] = {"mean": np.asarray(mean), "var": np.asarray(var)}

    put_conv("conv1", "conv1_conv")
    put_bn("bn1", "conv1_bn")

    for stage, blocks in stage_blocks.items():
        for b in range(1, blocks + 1):
            prefix = f"conv{stage + 1}_block{b}"
            mod = f"stage{stage}_block{b}"
            sub_p: Dict[str, Any] = {}
            sub_s: Dict[str, Any] = {}

            def bconv(flax_name, keras_name):
                kernel, bias = w[keras_name]
                sub_p[flax_name] = {
                    "kernel": np.asarray(kernel),
                    "bias": np.asarray(bias),
                }

            def bbn(flax_name, keras_name):
                gamma, beta, mean, var = w[keras_name]
                sub_p[flax_name] = {
                    "scale": np.asarray(gamma),
                    "bias": np.asarray(beta),
                }
                sub_s[flax_name] = {"mean": np.asarray(mean), "var": np.asarray(var)}

            if b == 1:
                bconv("conv_sc", f"{prefix}_0_conv")
                bbn("bn_sc", f"{prefix}_0_bn")
            for i in (1, 2, 3):
                bconv(f"conv{i}", f"{prefix}_{i}_conv")
                bbn(f"bn{i}", f"{prefix}_{i}_bn")
            params[mod] = sub_p
            stats[mod] = sub_s

    return params, stats


def load_imagenet_resnet50(weights: str = "imagenet"):
    """Build the Keras reference model (requires TF; downloads weights
    unless a local .h5 path is given) and port it."""
    return load_imagenet_resnet(depth=50, weights=weights)


def load_imagenet_resnet(depth: int = 50, weights: str = "imagenet"):
    """Build keras.applications.ResNet{depth} (requires TF; downloads
    weights unless a local .h5 path is given) and port it."""
    from tensorflow.keras import applications as kapps

    ctor = {50: kapps.ResNet50, 101: kapps.ResNet101, 152: kapps.ResNet152}[depth]
    keras_model = ctor(include_top=False, weights=weights, pooling="avg")
    return port_resnet(keras_model, depth=depth)
