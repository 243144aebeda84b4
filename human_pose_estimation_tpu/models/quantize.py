"""Post-training int8 quantization for the ResNet encoder (inference).

The v5e MXU executes s8 x s8 -> s32 convolutions at twice the bf16 rate
(~394 TOPS vs ~197 TFLOPS), and the encoder is ~97% of the fused HMR
inference graph (PERF.md) — so an int8 encoder is the single largest
serving-throughput lever in this framework. The reference has no
quantized path (its encoder is the stock fp32 Keras ResNet50,
ref src/models.py:35-41); this is a switching-cost *addition* for
production serving.

Scheme (standard TPU-friendly PTQ):
  * BatchNorm folded into the preceding conv (every conv in the Keras
    ResNet topology is immediately followed by its BN):
        BN(conv(x, w) + b) = conv(x, w * g) + (b - mean) * g + beta,
        g = gamma / sqrt(var + eps), broadcast over the output channel.
  * Weights: symmetric per-output-channel int8
        s_w[oc] = max|w'[..., oc]| / 127,  w_q = round(w' / s_w).
  * Activations: symmetric int8 with either
      - static per-tensor scales from a calibration batch (the fast
        path: dequant + bias + relu + requant all fuse into the conv
        epilogue, activations travel between blocks as int8, and the max
        pool runs directly on int8 — dequantization is monotonic), or
      - per-image dynamic scales max|x[n]|/127 (no calibration needed,
        but the max-reduction forces extra HBM passes over every
        activation: measured SLOWER than bf16 at batch 512 — use it only
        to calibrate or as a correctness oracle).
  * Accumulation in int32 on the MXU; residual adds in float32 inside
    the fused epilogue of the closing 1x1 conv.

Quantization error on the 2048-d feature vector is small (tests bound
it) but the path is opt-in: `Predictor(encoder_int8=True)` /
`HMR.quantize_encoder`.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from .resnet import BN_EPS


def fold_conv_bn(kernel, bias, bn) -> Dict[str, jax.Array]:
    """Fold a BatchNorm (inference form) into the preceding conv.

    Args:
      kernel: (kh, kw, ic, oc) conv kernel.
      bias: (oc,) conv bias.
      bn: dict with 'scale', 'bias' (params) and 'mean', 'var' (stats).
    Returns:
      {'kernel', 'bias'} of the equivalent single conv.
    """
    g = bn["scale"] / jnp.sqrt(bn["var"] + BN_EPS)
    return {
        "kernel": kernel * g,  # broadcasts over the trailing oc axis
        "bias": (bias - bn["mean"]) * g + bn["bias"],
    }


def quantize_conv(folded: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Symmetric per-output-channel int8 quantization of a folded conv."""
    w = folded["kernel"].astype(jnp.float32)
    s_w = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0  # (oc,)
    s_w = jnp.maximum(s_w, 1e-12)
    w_q = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
    return {"w": w_q, "s": s_w, "b": folded["bias"].astype(jnp.float32)}


def _bn_tree(params_bn, stats_bn) -> Dict[str, jax.Array]:
    return {
        "scale": params_bn["scale"],
        "bias": params_bn["bias"],
        "mean": stats_bn["mean"],
        "var": stats_bn["var"],
    }


def quantize_resnet(
    params, batch_stats, stage_sizes: Sequence[int]
) -> Dict[str, Any]:
    """Fold + quantize every conv/BN pair of a ResNet encoder tree
    (models/resnet.py layout) into an int8 parameter pytree.

    Pure function of the variables — run it once at restore time; the
    result feeds `resnet_apply_int8`.
    """
    q: Dict[str, Any] = {}

    def fold_q(conv_name: str, bn_name: str, scope_p, scope_s):
        folded = fold_conv_bn(
            scope_p[conv_name]["kernel"],
            scope_p[conv_name]["bias"],
            _bn_tree(scope_p[bn_name], scope_s[bn_name]),
        )
        return quantize_conv(folded)

    q["conv1"] = fold_q("conv1", "bn1", params, batch_stats)
    for stage, num_blocks in enumerate(stage_sizes):
        for block in range(num_blocks):
            name = f"stage{stage + 1}_block{block + 1}"
            bp, bs = params[name], batch_stats[name]
            blk = {
                "conv1": fold_q("conv1", "bn1", bp, bs),
                "conv2": fold_q("conv2", "bn2", bp, bs),
                "conv3": fold_q("conv3", "bn3", bp, bs),
            }
            if "conv_sc" in bp:
                blk["conv_sc"] = fold_q("conv_sc", "bn_sc", bp, bs)
            q[name] = blk
    return q


def _conv_i8(
    x_q: jax.Array, w_q: jax.Array, stride: int, padding, out_dtype=jnp.int32
) -> jax.Array:
    """s8 x s8 convolution on the MXU. out_dtype=bfloat16 rounds the
    int32 accumulator on write (~0.4% of max — below the int8 quant noise)
    but halves the conv-output HBM traffic, which is what the epilogues
    are bound by."""
    dn = jax.lax.conv_dimension_numbers(
        x_q.shape, w_q.shape, ("NHWC", "HWIO", "NHWC")
    )
    return jax.lax.conv_general_dilated(
        x_q,
        w_q,
        (stride, stride),
        padding,
        dimension_numbers=dn,
        preferred_element_type=out_dtype,
    )


def resnet_apply_int8(
    qparams,
    images: jax.Array,
    stage_sizes: Sequence[int],
    act_scales=None,
    observe: bool = False,
    conv_out_dtype=jnp.bfloat16,
):
    """Quantized ResNet encoder forward: (N,H,W,3) in [-1,1] -> (N,2048)
    f32 features. Mirrors models/resnet.py's standard-stem topology
    exactly (pad-3 7x7/2 stem, 3x3/2 max pool, v1 bottlenecks with the
    stride on the first 1x1).

    Args:
      qparams: int8 weights from `quantize_resnet`.
      act_scales: static activation scales (from `calibrate_resnet`) —
        the fast path. None -> per-image dynamic scales (slow; no
        calibration needed).
      observe: also return the batch-max dynamic scale per activation
        site (the calibration hook).
      conv_out_dtype: conv accumulator write type. bfloat16 (default)
        halves conv-output traffic at ~0.4%-of-max rounding; int32 is
        exact.
    Returns:
      features, or (features, observed_scales) when observe=True.
    """
    observed = {}
    # The inter-conv dequantized domain runs in bf16: the epilogues
    # (dequant + bias + relu + requant, residual adds) are HBM-bound, and
    # bf16 halves their traffic. bf16 roundoff (~0.4%) is below the int8
    # quantization error the path already carries.
    eps_dtype = jnp.bfloat16

    def quant(x, site):
        """eps_dtype -> (int8 values, f32 scale). The scale is a scalar
        (static mode) or a (N,1,1,1) per-image vector (dynamic mode);
        everything downstream broadcasts over either form."""
        xf = x.astype(jnp.float32)
        if observe or act_scales is None:
            s_dyn = jnp.maximum(
                jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True) / 127.0, 1e-12
            )
            if observe:
                observed[site] = jnp.max(s_dyn)
        s = act_scales[site] if act_scales is not None else s_dyn
        x_q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
        return x_q, s

    def deq(y_i32, s_x, layer):
        y = y_i32.astype(jnp.float32) * (s_x * layer["s"]) + layer["b"]
        return y.astype(eps_dtype)

    x = images.astype(jnp.float32)
    # Stem: explicit pad + VALID 7x7/2 (the f32 path pads before nn.Conv;
    # int8 conv runs the same shapes). Zero padding is exact: symmetric
    # quantization maps 0.0 -> 0.
    x_q, s_in = quant(jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0))), "stem_in")
    y = deq(_conv_i8(x_q, qparams["conv1"]["w"], 2, "VALID", conv_out_dtype), s_in, qparams["conv1"])
    x_q, s_in = quant(jax.nn.relu(y), "stem_out")
    # Max pool directly on int8: dequantization (positive scale) is
    # monotonic, so int8 max == quantized f32 max. Zero pad = real zero,
    # and post-relu values are >= 0, matching Keras ZeroPadding2D + pool.
    x_q = jnp.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)))
    x_q = jax.lax.reduce_window(
        x_q, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )

    # Blocks carry (x_q int8, s_in): conv1 and conv_sc consume the same
    # quantized tensor; each block's output is requantized inside the
    # closing add+relu epilogue.
    for stage, num_blocks in enumerate(stage_sizes):
        for block in range(num_blocks):
            stride = 2 if (block == 0 and stage > 0) else 1
            name = f"stage{stage + 1}_block{block + 1}"
            blk = qparams[name]
            if "conv_sc" in blk:
                shortcut = deq(
                    _conv_i8(x_q, blk["conv_sc"]["w"], stride, "VALID", conv_out_dtype),
                    s_in,
                    blk["conv_sc"],
                )
            else:
                shortcut = x_q.astype(jnp.float32) * s_in
            y = deq(_conv_i8(x_q, blk["conv1"]["w"], stride, "VALID", conv_out_dtype), s_in, blk["conv1"])
            y_q, s_y = quant(jax.nn.relu(y), f"{name}/y1")
            y = deq(_conv_i8(y_q, blk["conv2"]["w"], 1, "SAME", conv_out_dtype), s_y, blk["conv2"])
            y_q, s_y = quant(jax.nn.relu(y), f"{name}/y2")
            y = deq(_conv_i8(y_q, blk["conv3"]["w"], 1, "VALID", conv_out_dtype), s_y, blk["conv3"])
            x_q, s_in = quant(jax.nn.relu(y + shortcut), f"{name}/out")

    feats = jnp.mean(x_q.astype(jnp.float32) * s_in, axis=(1, 2))
    if observe:
        return feats, observed
    return feats


def calibrate_resnet(
    qparams, images: jax.Array, stage_sizes: Sequence[int]
) -> Dict[str, jax.Array]:
    """Static activation scales from a calibration batch: runs the
    dynamic-scale quantized forward once and records the batch-max scale
    at every activation site. Feed any representative batch (e.g. the
    serving warmup batch)."""
    _, observed = resnet_apply_int8(
        qparams, images, stage_sizes, act_scales=None, observe=True
    )
    return observed
