"""Serialized serving artifacts via jax.export (StableHLO).

Exports the Predictor's fused inference graph — encoder + IEF + SMPL +
projection with the checkpoint's weights baked in as constants — to a
self-contained artifact a serving host can load WITHOUT the framework,
the SMPL asset, or the checkpoint directory (the reference has no export
story at all: serving requires the full training codebase + checkpoint,
ref src/predictor.py:68-86).

Artifact layout:
  <path>        StableHLO bytes (jax.export serialization)
  <path>.json   metadata: compiled batch/height/width, dtype, output keys

Exports are multi-platform by default (tpu + cpu): one artifact serves
on TPU hosts and falls back to CPU for local smoke tests.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

OUTPUT_KEYS = (
    "generated_verts",
    "generated_cams",
    "generated_joints",
    "theta",
    "kp2d",
)


def export_predictor(
    predictor,
    out_path: str,
    image_hw: Optional[Tuple[int, int]] = None,
    dtype: str = "uint8",
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> Dict:
    """Serialize the predictor's fused graph at its compiled batch size.

    image_hw defaults to (config.img_size, config.img_size); dtype
    'uint8' exports the serving fast path (device-side normalize).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    h, w = image_hw or (predictor.config.img_size, predictor.config.img_size)
    b = predictor.batch_size
    dt = jnp.uint8 if dtype == "uint8" else jnp.float32
    spec = jax.ShapeDtypeStruct((b, h, w, 3), dt)
    # Quantized weights (when Predictor(encoder_int8=...)) bake into the
    # artifact as constants, like the float weights.
    qp = getattr(predictor, "encoder_qparams", None)
    if qp is not None and qp.get("act") is None:
        raise ValueError(
            "refusing to export an UNCALIBRATED int8 predictor: it would "
            "permanently bake the per-image dynamic-scale graph, measured "
            "0.46x of bf16 (slower than not quantizing, PERF.md). "
            "Calibrate first — Predictor(calibration_images=...) or "
            "cli.export_model --calibration '<glob>'."
        )
    exp = jexport.export(
        jax.jit(lambda images: predictor._predict_impl(images, qp)),
        platforms=list(platforms),
    )(spec)
    blob = exp.serialize()
    meta = {
        "encoder_int8": qp is not None,
        "batch": b,
        "height": h,
        "width": w,
        "dtype": dtype,
        "platforms": list(platforms),
        "outputs": list(OUTPUT_KEYS),
        "num_stage": predictor.config.num_stage,
        "joint_type": predictor.config.joint_type,
    }
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)
    with open(out_path + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class ExportedPredictor:
    """Serving-side loader for an exported artifact.

    Drop-in for Predictor.predict / predict_single_image (same padding
    semantics, same output dict) but with no dependency on the model
    code, SMPL asset, or checkpoint — only jax + the artifact.
    """

    def __init__(self, path: str):
        from jax import export as jexport

        with open(path, "rb") as f:
            self._exp = jexport.deserialize(f.read())
        with open(path + ".json") as f:
            self.meta = json.load(f)
        self.batch_size = int(self.meta["batch"])

    def predict(self, images) -> Dict[str, np.ndarray]:
        import jax.numpy as jnp

        images = np.asarray(images)
        want = np.uint8 if self.meta["dtype"] == "uint8" else np.float32
        images = images.astype(want, copy=False)
        n = images.shape[0]
        b = self.batch_size
        if n > b:  # multiple executions of the fixed-batch executable
            out: Dict[str, list] = {k: [] for k in self.meta["outputs"]}
            for s in range(0, n, b):
                part = self.predict(images[s : s + b])
                for k, v in part.items():
                    out[k].append(v)
            return {k: np.concatenate(v) for k, v in out.items()}
        if n < b:
            images = np.concatenate(
                [images, np.zeros((b - n, *images.shape[1:]), images.dtype)]
            )
        res = self._exp.call(jnp.asarray(images))
        return {k: np.asarray(v)[:n] for k, v in res.items()}

    def predict_single_image(self, image):
        res = self.predict(np.asarray(image)[None])
        return (
            res["generated_verts"],
            res["generated_cams"],
            res["generated_joints"],
        )
