"""Benchmark: fused 224px HMR inference throughput on one chip.

Measures the flagship serving graph — ResNet-50 (bf16) + 3x IEF + full
6890-vertex SMPL + projection — as one jit-compiled program, steady-state,
and prints ONE JSON line. Baseline: 5,000 img/s/chip (BASELINE.md rebuild
target; the reference publishes no throughput numbers).
"""
from __future__ import annotations

import functools
import json
import time


def main():
    import os

    # Persistent XLA compile cache: repeat bench runs skip the ~1-2 min
    # first compile (keys include program + topology, safe to share).
    # Must go through jax.config — sitecustomize may preload jax, after
    # which the env var alone is silently ignored (utils/jax_cache.py).
    import jax

    from human_pose_estimation_tpu.utils.jax_cache import (
        ensure_compilation_cache,
    )

    ensure_compilation_cache()
    import jax.numpy as jnp
    import numpy as np

    from human_pose_estimation_tpu.models.hmr import HMR
    from human_pose_estimation_tpu.utils.assets import (
        synthetic_mean_params,
        synthetic_model,
    )


    default_batch = "512" if jax.default_backend() != "cpu" else "8"
    batch = int(os.environ.get("BENCH_BATCH", default_batch))
    # Default serving config: PTQ int8 encoder (models/quantize.py) —
    # 1.4x over bf16 on v5e at ~0.5% output drift (PERF.md "int8 PTQ
    # encoder"). BENCH_INT8=0 measures the bf16 reference-parity graph.
    int8 = os.environ.get("BENCH_INT8", "1") != "0"
    smpl = synthetic_model(num_verts=6890, seed=0)
    hmr = HMR(smpl, num_stage=3, joint_type="lsp", encoder_dtype=jnp.bfloat16)
    variables = hmr.init(jax.random.PRNGKey(0), img_size=224)
    mean_theta = jnp.asarray(synthetic_mean_params()[None, :])

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, 224, 224, 3).astype(np.float32) * 2 - 1)

    # Materialize the quantized weights on host once and feed them as a
    # jit ARGUMENT: embedding eagerly-computed arrays as closure constants
    # measured ~18x slower through relay attachments (PERF.md).
    qparams = None
    if int8:
        qparams = jax.jit(
            lambda v, c: hmr.quantize_encoder(v, calibration_images=c)
        )(variables, images[:64])
        qparams = jax.tree.map(jnp.asarray, jax.device_get(qparams))

    @jax.jit
    def forward(images, qparams):
        stages, _ = hmr(
            variables,
            images,
            mean_theta,
            train=False,
            smpl_stages="last",
            encoder_qparams=qparams,
        )
        last = stages[-1]
        return last.verts, last.cam, last.joints3d

    forward = functools.partial(forward, qparams=qparams)

    # Warmup / compile.
    jax.block_until_ready(forward(images))
    jax.block_until_ready(forward(images))

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(images)
    # device_get (not block_until_ready) as the final sync: on relay
    # attachments block_until_ready can return before execution finishes,
    # while a host read cannot.
    jax.device_get(out[1][:1])
    dt = time.perf_counter() - t0
    img_per_sec = batch * iters / dt

    print(
        json.dumps(
            {
                "metric": "img/sec/chip 224px HMR inference",
                "value": round(img_per_sec, 1),
                "unit": "img/s",
                "vs_baseline": round(img_per_sec / 5000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
