"""Chunk-size sweep for the fused chamfer value+grad Pallas kernel
(the training path, ops/pallas_chamfer._chamfer_value_and_grad_pallas).

The custom-VJP forward halves the requested chunk (128 -> 64) because
the backward kernel keeps more (C, V) intermediates live than the
forward; PERF.md flags ~1 ms of headroom in a restructure that fits a
bigger tile. This sweep measures the fused kernel at several chunk
sizes directly (and reports compile failures as OOM) so that headroom
claim is settled by measurement.

    python benchmarks/chamfer_chunk_bench.py --batch 64 --pixels 2048
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from human_pose_estimation_tpu.utils.jax_cache import ensure_compilation_cache

ensure_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from human_pose_estimation_tpu.ops.pallas_chamfer import (
    _chamfer_value_and_grad_pallas,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--pixels", type=int, default=2048)
    ap.add_argument("--verts", type=int, default=6890)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--chunks", default="32,64,128,256")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    gt = jnp.asarray(rng.rand(args.batch, args.pixels, 2) * 224, jnp.float32)
    mask = jnp.ones((args.batch, args.pixels), jnp.float32)
    pred = jnp.asarray(rng.rand(args.batch, args.verts, 2) * 224, jnp.float32)

    for chunk in (int(c) for c in args.chunks.split(",")):

        @jax.jit
        def run(gt, mask, pred):
            v, g = _chamfer_value_and_grad_pallas(
                gt, mask, pred, chunk_size=chunk, interpret=False
            )
            # chain-friendly scalar so dispatches serialize
            return jnp.sum(v) + jnp.sum(g[:, 0, :])

        try:
            acc = run(gt, mask, pred)
            jax.device_get(acc)
            # chained timing: feed the scalar back through pred
            t0 = time.perf_counter()
            for _ in range(args.iters):
                # 1e-30 keeps the cross-call dependency un-foldable while
                # perturbing coordinates by less than f32 resolution
                acc = run(gt, mask, pred + acc * 1e-30)
            jax.device_get(acc)
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            print(json.dumps({"chunk": chunk, "ms": round(ms, 2)}), flush=True)
        except Exception as e:  # noqa: BLE001 - report OOM/compile failure
            print(
                json.dumps({"chunk": chunk, "error": f"{type(e).__name__}: {str(e)[:200]}"}),
                flush=True,
            )


if __name__ == "__main__":
    main()
