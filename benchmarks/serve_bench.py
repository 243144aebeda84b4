"""Serving-path throughput/latency benchmark.

Drives the BatchingPredictor with many concurrent client threads (the
deployment shape: RPC handlers blocking on futures) and reports
latency percentiles + sustained throughput at several offered loads.

    python benchmarks/serve_bench.py --batch 32 --clients 8,64 --requests 256
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent XLA compile cache (same as bench.py): repeat runs skip the
# multi-minute first compile of the serving batch through the relay.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/hpe_jax_cache")
)
# The env var alone is ignored when sitecustomize preloads jax; route
# through jax.config as well (utils/jax_cache.py).
from human_pose_estimation_tpu.utils.jax_cache import ensure_compilation_cache

ensure_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--clients", default="8,64")
    ap.add_argument("--requests", type=int, default=256)
    ap.add_argument("--max_latency_ms", type=float, default=5.0)
    ap.add_argument("--pipeline_depth", default="1",
                    help="comma list sweeps depths in one process (fair "
                         "comparison: relay latency varies run to run)")
    ap.add_argument("--outputs", default=None,
                    help="comma-separated output keys (e.g. generated_joints,generated_cams)")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from human_pose_estimation_tpu.infer.predictor import Predictor
    from human_pose_estimation_tpu.infer.serving import BatchingPredictor
    from human_pose_estimation_tpu.models.hmr import HMR
    from human_pose_estimation_tpu.utils.assets import (
        synthetic_mean_params,
        synthetic_model,
    )
    import jax

    smpl = synthetic_model(num_verts=6890, seed=0)
    hmr = HMR(smpl, num_stage=3, joint_type="lsp", encoder_dtype=jnp.bfloat16)
    p = Predictor.__new__(Predictor)
    from human_pose_estimation_tpu.config import Config

    p.config = Config(batch_size=args.batch, img_size=args.img)
    p.batch_size = args.batch
    p.outputs = tuple(args.outputs.split(",")) if args.outputs else None
    p.mesh = None
    p.smpl = smpl
    p.hmr = hmr
    p.variables = hmr.init(jax.random.PRNGKey(0), img_size=args.img)
    p.mean_theta = jnp.asarray(synthetic_mean_params()[None, :])
    p._predict = jax.jit(p._predict_impl)

    rng = np.random.RandomState(0)
    img = (rng.rand(args.img, args.img, 3) * 255).astype(np.uint8)
    # warm the compiled batch + the relay
    for _ in range(8):
        p.predict(np.stack([img] * args.batch))

    configs = [
        (int(c), int(d))
        for c in args.clients.split(",")
        for d in str(args.pipeline_depth).split(",")
    ]
    for clients, depth in configs:
        bp = BatchingPredictor(
            p,
            max_latency_ms=args.max_latency_ms,
            pipeline_depth=depth,
        )
        latencies = []
        lock = threading.Lock()
        per_client = args.requests // clients

        def client():
            for _ in range(per_client):
                t0 = time.perf_counter()
                bp.submit(img).result(timeout=120)
                dt = time.perf_counter() - t0
                with lock:
                    latencies.append(dt)

        threads = [threading.Thread(target=client) for _ in range(clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        bp.close()
        lat = np.sort(np.asarray(latencies)) * 1000
        n = len(lat)
        print(
            json.dumps(
                {
                    "clients": clients,
                    "requests": n,
                    "throughput_rps": round(n / wall, 1),
                    "p50_ms": round(float(lat[n // 2]), 1),
                    "p95_ms": round(float(lat[int(n * 0.95)]), 1),
                    "p99_ms": round(float(lat[min(int(n * 0.99), n - 1)]), 1),
                    "batches": bp.stats["batches"],
                    "outputs": args.outputs or "all",
                    "pipeline_depth": depth,
                    "avg_fill": round(
                        1 - bp.stats["padded_slots"] / (bp.stats["batches"] * args.batch),
                        3,
                    ),
                }
            )
        )


if __name__ == "__main__":
    main()
