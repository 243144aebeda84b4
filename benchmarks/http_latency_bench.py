"""Single-client HTTP serving latency A/B: response-encoding formats.

PERF.md "Serving layer" measured ~200-240 ms single-client POST round
trips "dominated by relay dispatch latency + npz-compressed response
encoding". This bench isolates the attackable half: the same in-process
server (make_server + BatchingPredictor, batch 4 @ 224px — the PERF
baseline shape) timed with each response mode interleaved in one
process (relay drift makes cross-process comparisons meaningless):

    npz         default: np.savez_compressed (zlib over ~80 KB f32 mesh)
    raw         ?format=raw — uncompressed .npz
    npz+filter  ?outputs=generated_joints,generated_cams (mesh dropped)
    json        ?format=json&outputs=... — joints-only JSON

    python benchmarks/http_latency_bench.py --requests 40
"""
from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/hpe_jax_cache")
)
from human_pose_estimation_tpu.utils.jax_cache import ensure_compilation_cache

ensure_compilation_cache()

MODES = {
    "npz": "/predict",
    "raw": "/predict?format=raw",
    "npz+filter": "/predict?outputs=generated_joints,generated_cams",
    "json": "/predict?format=json&outputs=generated_joints,generated_cams",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--requests", type=int, default=40,
                    help="timed requests per mode (interleaved rounds)")
    ap.add_argument("--warmup", type=int, default=6)
    args = ap.parse_args()

    import cv2
    import numpy as np

    from human_pose_estimation_tpu.config import Config
    from human_pose_estimation_tpu.core.smpl import save_model_npz
    from human_pose_estimation_tpu.infer.http_server import make_server
    from human_pose_estimation_tpu.infer.predictor import Predictor
    from human_pose_estimation_tpu.infer.serving import BatchingPredictor
    from human_pose_estimation_tpu.utils.assets import synthetic_model

    model_path = "/tmp/http_latency_model.npz"
    if not os.path.exists(model_path):
        save_model_npz(synthetic_model(num_verts=6890, seed=0), model_path)
    cfg = Config(
        smpl_model_path=model_path, img_size=args.img, batch_size=args.batch
    )
    predictor = Predictor(cfg)
    warm = np.zeros((args.batch, args.img, args.img, 3), np.uint8)
    predictor.predict(warm, calibrate=False)
    print("warmup compile done")

    batcher = BatchingPredictor(predictor, max_latency_ms=5.0)
    httpd = make_server(batcher, host="127.0.0.1", port=0, decode_size=args.img)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    rng = np.random.RandomState(0)
    img = (rng.rand(args.img, args.img, 3) * 255).astype(np.uint8)
    ok, enc = cv2.imencode(".jpg", img)
    assert ok
    payload = enc.tobytes()

    import urllib.request

    def hit(path):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", data=payload, method="POST"
        )
        t0 = time.perf_counter()
        with urllib.request.urlopen(req, timeout=120) as resp:
            body = resp.read()
        return (time.perf_counter() - t0) * 1e3, len(body)

    for path in MODES.values():  # warmup every mode
        for _ in range(args.warmup):
            hit(path)

    times = {m: [] for m in MODES}
    sizes = {}
    for _ in range(args.requests):  # interleave modes each round
        for m, path in MODES.items():
            dt, n = hit(path)
            times[m].append(dt)
            sizes[m] = n

    results = {}
    for m, ts in times.items():
        ts = sorted(ts)
        results[m] = {
            "p50_ms": round(ts[len(ts) // 2], 1),
            "p90_ms": round(ts[int(len(ts) * 0.9)], 1),
            "min_ms": round(ts[0], 1),
            "resp_bytes": sizes[m],
        }
        print(m, json.dumps(results[m]))
    base, raw = results["npz"]["p50_ms"], results["raw"]["p50_ms"]
    print(f"raw vs npz p50 delta: {base - raw:+.1f} ms")


if __name__ == "__main__":
    main()
