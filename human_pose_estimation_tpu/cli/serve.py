"""HTTP model server: checkpoint (or exported artifact) -> REST endpoint.

    python -m human_pose_estimation_tpu.cli.serve \
        --checkpoint_dir ckpt --smpl_model_path models/model.npz \
        --port 8000 [--artifact model.hlo] [--decode_size 224]

POST an encoded image to /predict (returns an .npz of SMPL outputs, or
JSON with Accept: application/json); GET /healthz for liveness + stats.
Concurrent requests are microbatched onto the fixed compiled batch.
"""
from __future__ import annotations

import argparse

from ..config import parse_config


def main(argv=None) -> None:
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--artifact", default=None,
                   help="serve an exported .hlo artifact instead of a checkpoint")
    p.add_argument("--decode_size", type=int, default=224,
                   help="scale-and-crop uploads to this square size (0 = off)")
    p.add_argument("--max_latency_ms", type=float, default=10.0)
    p.add_argument("--pipeline_depth", type=int, default=1,
                   help="batches kept in flight on the device; 2 overlaps "
                        "host batch assembly + upload with compute on "
                        "host-attached chips (neutral through a relay)")
    p.add_argument("--outputs", default=None,
                   help="restrict response keys, e.g. generated_joints,generated_cams "
                        "(the 6890-vert mesh dominates response size)")
    p.add_argument("--calibration", default=None,
                   help="image glob for int8 activation-scale calibration "
                        "(with --encoder_int8 true; without it, static "
                        "scales are frozen from the FIRST real request — "
                        "warmup never calibrates)")
    args, rest = p.parse_known_args(argv)
    cfg = parse_config(rest)

    from ..infer.http_server import serve
    from ..infer.serving import BatchingPredictor

    if args.artifact:
        from ..infer.export import ExportedPredictor

        predictor = ExportedPredictor(args.artifact)
    else:
        from ..infer.predictor import Predictor

        calib = None
        if args.calibration:
            from ..utils.image import load_calibration_images

            calib = load_calibration_images(args.calibration, cfg.img_size)
        if getattr(cfg, "encoder_int8", False) and calib is None:
            print(
                "WARNING: --encoder_int8 without --calibration — static "
                "activation scales will be frozen from the FIRST real "
                "request; pass --calibration '<glob>' of representative "
                "images for stable accuracy."
            )
        predictor = Predictor(
            cfg,
            outputs=tuple(args.outputs.split(",")) if args.outputs else None,
            calibration_images=calib,
        )
    # Warm the compiled executable so the first request never waits on
    # XLA compilation (a full padded batch through the real path).
    # calibrate=False: the all-zeros warmup batch must never freeze int8
    # activation scales — black frames are unrepresentative of traffic.
    import numpy as np

    size = args.decode_size or cfg.img_size
    warm = np.zeros((predictor.batch_size, size, size, 3), np.uint8)
    if args.artifact:
        predictor.predict(warm)
    else:
        predictor.predict(warm, calibrate=False)
    print("warmup compile done")

    batcher = BatchingPredictor(
        predictor,
        max_latency_ms=args.max_latency_ms,
        pipeline_depth=args.pipeline_depth,
    )
    serve(batcher, args.host, args.port, decode_size=args.decode_size or None)


if __name__ == "__main__":
    main()
