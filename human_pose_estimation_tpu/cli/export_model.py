"""Export a checkpoint to a self-contained serving artifact (StableHLO).

    python -m human_pose_estimation_tpu.cli.export_model \
        --checkpoint_dir ckpt --smpl_model_path models/model.npz \
        --out model.hlo [--batch_size 8] [--platforms tpu,cpu]

The artifact (plus its .json sidecar) is loadable with
infer.export.ExportedPredictor using only jax — no framework code,
SMPL asset, or checkpoint needed on the serving host. (The reference
has no export path; serving needs its full training codebase,
ref src/predictor.py:68-86.)
"""
from __future__ import annotations

import argparse

from ..config import parse_config


def main(argv=None) -> None:
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("--out", required=True, help="artifact output path")
    p.add_argument("--platforms", default="tpu,cpu")
    p.add_argument("--export_dtype", default="uint8", choices=["uint8", "float32"])
    p.add_argument("--calibration", default=None,
                   help="image glob for int8 activation-scale calibration "
                        "(with --encoder_int8 true)")
    args, rest = p.parse_known_args(argv)
    cfg = parse_config(rest)

    from ..infer.export import export_predictor
    from ..infer.predictor import Predictor

    calib = None
    if args.calibration:
        from ..utils.image import load_calibration_images

        calib = load_calibration_images(args.calibration, cfg.img_size)
    if getattr(cfg, "encoder_int8", False) and calib is None:
        raise SystemExit(
            "--encoder_int8 exports require --calibration '<glob>' of "
            "representative images: an uncalibrated export would bake the "
            "dynamic-scale graph (slower than bf16, see PERF.md)."
        )
    predictor = Predictor(cfg, calibration_images=calib)
    meta = export_predictor(
        predictor,
        args.out,
        dtype=args.export_dtype,
        platforms=[s.strip() for s in args.platforms.split(",") if s.strip()],
    )
    print(f"exported {args.out}: {meta}")


if __name__ == "__main__":
    main()
