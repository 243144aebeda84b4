"""Checkpoint evaluation entry point (capability parity with ref
validate_checkpoint.py:11-41): loads the validation set only, forces both
losses on, sweeps the checkpoint, reports mean KPR/MR losses + PCK@0.5."""
from __future__ import annotations

import argparse
import sys

from ..config import parse_config


def main(argv=None) -> None:
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("--draw_best_worst", action="store_true",
                   help="render best/worst validation batches")
    p.add_argument("--draw_every_image", action="store_true",
                   help="render every validation batch")
    args, rest = p.parse_known_args(argv)
    cfg = parse_config(rest)
    # Both losses on for eval (ref validate_checkpoint.py:33-34 — which
    # sets a nonexistent flag name; fixed here, SURVEY.md §8 quirk 1).
    cfg = cfg.replace(use_mesh_repro_loss=True, use_kpr_loss=True)

    from ..core.smpl import load_model
    from ..data import make_image_pipeline
    from ..train.trainer import Trainer

    smpl = load_model(cfg.smpl_model_path)
    val_pipe = make_image_pipeline(cfg, datasets=cfg.val_datasets, mode="val")
    trainer = Trainer(
        cfg, val_dataset=val_pipe, validation_only=True, smpl=smpl
    )
    results = trainer.validate_checkpoint(
        draw_best_worst=args.draw_best_worst,
        draw_every_image=args.draw_every_image,
    )
    print(results)


if __name__ == "__main__":
    main(sys.argv[1:])
