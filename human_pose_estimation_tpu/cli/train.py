"""Training entry point (capability parity with ref train.py:15-48).

    python -m human_pose_estimation_tpu.cli.train --data_dir ... \
        --datasets lsp_train,lsp_ext --use_mesh_repro_loss true
"""
from __future__ import annotations

import sys

from ..config import parse_config, prepare_dirs, save_config


def main(argv=None) -> None:
    cfg = parse_config(argv)
    cfg = prepare_dirs(cfg)
    save_config(cfg)

    from ..core.smpl import load_model
    from ..data import make_image_pipeline, make_mocap_pipeline
    from ..parallel.mesh import maybe_initialize_distributed
    from ..train.trainer import Trainer

    multihost = maybe_initialize_distributed()
    smpl = load_model(cfg.smpl_model_path)
    train_pipe = make_image_pipeline(
        cfg,
        mode="train",
        shard_by_host=multihost,
        device_preprocess=not cfg.fuse_preprocess,
    )
    val_pipe = (
        make_image_pipeline(cfg, datasets=cfg.val_datasets, mode="val",
                            shuffle=True, repeat=True)
        if cfg.use_validation
        else None
    )
    need_mocap = (not cfg.encoder_only) or cfg.do_bone_evaluation
    mocap_pipe = (
        make_mocap_pipeline(cfg, smpl, device_forward=not cfg.fuse_preprocess)
        if need_mocap
        else None
    )

    trainer = Trainer(
        cfg,
        dataset=train_pipe,
        mocap_dataset=mocap_pipe,
        val_dataset=val_pipe,
        smpl=smpl,
    )
    trainer.train()
    trainer.save()


if __name__ == "__main__":
    main(sys.argv[1:])
