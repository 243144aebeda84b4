"""Migrate a trained reference checkpoint into this framework.

Reads a tf.train.Checkpoint written by the reference Trainer
(ref src/trainer.py:192-198) and writes a native step-0 Orbax checkpoint
that this framework's Trainer / Predictor / serve / export CLIs restore
directly:

    python -m human_pose_estimation_tpu.cli.import_checkpoint \\
        --reference_checkpoint_dir /path/to/ref/ckpts \\
        --checkpoint_dir /path/to/new/orbax/dir \\
        --smpl_model_path models/model.npz

Requires TensorFlow on the host (reading only; nothing TF survives into
the output). See models/port_reference.py for the semantic notes (mean
theta, optimizer moments).
"""
from __future__ import annotations

import argparse
import sys

from ..config import parse_config


def main(argv=None) -> None:
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument(
        "--reference_checkpoint_dir",
        required=True,
        help="directory holding the reference's ckpt-* files",
    )
    args, rest = p.parse_known_args(argv)
    cfg = parse_config(rest)

    from ..models.port_reference import import_reference_checkpoint

    state, inital_theta = import_reference_checkpoint(
        args.reference_checkpoint_dir, cfg.checkpoint_dir, cfg
    )
    n_params = sum(
        p.size for p in __import__("jax").tree.leaves(state.gen_params)
    )
    print(
        f"imported reference checkpoint -> {cfg.checkpoint_dir} "
        f"(step 0, {n_params:,} generator params, "
        f"mean_theta[:5]={inital_theta[0, :5]})"
    )


if __name__ == "__main__":
    main(sys.argv[1:])
