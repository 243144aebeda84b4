"""Offline dataset build (capability parity with ref create_datasets.py +
src/util/create_dataset.py): converts raw LSP / LSP-extended / MPII images
+ UP segmentation PNGs + joints.mat into the tfrecord schema.

    python -m human_pose_estimation_tpu.cli.create_datasets \
        --lsp_dir ... --lsp_seg_dir ... --output_dir datasets

Fixes the reference's broken argument plumbing (undefined names in
create(), SURVEY.md §8 quirk 4) — each dataset converts independently.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from ..data import tfrecords


def _load_joints_mat(path: str) -> np.ndarray:
    import scipy.io

    mat = scipy.io.loadmat(path)
    return np.asarray(mat["joints"], np.float32)  # (3, 14, N) or (14, 3, N)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--lsp_dir", default=None, help="LSP images dir")
    p.add_argument("--lsp_seg_dir", default=None, help="LSP UP segmentations dir")
    p.add_argument("--lsp_joints", default=None, help="LSP joints.mat")
    p.add_argument("--lsp_ext_dir", default=None)
    p.add_argument("--lsp_ext_seg_dir", default=None)
    p.add_argument("--lsp_ext_joints", default=None)
    p.add_argument("--mpii_dir", default=None)
    p.add_argument("--mpii_seg_dir", default=None)
    p.add_argument("--mpii_joints", default=None)
    p.add_argument("--train_count", type=int, default=1000,
                   help="LSP images used for train (rest -> val)")
    p.add_argument("--format", choices=("tfrecord", "npz"), default="tfrecord",
                   help="tfrecord = reference-compatible; npz = TF-free shards")
    args = p.parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    if args.format == "npz":
        from ..data.npz_dataset import convert_images_to_npz_shard

        def create(path, pairs, joints, visibility_inverted=False, joint_order=None):
            j = np.asarray(joints, np.float32).copy()
            if joint_order is not None:
                j = j[:, list(joint_order), :]
            if visibility_inverted:
                j[2] = 1.0 - j[2]
            return convert_images_to_npz_shard(
                path.replace(".tfrecords", ".npz"), pairs, j
            )
    else:
        create = tfrecords.create_image_tfrecord

    if args.lsp_dir:
        joints = _load_joints_mat(args.lsp_joints)
        pairs = tfrecords.pair_lsp(args.lsp_dir, args.lsp_seg_dir)
        k = args.train_count
        n = create(
            os.path.join(args.output_dir, "lsp_train.tfrecords"),
            pairs[:k],
            joints[:, :, :k],
            visibility_inverted=True,  # LSP stores occlusion (ref :19-22)
        )
        print(f"lsp_train: {n} examples")
        if len(pairs) > k:
            n = create(
                os.path.join(args.output_dir, "lsp_val.tfrecords"),
                pairs[k:],
                joints[:, :, k:],
                visibility_inverted=True,
            )
            print(f"lsp_val: {n} examples")

    if args.lsp_ext_dir:
        joints = _load_joints_mat(args.lsp_ext_joints)
        if joints.shape[0] == 14:  # LSP-ext ships (14, 3, N)
            joints = joints.transpose(1, 0, 2)
        pairs = tfrecords.pair_lsp_ext(args.lsp_ext_dir, args.lsp_ext_seg_dir)
        n = create(
            os.path.join(args.output_dir, "lsp_ext.tfrecords"),
            pairs,
            joints,
            visibility_inverted=False,
        )
        print(f"lsp_ext: {n} examples")

    if args.mpii_dir:
        joints = _load_joints_mat(args.mpii_joints)
        pairs = tfrecords.pair_lsp_ext(args.mpii_dir, args.mpii_seg_dir)
        n = create(
            os.path.join(args.output_dir, "mpii.tfrecords"),
            pairs,
            joints,
            visibility_inverted=False,
            joint_order=tfrecords.MPII_TO_LSP,
        )
        print(f"mpii: {n} examples")


if __name__ == "__main__":
    main(sys.argv[1:])
