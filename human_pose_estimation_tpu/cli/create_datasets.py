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
    """Load joints.mat as (3, J, N), accepting either shipped orientation.

    LSP-original ships (3, 14, N) while LSP-ext ships (14, 3, N) (ref
    src/util/create_dataset.py:95-106 handles both); MPII conversions
    come as (3, 16, N) or (16, 3, N). Normalized here so every branch
    below sees (coords, joints, N).
    """
    import scipy.io

    mat = scipy.io.loadmat(path)
    joints = np.asarray(mat["joints"], np.float32)
    if joints.ndim != 3:
        raise ValueError(f"{path}: expected 3-d joints array, got {joints.shape}")
    if joints.shape[1] == 3 and joints.shape[0] != 3:
        joints = joints.transpose(1, 0, 2)  # (J, 3, N) -> (3, J, N)
    if joints.shape[0] != 3:
        raise ValueError(f"{path}: cannot interpret orientation {joints.shape}")
    return joints


def _joint_indices(pairs) -> list:
    """Joints.mat column for each pair, from the image file NUMBER.

    The reference indexes labels by the number embedded in the image
    filename, not the pair's position (ref create_dataset.py:130-135) —
    this matters for LSP-ext, whose UP segmentations cover only a subset
    of images, so pair position and image number diverge.
    """
    import re

    idxs = []
    for img_path, _ in pairs:
        nums = re.findall(r"\d+", os.path.basename(img_path))
        if not nums:
            raise ValueError(f"no image number in filename: {img_path}")
        idxs.append(int(nums[0]) - 1)
    return idxs


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
        idxs = _joint_indices(pairs)
        # train/val split by image NUMBER (im0001..im1000 -> train), so a
        # sparse segmentation set still splits where the reference's
        # lsp_train/lsp_val tables expect (ref data_loader.py:19-32)
        k = args.train_count
        train = [(p, i) for p, i in zip(pairs, idxs) if i < k]
        val = [(p, i) for p, i in zip(pairs, idxs) if i >= k]
        n = create(
            os.path.join(args.output_dir, "lsp_train.tfrecords"),
            [p for p, _ in train],
            joints[:, :, [i for _, i in train]],
            visibility_inverted=True,  # LSP stores occlusion (ref :19-22)
        )
        print(f"lsp_train: {n} examples")
        if val:
            n = create(
                os.path.join(args.output_dir, "lsp_val.tfrecords"),
                [p for p, _ in val],
                joints[:, :, [i for _, i in val]],
                visibility_inverted=True,
            )
            print(f"lsp_val: {n} examples")

    if args.lsp_ext_dir:
        joints = _load_joints_mat(args.lsp_ext_joints)
        pairs = tfrecords.pair_lsp_ext(args.lsp_ext_dir, args.lsp_ext_seg_dir)
        n = create(
            os.path.join(args.output_dir, "lsp_ext.tfrecords"),
            pairs,
            joints[:, :, _joint_indices(pairs)],
            visibility_inverted=False,
        )
        print(f"lsp_ext: {n} examples")

    if args.mpii_dir:
        joints = _load_joints_mat(args.mpii_joints)
        pairs = tfrecords.pair_lsp_ext(args.mpii_dir, args.mpii_seg_dir)
        n = create(
            os.path.join(args.output_dir, "mpii.tfrecords"),
            pairs,
            joints[:, :, _joint_indices(pairs)],
            visibility_inverted=False,
            joint_order=tfrecords.MPII_TO_LSP,
        )
        print(f"mpii: {n} examples")


if __name__ == "__main__":
    main(sys.argv[1:])
