"""Fabricate a miniature licensed-asset tree (REAL_DATA.md §1 layout).

Builds synthetic stand-ins for every file the real-data entry path
consumes — LSP images + joints.mat in the shipped (3, 14, N)
orientation, LSP-ext images + (14, 3, N) joints.mat with SPARSE UP
segmentations, MoSh-layout mocap tfrecords, and an SMPL model npz — so
the exact REAL_DATA.md §2/§4 commands (`cli.create_datasets`,
`REAL_ASSETS=1 scripts/reproduce_lsp.sh`) can be executed and pinned
without licensed files. Not a substitute for the real assets: images are
noise; only the *path* is exercised.

    python scripts/fabricate_real_assets.py --out /tmp/fab_assets
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/fab_assets")
    ap.add_argument("--n_lsp", type=int, default=12)
    ap.add_argument("--n_ext", type=int, default=8)
    ap.add_argument("--n_mocap", type=int, default=64)
    ap.add_argument("--num_verts", type=int, default=6890)
    ap.add_argument("--img", type=int, default=256)
    args = ap.parse_args()

    import scipy.io
    import tensorflow as tf

    from human_pose_estimation_tpu.core.smpl import save_model_npz
    from human_pose_estimation_tpu.data import tfrecords
    from human_pose_estimation_tpu.utils.synthetic_human import (
        synthetic_human_model,
    )

    rng = np.random.RandomState(0)
    out = args.out
    h = w = args.img

    def write_img(path, encode_jpg):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        data = tf.io.encode_jpeg(img) if encode_jpg else tf.io.encode_png(img)
        tf.io.write_file(path, data)

    def write_seg(path, channels=1):
        seg = np.zeros((h, w, channels), np.uint8)
        y0, x0 = rng.randint(10, h // 3, 2)
        seg[y0 : y0 + h // 2, x0 : x0 + w // 2] = 255
        tf.io.write_file(path, tf.io.encode_png(seg))

    def joints(n, j=14):
        lab = np.zeros((3, j, n), np.float32)
        lab[0] = rng.rand(j, n) * (w - 1)
        lab[1] = rng.rand(j, n) * (h - 1)
        lab[2] = 1.0
        return lab

    # LSP: dense images, one segmentation missing (UP coverage is partial)
    lsp_img = os.path.join(out, "lsp", "images")
    lsp_seg = os.path.join(out, "upi-s1h", "lsp")
    os.makedirs(lsp_img, exist_ok=True)
    os.makedirs(lsp_seg, exist_ok=True)
    for i in range(1, args.n_lsp + 1):
        write_img(os.path.join(lsp_img, f"im{i:04d}.jpg"), True)
        if i != args.n_lsp // 2:
            write_seg(os.path.join(lsp_seg, f"im{i:04d}_segmentation.png"))
    lsp_j = joints(args.n_lsp)
    lsp_j[2] = 0.0  # LSP polarity: 0 = not occluded
    scipy.io.savemat(os.path.join(out, "lsp", "joints.mat"), {"joints": lsp_j})

    # LSP-ext: .png images, segmentations for every other image only,
    # joints.mat in the (14, 3, N) shipped orientation
    ext_img = os.path.join(out, "lsp_ext", "images")
    ext_seg = os.path.join(out, "upi-s1h", "lsp_ext")
    os.makedirs(ext_img, exist_ok=True)
    os.makedirs(ext_seg, exist_ok=True)
    for i in range(1, args.n_ext + 1):
        write_img(os.path.join(ext_img, f"im{i:05d}.png"), False)
        if i % 2 == 0:
            write_seg(
                os.path.join(ext_seg, f"im{i:05d}_segmentation.png"), channels=3
            )
    scipy.io.savemat(
        os.path.join(out, "lsp_ext", "joints.mat"),
        {"joints": joints(args.n_ext).transpose(1, 0, 2)},
    )

    # MoSh-layout mocap tfrecords
    mocap = os.path.join(out, "mocap_neutrMosh")
    os.makedirs(mocap, exist_ok=True)
    tfrecords.create_mocap_tfrecord(
        os.path.join(mocap, "neutrSMPL_CMU_01.tfrecord"),
        (rng.randn(args.n_mocap, 72) * 0.2).astype(np.float32),
        (rng.randn(args.n_mocap, 10) * 0.4).astype(np.float32),
    )

    # SMPL model stand-in
    models = os.path.join(out, "models")
    os.makedirs(models, exist_ok=True)
    save_model_npz(
        synthetic_human_model(num_verts=args.num_verts),
        os.path.join(models, "model.npz"),
    )
    print(f"fabricated asset tree at {out}")


if __name__ == "__main__":
    main()
