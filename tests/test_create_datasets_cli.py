"""Real-data entry path, executed end-to-end on fabricated assets.

Builds a miniature licensed-asset tree — LSP images + UP segmentations +
joints.mat in the (3, 14, N) orientation, LSP-ext with SPARSE
segmentations + joints.mat in the (14, 3, N) orientation, and an MPII
set — then drives the exact REAL_DATA.md §2 command path:

    cli.create_datasets -> ImagePipeline -> one train step

(ref analogue: create_datasets.py:11-31 + src/util/create_dataset.py:90-140).
Asserts the converter's reference semantics: visibility inversion for
LSP-original, joints indexed by image NUMBER (not pair position — the
reference's create_dataset.py:130-135 behavior that matters when UP
covers only a subset of images), MPII 16->14 joint remap, and the
number-based train/val split.
"""
import os

import numpy as np
import pytest

from human_pose_estimation_tpu.cli import create_datasets as cli
from human_pose_estimation_tpu.data import tfrecords


def _write_image(tf, path, h, w, rng):
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    tf.io.write_file(str(path), tf.io.encode_jpeg(img) if str(path).endswith(".jpg")
                     else tf.io.encode_png(img))


def _write_seg(tf, path, h, w, channels=1):
    seg = np.zeros((h, w, channels), np.uint8)
    seg[h // 4 : 3 * h // 4, w // 4 : 3 * w // 4] = 255
    tf.io.write_file(str(path), tf.io.encode_png(seg))


@pytest.fixture(scope="module")
def asset_tree(tmp_path_factory):
    tf = pytest.importorskip("tensorflow")
    scipy_io = pytest.importorskip("scipy.io")
    tmp = tmp_path_factory.mktemp("assets")
    rng = np.random.RandomState(0)
    h, w = 80, 72

    # --- LSP: dense images im0001..im0006, segs for all but im0005,
    # joints.mat in the shipped (3, 14, N) orientation, occlusion flags.
    lsp_img = tmp / "lsp" / "images"
    lsp_seg = tmp / "upi" / "lsp"
    lsp_img.mkdir(parents=True)
    lsp_seg.mkdir(parents=True)
    n_lsp = 6
    lsp_joints = np.zeros((3, 14, n_lsp), np.float32)
    for i in range(1, n_lsp + 1):
        _write_image(tf, lsp_img / f"im{i:04d}.jpg", h, w, rng)
        if i != 5:  # UP does not cover every LSP image
            _write_seg(tf, lsp_seg / f"im{i:04d}_segmentation.png", h, w)
        # distinctive values so tfrecord labels identify their column
        lsp_joints[0, :, i - 1] = np.arange(14) + 100.0 * i
        lsp_joints[1, :, i - 1] = np.arange(14) + 0.5
        lsp_joints[2, :, i - 1] = 0.0  # LSP polarity: 0 = NOT occluded
    scipy_io.savemat(str(tmp / "lsp_joints.mat"), {"joints": lsp_joints})

    # --- LSP-ext: images im00001..im00004 (.png), segs ONLY for
    # im00002/im00004, joints.mat in the (14, 3, N) orientation,
    # visibility flags (no inversion).
    ext_img = tmp / "lsp_ext" / "images"
    ext_seg = tmp / "upi" / "lsp_ext"
    ext_img.mkdir(parents=True)
    ext_seg.mkdir(parents=True)
    n_ext = 4
    ext_joints = np.zeros((3, 14, n_ext), np.float32)
    for i in range(1, n_ext + 1):
        _write_image(tf, ext_img / f"im{i:05d}.png", h, w, rng)
        if i % 2 == 0:
            _write_seg(tf, ext_seg / f"im{i:05d}_segmentation.png", h, w,
                       channels=3)  # LSP-ext segs are 3-channel (ref :36-40)
        ext_joints[0, :, i - 1] = np.arange(14) + 1000.0 * i
        ext_joints[1, :, i - 1] = np.arange(14) + 0.25
        ext_joints[2, :, i - 1] = 1.0
    scipy_io.savemat(
        str(tmp / "ext_joints.mat"), {"joints": ext_joints.transpose(1, 0, 2)}
    )

    # --- MPII: 2 images with segs, 16-joint labels.
    mp_img = tmp / "mpii" / "images"
    mp_seg = tmp / "upi" / "mpii"
    mp_img.mkdir(parents=True)
    mp_seg.mkdir(parents=True)
    n_mp = 2
    mp_joints = np.zeros((3, 16, n_mp), np.float32)
    for i in range(1, n_mp + 1):
        _write_image(tf, mp_img / f"{i:05d}.png", h, w, rng)
        _write_seg(tf, mp_seg / f"{i:05d}_segmentation.png", h, w)
        mp_joints[0, :, i - 1] = np.arange(16) + 10.0 * i
        mp_joints[1, :, i - 1] = np.arange(16)
        mp_joints[2, :, i - 1] = 1.0
    scipy_io.savemat(str(tmp / "mpii_joints.mat"), {"joints": mp_joints})

    out = tmp / "converted"
    cli.main([
        "--output_dir", str(out),
        "--lsp_dir", str(lsp_img),
        "--lsp_seg_dir", str(lsp_seg),
        "--lsp_joints", str(tmp / "lsp_joints.mat"),
        "--lsp_ext_dir", str(ext_img),
        "--lsp_ext_seg_dir", str(ext_seg),
        "--lsp_ext_joints", str(tmp / "ext_joints.mat"),
        "--mpii_dir", str(mp_img),
        "--mpii_seg_dir", str(mp_seg),
        "--mpii_joints", str(tmp / "mpii_joints.mat"),
        "--train_count", "4",
    ])
    return str(tmp), str(out)


def _load_examples(path):
    import tensorflow as tf

    out = []
    for raw in tf.data.TFRecordDataset([path]):
        out.append(tfrecords.parse_image_example(raw))
    return out


def test_lsp_split_inversion_and_sparse_pairing(asset_tree):
    _, out = asset_tree
    train = _load_examples(os.path.join(out, "lsp_train.tfrecords"))
    val = _load_examples(os.path.join(out, "lsp_val.tfrecords"))
    # images 1..4 -> train; image 5 has no segmentation; image 6 -> val
    assert len(train) == 4 and len(val) == 1
    names = [ex["filename"].numpy().decode() for ex in train]
    assert names == [f"im{i:04d}.jpg" for i in range(1, 5)]
    assert val[0]["filename"].numpy().decode() == "im0006.jpg"
    # labels carry the right joints.mat column (100*i tag) and the
    # occlusion flag is inverted to visibility
    for ex, i in zip(train + val, [1, 2, 3, 4, 6]):
        label = ex["label"].numpy()  # (3, 14)
        np.testing.assert_allclose(label[0, :14], np.arange(14) + 100.0 * i)
        assert (label[2, :14] == 1.0).all()  # 0 occluded -> 1 visible


def test_lsp_ext_number_indexed_joints(asset_tree):
    _, out = asset_tree
    exs = _load_examples(os.path.join(out, "lsp_ext.tfrecords"))
    # only im00002 / im00004 have segmentations
    assert [ex["filename"].numpy().decode() for ex in exs] == [
        "im00002.png", "im00004.png"
    ]
    # joints must come from columns 2 and 4 (image number), NOT pair
    # position (columns 1 and 2) — the reference's :130-135 semantics
    for ex, i in zip(exs, [2, 4]):
        label = ex["label"].numpy()
        np.testing.assert_allclose(label[0, :14], np.arange(14) + 1000.0 * i)
        assert (label[2, :14] == 1.0).all()
    # 3-channel seg got reduced to 1 channel
    seg = exs[0]["seg"].numpy()
    assert seg.shape[-1] == 1 and seg.max() == 255


def test_mpii_joint_remap(asset_tree):
    _, out = asset_tree
    exs = _load_examples(os.path.join(out, "mpii.tfrecords"))
    assert len(exs) == 2
    for ex, i in zip(exs, [1, 2]):
        label = ex["label"].numpy()
        want = (np.arange(16) + 10.0 * i)[list(tfrecords.MPII_TO_LSP)]
        np.testing.assert_allclose(label[0, :14], want)


def test_converted_records_train_one_step(asset_tree, tiny_model, tmp_path):
    """The REAL_DATA.md §2 output feeds the real training path: converted
    lsp_train.tfrecords -> ImagePipeline -> one optimizer step."""
    from human_pose_estimation_tpu.config import Config
    from human_pose_estimation_tpu.core.smpl import save_model_npz
    from human_pose_estimation_tpu.data.pipeline import ImagePipeline
    from human_pose_estimation_tpu.train.trainer import Trainer

    tmp, out = asset_tree
    model_path = str(tmp_path / "model.npz")
    save_model_npz(tiny_model, model_path)
    cfg = Config(
        smpl_model_path=model_path,
        data_dir=out,
        logs=str(tmp_path / "logs"),
        model_dir=str(tmp_path / "logs" / "run"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        datasets=["lsp_train"],
        num_examples_override=4,
        batch_size=4,
        img_size=56,
        epoch=1,
        max_silhouette_points=256,
        use_mesh_repro_loss=True,
        use_kpr_loss=True,
        encoder_only=True,  # no mocap assets in this tree
        encoder_stage_sizes="1,1,1,1",
        encoder_dtype="float32",
        use_validation=False,
        log_img_step=0,
        checkpoint_every_epochs=10**9,
    )
    files = [os.path.join(out, "lsp_train.tfrecords")]
    trainer = Trainer(
        cfg, dataset=ImagePipeline(cfg, files=files, mode="train", canvas=96)
    )
    before = int(trainer.state.step)  # snapshot: train donates the state
    trainer.train(max_steps=1)
    assert int(trainer.state.step) == before + 1
