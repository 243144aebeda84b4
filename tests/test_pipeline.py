"""End-to-end data pipeline tests: tfrecord write -> host decode ->
device augmentation -> GenBatch / MocapBatch."""
import os

import numpy as np
import pytest

import jax

from human_pose_estimation_tpu.config import Config
from human_pose_estimation_tpu.data import tfrecords
from human_pose_estimation_tpu.data.pipeline import ImagePipeline, MocapPipeline


@pytest.fixture(scope="module")
def image_record(tmp_path_factory):
    tf = pytest.importorskip("tensorflow")
    tmp = tmp_path_factory.mktemp("data")
    rng = np.random.RandomState(0)
    img_dir = tmp / "imgs"
    seg_dir = tmp / "segs"
    img_dir.mkdir()
    seg_dir.mkdir()
    n = 6
    joints = np.zeros((3, 14, n), np.float32)
    pairs = []
    for i in range(n):
        h, w = int(rng.randint(40, 120)), int(rng.randint(40, 120))
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        seg = ((rng.rand(h, w, 1) > 0.5) * 255).astype(np.uint8)
        ip = str(img_dir / f"im{i:04d}.jpg")
        sp = str(seg_dir / f"im{i:04d}_segmentation.png")
        tf.io.write_file(ip, tf.io.encode_jpeg(img))
        tf.io.write_file(sp, tf.io.encode_png(seg))
        joints[0, :, i] = rng.rand(14) * (w - 1)
        joints[1, :, i] = rng.rand(14) * (h - 1)
        joints[2, :, i] = 1.0  # visible flag, already in "visible" polarity
        pairs.append((ip, sp))
    out = str(tmp / "lsp_16.tfrecords")
    count = tfrecords.create_image_tfrecord(out, pairs, joints)
    assert count == n
    return str(tmp), out, n


def test_image_pipeline_shapes(image_record):
    data_dir, path, n = image_record
    cfg = Config(
        data_dir=data_dir, batch_size=4, img_size=64, max_silhouette_points=256
    )
    pipe = ImagePipeline(cfg, files=[path], mode="train", canvas=128)
    it = iter(pipe)
    batch, nv = next(it)
    assert nv == 4
    assert batch.images.shape == (4, 64, 64, 3)
    assert batch.seg_points.shape == (4, 256, 2)
    assert batch.seg_mask.shape == (4, 256)
    assert batch.kp2d.shape == (4, 19, 3)
    img = np.asarray(batch.images)
    assert img.min() >= -1.0 - 1e-6 and img.max() <= 1.0 + 1e-6
    # repeat: more batches than examples keep coming
    for _ in range(3):
        next(it)


def test_image_pipeline_eval_partial_batch(image_record):
    data_dir, path, n = image_record
    cfg = Config(data_dir=data_dir, batch_size=4, img_size=64)
    pipe = ImagePipeline(cfg, files=[path], mode="val", augment=False, canvas=128)
    batches = list(iter(pipe))
    assert sum(nv for _, nv in batches) == n
    assert batches[-1][1] == n % 4 or batches[-1][1] == 4


def test_image_pipeline_cache(image_record):
    """cache=True (decode-once hot loop): an eval pipeline yields the
    byte-identical stream cached or not, on the first AND second pass
    (second pass reads from the populated cache); a cached train
    pipeline yields each example exactly once per epoch."""
    data_dir, path, n = image_record
    cfg = Config(data_dir=data_dir, batch_size=2, img_size=64)
    plain = [
        np.asarray(b.images)
        for b, _ in ImagePipeline(
            cfg, files=[path], mode="val", augment=False, canvas=128
        )
    ]
    cached_pipe = ImagePipeline(
        cfg, files=[path], mode="val", augment=False, canvas=128, cache=True
    )
    for _pass in range(2):
        got = [np.asarray(b.images) for b, _ in cached_pipe]
        assert len(got) == len(plain)
        for x, y in zip(plain, got):
            np.testing.assert_array_equal(x, y)

    train_pipe = ImagePipeline(
        cfg, files=[path], mode="train", augment=False, canvas=128, cache=True
    )
    it = iter(train_pipe)
    seen = []
    for _ in range(n // 2 * 2):  # two epochs of batches
        b, nv = next(it)
        assert nv == 2
        seen.append(np.asarray(b.kp2d))
    # per-epoch multiset of label rows identical across the two epochs
    ep = n // 2
    first = np.sort(np.concatenate(seen[:ep]).reshape(n, -1), axis=0)
    second = np.sort(np.concatenate(seen[ep:]).reshape(n, -1), axis=0)
    np.testing.assert_allclose(first, second, rtol=0, atol=1e-6)


def test_image_pipeline_deterministic_eval(image_record):
    data_dir, path, n = image_record
    cfg = Config(data_dir=data_dir, batch_size=2, img_size=64)
    a = [np.asarray(b.images) for b, _ in ImagePipeline(cfg, files=[path], mode="val", augment=False, canvas=128)]
    b = [np.asarray(b.images) for b, _ in ImagePipeline(cfg, files=[path], mode="val", augment=False, canvas=128)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_mocap_pipeline(tmp_path, tiny_model):
    rng = np.random.RandomState(1)
    poses = rng.randn(20, 72).astype(np.float32) * 0.2
    shapes = rng.randn(20, 10).astype(np.float32) * 0.5
    path = str(tmp_path / "neutrSMPL_CMU_01.tfrecord")
    assert tfrecords.create_mocap_tfrecord(path, poses, shapes) == 20

    cfg = Config(batch_size=2, num_stage=3)
    pipe = MocapPipeline(cfg, tiny_model, files=[path], shuffle=False)
    m = next(iter(pipe))
    assert m.joints.shape == (6, 19, 3)
    assert m.shapes.shape == (6, 10)
    assert m.rotations.shape == (6, 23, 3, 3)
    # Rotations are orthonormal (came through the real SMPL forward).
    r = np.asarray(m.rotations)
    prod = np.einsum("nkij,nklj->nkil", r, r)
    np.testing.assert_allclose(
        prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-5
    )
    # Shapes pass through unchanged, in order (shuffle off).
    np.testing.assert_allclose(np.asarray(m.shapes), shapes[:6], atol=1e-6)


def test_record_files_and_num_examples(tmp_path):
    assert tfrecords.num_examples(["lsp_train", "lsp_ext"]) == 9642
    files = tfrecords.record_files(str(tmp_path), ["lsp_train"])
    assert files == [os.path.join(str(tmp_path), "lsp_train.tfrecords")]


def test_pairing_and_center_helpers(tmp_path):
    # LSP naming: imNNNN.jpg <-> imNNNN_segmentation.png
    img_dir = tmp_path / "lsp"
    seg_dir = tmp_path / "lsp_seg"
    img_dir.mkdir()
    seg_dir.mkdir()
    for i in range(3):
        (img_dir / f"im{i:04d}.jpg").write_bytes(b"x")
        (seg_dir / f"im{i:04d}_segmentation.png").write_bytes(b"x")
    pairs = tfrecords.pair_lsp(str(img_dir), str(seg_dir))
    assert len(pairs) == 3
    assert pairs[0][1].endswith("im0000_segmentation.png")

    # LSP-ext naming: seg "<stem>_*.png" <-> image "<stem>.png"
    ext_img = tmp_path / "ext"
    ext_seg = tmp_path / "ext_seg"
    ext_img.mkdir()
    ext_seg.mkdir()
    (ext_seg / "00001_segmentation.png").write_bytes(b"x")
    pairs = tfrecords.pair_lsp_ext(str(ext_img), str(ext_seg))
    assert pairs == [(str(ext_img / "00001.png"), str(ext_seg / "00001_segmentation.png"))]

    # center = bbox center of visible keypoints
    label = np.zeros((3, 14), np.float32)
    label[0, :3] = [10, 30, 50]
    label[1, :3] = [20, 60, 40]
    label[2, :3] = 1.0
    c = tfrecords.center_from_visible(label)
    np.testing.assert_array_equal(c, [30, 40])


def test_mpii_joint_remap_shape():
    assert len(tfrecords.MPII_TO_LSP) == 14
    assert len(set(tfrecords.MPII_TO_LSP)) == 14


def test_large_image_keeps_source_resolution(tmp_path):
    """A small person in a large frame keeps SOURCE resolution through the
    host pipeline: the person window is cropped at native resolution
    before the canvas fit (the reference crops at original resolution,
    ref src/data_loader.py:160-213; scaling the whole frame to the canvas
    first destroyed detail). A 1-px checkerboard silhouette survives
    exactly; bilinear full-frame downscale would smear it into a blob."""
    tf = pytest.importorskip("tensorflow")
    h, w = 600, 800
    rng = np.random.RandomState(0)
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    cy, cx = 300, 480
    yy, xx = np.mgrid[0:h, 0:w]
    checker = ((yy + xx) % 2 == 0) & (np.abs(yy - cy) < 40) & (np.abs(xx - cx) < 40)
    seg = (checker * 255).astype(np.uint8)[..., None]
    n_on = int(checker.sum())  # exactly half of the 80x80 region = 3200

    joints = np.zeros((3, 14, 1), np.float32)
    joints[0, :, 0] = cx + np.linspace(-50, 50, 14)
    joints[1, :, 0] = cy + np.linspace(-60, 60, 14)
    joints[2, :, 0] = 1.0
    ip = str(tmp_path / "im0000.jpg")
    sp = str(tmp_path / "im0000_segmentation.png")
    tf.io.write_file(ip, tf.io.encode_jpeg(img))
    tf.io.write_file(sp, tf.io.encode_png(seg))
    path = str(tmp_path / "big.tfrecords")
    assert tfrecords.create_image_tfrecord(path, [(ip, sp)], joints) == 1

    cfg = Config(
        data_dir=str(tmp_path),
        batch_size=1,
        img_size=224,
        max_silhouette_points=8192,
    )
    pipe = ImagePipeline(cfg, files=[path], mode="val", augment=False, canvas=256)
    batch, nv = next(iter(pipe))
    assert nv == 1
    # silhouette at source resolution: the checkerboard count is exact
    count = float(np.asarray(batch.seg_mask).sum())
    assert count == n_on, (count, n_on)
    # keypoints: deterministic center crop at scale 1 -> px = src - (c - 112)
    kp = np.asarray(batch.kp2d)[0]
    kp_px_x = (kp[:, 0] + 1) * 0.5 * 224
    kp_px_y = (kp[:, 1] + 1) * 0.5 * 224
    np.testing.assert_allclose(kp_px_x[:14], joints[0, :, 0] - (cx - 112), atol=0.6)
    np.testing.assert_allclose(kp_px_y[:14], joints[1, :, 0] - (cy - 112), atol=0.6)
