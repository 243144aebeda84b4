"""TF-free npz dataset path: shard write/read, pipeline equivalence with
the tfrecord path on the same underlying data."""
import numpy as np
import pytest

from human_pose_estimation_tpu.config import Config
from human_pose_estimation_tpu.data.npz_dataset import (
    NpzImagePipeline,
    convert_images_to_npz_shard,
)
from human_pose_estimation_tpu.data.pipeline import ImagePipeline
from human_pose_estimation_tpu.data import tfrecords


@pytest.fixture(scope="module")
def both_datasets(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    tf = pytest.importorskip("tensorflow")
    tmp = tmp_path_factory.mktemp("npz")
    rng = np.random.RandomState(0)
    n = 5
    pairs, joints = [], np.zeros((3, 14, n), np.float32)
    for i in range(n):
        h, w = 70 + i * 3, 64 + i * 2
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        seg = ((rng.rand(h, w) > 0.5) * 255).astype(np.uint8)
        ip, sp = str(tmp / f"im{i}.jpg"), str(tmp / f"im{i}_seg.png")
        cv2.imwrite(ip, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        cv2.imwrite(sp, seg)
        joints[0, :, i] = rng.rand(14) * (w - 1)
        joints[1, :, i] = rng.rand(14) * (h - 1)
        joints[2, :, i] = 1.0
        pairs.append((ip, sp))
    npz = str(tmp / "shard.npz")
    assert convert_images_to_npz_shard(npz, pairs, joints) == n
    rec = str(tmp / "data.tfrecords")
    assert tfrecords.create_image_tfrecord(rec, pairs, joints) == n
    return npz, rec, n


def test_npz_pipeline_shapes_and_epochs(both_datasets):
    npz, rec, n = both_datasets
    cfg = Config(batch_size=2, img_size=64, max_silhouette_points=128)
    pipe = NpzImagePipeline(cfg, [npz], mode="val", canvas=96)
    batches = list(iter(pipe))
    assert sum(nv for _, nv in batches) == n
    b0, _ = batches[0]
    assert b0.images.shape == (2, 64, 64, 3)
    assert b0.kp2d.shape == (2, 19, 3)
    assert np.asarray(b0.images).min() >= -1.0 - 1e-6


def test_npz_matches_tfrecord_pipeline(both_datasets):
    """Same data, deterministic mode: both host paths must agree (cv2 and
    tf.image decode/resize differ by at most rounding)."""
    npz, rec, n = both_datasets
    cfg = Config(batch_size=1, img_size=64, max_silhouette_points=256)
    a = list(iter(NpzImagePipeline(cfg, [npz], mode="val", canvas=96)))
    b = list(iter(ImagePipeline(cfg, files=[rec], mode="val", augment=False, canvas=96)))
    assert len(a) == len(b) == n
    for (ba, na), (bb, nb) in zip(a, b):
        assert na == nb
        ia, ib = np.asarray(ba.images), np.asarray(bb.images)
        # JPEG decoders (cv2 vs TF) may differ by a few LSBs per pixel
        assert np.mean(np.abs(ia - ib)) < 0.02
        np.testing.assert_allclose(
            np.asarray(ba.kp2d), np.asarray(bb.kp2d), atol=2e-2
        )
