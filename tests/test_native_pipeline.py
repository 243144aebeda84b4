"""Native C++ batch decoder + pipeline: parity with the cv2/numpy host
path on the same npz shards, error handling, prefetch/iterator contract."""
import numpy as np
import pytest

from human_pose_estimation_tpu.config import Config
from human_pose_estimation_tpu.native import decode_fit_batch, get_dataloader

pytestmark = pytest.mark.skipif(
    get_dataloader() is None, reason="native dataloader unavailable"
)


@pytest.fixture(scope="module")
def shard(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    from human_pose_estimation_tpu.data.npz_dataset import (
        convert_images_to_npz_shard,
    )

    tmp = tmp_path_factory.mktemp("native")
    rng = np.random.RandomState(1)
    n = 5
    pairs, joints = [], np.zeros((3, 14, n), np.float32)
    for i in range(n):
        h, w = 120 + i * 7, 90 + i * 11
        # smooth-ish image so JPEG is almost lossless-stable under decode
        img = np.clip(
            np.cumsum(rng.randn(h, w, 3), axis=1) * 4 + 128, 0, 255
        ).astype(np.uint8)
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
    return npz, n


def test_decode_fit_batch_matches_cv2():
    """Decode is bit-exact vs cv2 (same libjpeg family); the bilinear
    canvas fit matches cv2.INTER_LINEAR within 1 LSB."""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(0)
    img = np.clip(np.cumsum(rng.randn(300, 400, 3), axis=1) * 5 + 128, 0, 255)
    img = img.astype(np.uint8)
    seg = ((rng.rand(300, 400) > 0.5) * 255).astype(np.uint8)
    ok, jb = cv2.imencode(".jpg", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    ok2, pb = cv2.imencode(".png", seg)
    assert ok and ok2

    canvas = 256
    nimg, nseg, hw, orig, off, scale, err = decode_fit_batch(
        [jb.tobytes()] * 3, [pb.tobytes()] * 3, canvas
    )
    assert (err == 0).all()

    dec = cv2.cvtColor(
        cv2.imdecode(np.frombuffer(jb.tobytes(), np.uint8), cv2.IMREAD_COLOR),
        cv2.COLOR_BGR2RGB,
    )
    sdec = cv2.imdecode(np.frombuffer(pb.tobytes(), np.uint8), cv2.IMREAD_GRAYSCALE)
    h, w = dec.shape[:2]
    s = min(1.0, canvas / max(h, w))
    nh, nw = int(np.floor(h * s)), int(np.floor(w * s))
    assert tuple(hw[0]) == (nh, nw) and tuple(orig[0]) == (h, w)
    np.testing.assert_allclose(scale[0], [nh / h, nw / w], rtol=1e-6)
    rimg = cv2.resize(dec, (nw, nh), interpolation=cv2.INTER_LINEAR)
    rseg = cv2.resize(sdec, (nw, nh), interpolation=cv2.INTER_LINEAR)
    assert np.abs(nimg[0, :nh, :nw].astype(int) - rimg.astype(int)).max() <= 1
    assert np.abs(nseg[0, :nh, :nw, 0].astype(int) - rseg.astype(int)).max() <= 1
    # padding stays zeroed; all batch lanes identical
    assert nimg[0, nh:].max() == 0
    np.testing.assert_array_equal(nimg[0], nimg[2])


def test_decode_identity_size_is_exact():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(2)
    img = (rng.rand(64, 48, 3) * 255).astype(np.uint8)
    ok, jb = cv2.imencode(".jpg", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    nimg, _, hw, orig, off, scale, err = decode_fit_batch([jb.tobytes()], None, 64)
    dec = cv2.cvtColor(
        cv2.imdecode(np.frombuffer(jb.tobytes(), np.uint8), cv2.IMREAD_COLOR),
        cv2.COLOR_BGR2RGB,
    )
    assert err[0] == 0 and tuple(hw[0]) == (64, 48) and tuple(orig[0]) == (64, 48)
    np.testing.assert_array_equal(nimg[0, :64, :48], dec)
    np.testing.assert_allclose(scale[0], [1.0, 1.0])


def test_decode_error_flags():
    nimg, nseg, hw, orig, off, scale, err = decode_fit_batch(
        [b"notajpeg"], [b"notapng"], 32
    )
    assert err[0] != 0
    assert nimg.max() == 0 and tuple(hw[0]) == (0, 0)


def test_native_pipeline_matches_npz_pipeline(shard):
    """Deterministic eval mode: the native pipeline and the cv2/numpy
    pipeline produce (near-)identical GenBatches from the same shard."""
    from human_pose_estimation_tpu.data.native_pipeline import NativeImagePipeline
    from human_pose_estimation_tpu.data.npz_dataset import NpzImagePipeline

    npz, n = shard
    cfg = Config(batch_size=2, img_size=64, max_silhouette_points=256)
    a = list(iter(NativeImagePipeline(cfg, [npz], mode="val", canvas=96)))
    b = list(iter(NpzImagePipeline(cfg, [npz], mode="val", canvas=96)))
    assert len(a) == len(b) and sum(nv for _, nv in a) == n
    for (ba, na), (bb, nb) in zip(a, b):
        assert na == nb
        ia, ib = np.asarray(ba.images), np.asarray(bb.images)
        # resize rounding: at most 1 uint8 LSB -> 2/255 after [-1,1] scale
        assert np.abs(ia - ib).max() <= 2.01 / 255
        np.testing.assert_allclose(
            np.asarray(ba.kp2d), np.asarray(bb.kp2d), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ba.seg_mask).sum(), np.asarray(bb.seg_mask).sum(), atol=8
        )


def test_native_pipeline_train_mode_and_hostbatch(shard):
    """repeat/shuffle stream with device_preprocess=False yields HostBatch
    for the fused train step; augmentation path yields GenBatch."""
    from human_pose_estimation_tpu.data.native_pipeline import NativeImagePipeline
    from human_pose_estimation_tpu.train.step import HostBatch

    npz, n = shard
    cfg = Config(batch_size=2, img_size=64, max_silhouette_points=128)
    it = iter(
        NativeImagePipeline(
            cfg, [npz], mode="train", canvas=96, device_preprocess=False
        )
    )
    batches = [next(it) for _ in range(4)]  # > one epoch: stream repeats
    for hb, nv in batches:
        assert isinstance(hb, HostBatch)
        assert nv == 2
        assert hb.image.shape == (2, 96, 96, 3) and hb.image.dtype == np.uint8

    it2 = iter(NativeImagePipeline(cfg, [npz], mode="train", canvas=96, seed=7))
    gb, nv = next(it2)
    assert gb.images.shape == (2, 64, 64, 3)


def test_make_image_pipeline_factory(shard, tmp_path):
    """Config.input_pipeline dispatch: npz and native pipelines resolve
    through the factory; unknown values are rejected at Config level."""
    from human_pose_estimation_tpu.data import (
        make_image_pipeline,
        npz_shard_files,
    )

    npz, n = shard
    import os
    import shutil

    data_dir = str(tmp_path)
    shutil.copy(npz, os.path.join(data_dir, "lsp_train.npz"))
    for kind in ("npz", "native"):
        cfg = Config(
            batch_size=2, img_size=64, data_dir=data_dir, input_pipeline=kind,
            datasets=["lsp_train"], max_silhouette_points=128,
        )
        pipe = make_image_pipeline(cfg, mode="val")
        gb, nv = next(iter(pipe))
        assert gb.images.shape == (2, 64, 64, 3)
    assert npz_shard_files(data_dir, ["lsp_train"]) == [
        os.path.join(data_dir, "lsp_train.npz")
    ]
    with pytest.raises(ValueError):
        Config(input_pipeline="bogus")


def test_npz_mocap_pipeline(tmp_path, tiny_model):
    """TF-free mocap stream: correct batch size, device SMPL forward, and
    raw (pose, shape) mode for the fused step."""
    from human_pose_estimation_tpu.data.npz_dataset import (
        NpzMocapPipeline,
        write_mocap_npz_shard,
    )

    rng = np.random.RandomState(0)
    n = 40
    pose = rng.randn(n, 72).astype(np.float32) * 0.2
    shape = rng.randn(n, 10).astype(np.float32) * 0.03
    path = str(tmp_path / "mocap.npz")
    assert write_mocap_npz_shard(path, pose, shape) == n

    cfg = Config(batch_size=2, num_stage=3, img_size=64)
    pipe = NpzMocapPipeline(cfg, tiny_model, [path])
    it = iter(pipe)
    mb = next(it)
    assert mb.joints.shape == (6, 19, 3)
    assert mb.shapes.shape == (6, 10)
    assert mb.rotations.shape == (6, 23, 3, 3)

    raw = iter(NpzMocapPipeline(cfg, tiny_model, [path], device_forward=False))
    p, s = next(raw)
    assert p.shape == (6, 72) and s.shape == (6, 10)


def test_native_window_crop_matches_npz(tmp_path):
    """Large frame + small person: the source-resolution window crop
    triggers in both host paths and they still agree bit-for-bit-ish."""
    cv2 = pytest.importorskip("cv2")
    from human_pose_estimation_tpu.data.native_pipeline import NativeImagePipeline
    from human_pose_estimation_tpu.data.npz_dataset import (
        NpzImagePipeline,
        convert_images_to_npz_shard,
    )

    rng = np.random.RandomState(5)
    h, w = 500, 700
    img = np.clip(np.cumsum(rng.randn(h, w, 3), axis=1) * 4 + 128, 0, 255)
    img = img.astype(np.uint8)
    seg = np.zeros((h, w), np.uint8)
    seg[230:280, 490:545] = 255
    ip, sp = str(tmp_path / "im0.jpg"), str(tmp_path / "im0_seg.png")
    cv2.imwrite(ip, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    cv2.imwrite(sp, seg)
    joints = np.zeros((3, 14, 1), np.float32)
    joints[0, :, 0] = 520 + rng.rand(14) * 30 - 15
    joints[1, :, 0] = 255 + rng.rand(14) * 30 - 15
    joints[2, :, 0] = 1.0
    npz = str(tmp_path / "shard.npz")
    assert convert_images_to_npz_shard(npz, [(ip, sp)], joints) == 1

    cfg = Config(batch_size=1, img_size=64, max_silhouette_points=4096)
    a, na = next(iter(NativeImagePipeline(cfg, [npz], mode="val", canvas=96)))
    b, nb = next(iter(NpzImagePipeline(cfg, [npz], mode="val", canvas=96)))
    assert na == nb == 1
    # window (72px) < frame: full source resolution -> exact silhouette
    assert np.abs(np.asarray(a.images) - np.asarray(b.images)).max() <= 2.01 / 255
    np.testing.assert_allclose(np.asarray(a.kp2d), np.asarray(b.kp2d), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(a.seg_mask).sum(), np.asarray(b.seg_mask).sum()
    )


def test_npz_mocap_pipeline_resume(tmp_path, tiny_model):
    """(epoch, pos) is the complete mocap stream state: a fresh pipeline
    with set_state continues the exact same sequence, across the epoch
    boundary (per-epoch order derives from (seed, epoch) only)."""
    from human_pose_estimation_tpu.data.npz_dataset import (
        NpzMocapPipeline,
        write_mocap_npz_shard,
    )

    rng = np.random.RandomState(1)
    n = 40  # batch 6 -> 6 batches/epoch; 8 draws cross the boundary
    path = str(tmp_path / "mocap.npz")
    write_mocap_npz_shard(
        path,
        rng.randn(n, 72).astype(np.float32) * 0.2,
        rng.randn(n, 10).astype(np.float32) * 0.03,
    )
    cfg = Config(batch_size=2, num_stage=3, img_size=64)

    a = NpzMocapPipeline(cfg, tiny_model, [path], device_forward=False)
    it_a = iter(a)
    for _ in range(3):
        next(it_a)
    snap = a.get_state()
    cont = [np.asarray(next(it_a)[0]) for _ in range(5)]

    b = NpzMocapPipeline(cfg, tiny_model, [path], device_forward=False)
    b.set_state(snap)
    it_b = iter(b)
    resumed = [np.asarray(next(it_b)[0]) for _ in range(5)]
    for x, y in zip(cont, resumed):
        np.testing.assert_array_equal(x, y)

    # distinct epochs shuffle differently
    assert not np.array_equal(a._order(0), a._order(1))
