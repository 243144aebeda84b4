"""Grain input pipeline: equivalence with the npz path, val-tail padding,
checkpoint/resume of the input iterator, per-epoch reshuffle."""
import numpy as np
import pytest

pytest.importorskip("grain")

from human_pose_estimation_tpu.config import Config
from human_pose_estimation_tpu.data.grain_pipeline import (
    GrainImagePipeline,
    NpzShardSource,
)
from human_pose_estimation_tpu.data.npz_dataset import (
    NpzImagePipeline,
    convert_images_to_npz_shard,
)


@pytest.fixture(scope="module")
def npz_shard(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    tmp = tmp_path_factory.mktemp("grain_npz")
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
    path = str(tmp / "shard.npz")
    assert convert_images_to_npz_shard(path, pairs, joints) == n
    return path, n


def test_source_random_access(npz_shard):
    path, n = npz_shard
    src = NpzShardSource([path, path])  # two shards -> offset bookkeeping
    assert len(src) == 2 * n
    a, b = src[1], src[n + 1]
    np.testing.assert_array_equal(a[2], b[2])  # same label across copies
    np.testing.assert_array_equal(src[-1][2], src[2 * n - 1][2])


def test_grain_matches_npz_pipeline(npz_shard):
    """Deterministic mode: grain and plain-npz host paths are identical
    (same cv2 decode, same canvas math, same device preprocessing)."""
    path, n = npz_shard
    cfg = Config(batch_size=2, img_size=64, max_silhouette_points=128)
    a = list(iter(GrainImagePipeline(cfg, [path], mode="val", canvas=96)))
    b = list(iter(NpzImagePipeline(cfg, [path], mode="val", canvas=96)))
    assert len(a) == len(b)
    assert [nv for _, nv in a] == [nv for _, nv in b]
    for (ba, _), (bb, _) in zip(a, b):
        np.testing.assert_array_equal(np.asarray(ba.images), np.asarray(bb.images))
        np.testing.assert_array_equal(np.asarray(ba.kp2d), np.asarray(bb.kp2d))


def test_val_tail_padding(npz_shard):
    path, n = npz_shard
    cfg = Config(batch_size=4, img_size=64, max_silhouette_points=128)
    batches = list(iter(GrainImagePipeline(cfg, [path], mode="val", canvas=96)))
    assert sum(nv for _, nv in batches) == n
    for gen, _ in batches:
        assert gen.images.shape[0] == 4  # fixed compiled batch


def test_checkpoint_resume(npz_shard):
    """get_state/set_state resume the stream at the exact same batch."""
    path, n = npz_shard
    cfg = Config(batch_size=2, img_size=64, max_silhouette_points=128)
    pipe = GrainImagePipeline(cfg, [path], mode="train", canvas=96, seed=3)
    it = iter(pipe)
    next(it)
    state = pipe.get_state()
    want, _ = next(it)

    pipe2 = GrainImagePipeline(cfg, [path], mode="train", canvas=96, seed=3)
    pipe2.set_state(state)
    got, _ = next(iter(pipe2))
    np.testing.assert_array_equal(np.asarray(want.images), np.asarray(got.images))
    np.testing.assert_array_equal(np.asarray(want.kp2d), np.asarray(got.kp2d))


def test_per_epoch_reshuffle(npz_shard):
    """Training shuffle produces a different order each epoch but the
    same multiset of examples (grain stateless shuffle)."""
    path, n = npz_shard
    cfg = Config(batch_size=1, img_size=64, max_silhouette_points=128)
    pipe = GrainImagePipeline(
        cfg, [path], mode="train", canvas=96, seed=0, augment=False
    )
    it = iter(pipe)
    epoch1 = [np.asarray(next(it)[0].kp2d).tobytes() for _ in range(n)]
    epoch2 = [np.asarray(next(it)[0].kp2d).tobytes() for _ in range(n)]
    assert sorted(epoch1) == sorted(epoch2)
    assert epoch1 != epoch2


def test_trainer_checkpoint_includes_input_state(npz_shard, tmp_path, tiny_model):
    """Trainer.save() persists the grain iterator position beside the
    Orbax checkpoint; Trainer.restore() resumes the stream there."""
    import os

    from human_pose_estimation_tpu.core.smpl import save_model_npz
    from human_pose_estimation_tpu.train.trainer import Trainer

    path, n = npz_shard
    model_path = str(tmp_path / "model.npz")
    save_model_npz(tiny_model, model_path)
    cfg = Config(
        smpl_model_path=model_path,
        checkpoint_dir=str(tmp_path / "ckpt"),
        batch_size=2,
        img_size=56,
        max_silhouette_points=128,
        encoder_dtype="float32",
        train_from_checkpoint=True,
    )

    def make_pipe():
        return GrainImagePipeline(
            cfg, [path], mode="train", canvas=96, seed=7, augment=False
        )

    pipe = make_pipe()
    it = iter(pipe)
    for _ in range(3):
        next(it)
    trainer = Trainer(
        cfg, dataset=pipe, validation_only=True, encoder_stage_sizes=(1, 1, 1, 1)
    )
    trainer.save()
    assert os.path.exists(
        os.path.join(cfg.checkpoint_dir, "0", "input_state.json")
    )
    want, _ = next(it)  # the batch a resumed run must produce next

    pipe2 = make_pipe()
    trainer2 = Trainer(
        cfg, dataset=pipe2, validation_only=True, encoder_stage_sizes=(1, 1, 1, 1)
    )
    assert trainer2.restore() == 0
    got, _ = next(iter(pipe2))
    np.testing.assert_array_equal(np.asarray(want.images), np.asarray(got.images))
    np.testing.assert_array_equal(np.asarray(want.kp2d), np.asarray(got.kp2d))


def test_make_image_pipeline_dispatch(npz_shard, tmp_path, monkeypatch):
    """Config.input_pipeline routes to the right implementation; unknown
    names are rejected."""
    import shutil

    from human_pose_estimation_tpu import data as data_mod
    from human_pose_estimation_tpu.data.npz_dataset import NpzImagePipeline

    path, n = npz_shard
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    shutil.copy(path, data_dir / "lsp_16.npz")

    base = dict(
        batch_size=2,
        img_size=64,
        max_silhouette_points=128,
        data_dir=str(data_dir),
        datasets=["lsp_16"],
    )
    p = data_mod.make_image_pipeline(Config(input_pipeline="grain", **base), mode="val")
    assert isinstance(p, GrainImagePipeline)
    p = data_mod.make_image_pipeline(Config(input_pipeline="npz", **base), mode="val")
    assert isinstance(p, NpzImagePipeline)
    with pytest.raises(ValueError):
        Config(input_pipeline="bogus", **base)
