"""TF-free dataset path: npz shards + a pure numpy/cv2 host pipeline.

The tfrecord path (data/tfrecords.py + data/pipeline.py) keeps
byte-compatibility with the reference's datasets; this module provides a
TensorFlow-free alternative with the same host/device split: shards hold
encoded JPEG/PNG bytes + labels, the host decodes with OpenCV into the
fixed uint8 canvas, and the SAME DevicePreprocessor (or the fused train
step) runs the augmentation on device. Useful where the TF runtime is
unwanted on serving/training hosts.

Shard layout (np.savez, allow_pickle for the byte arrays):
  jpeg (N,) object — encoded RGB JPEG bytes
  png  (N,) object — encoded 1-channel segmentation PNG bytes
  label (N, 3, 19) float32 — [x, y, vis] rows, 14 joints + 5 face pts
  center (N, 2) int32 — person center [cx, cy]
"""
from __future__ import annotations

import os
from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import numpy as np

from ..config import Config
from .pipeline import DevicePreprocessor


def write_npz_shard(
    out_path: str,
    jpeg_bytes: Sequence[bytes],
    png_bytes: Sequence[bytes],
    labels: np.ndarray,  # (N, 3, >=14)
    centers: np.ndarray,  # (N, 2)
) -> int:
    n = len(jpeg_bytes)
    lab = np.asarray(labels, np.float32)
    if lab.shape[2] < 19:  # append empty face points
        pad = np.zeros((n, 3, 19 - lab.shape[2]), np.float32)
        lab = np.concatenate([lab, pad], axis=2)
    np.savez(
        out_path,
        jpeg=np.asarray(list(jpeg_bytes), dtype=object),
        png=np.asarray(list(png_bytes), dtype=object),
        label=lab,
        center=np.asarray(centers, np.int32),
    )
    return n


def convert_images_to_npz_shard(out_path: str, pairs, joints: np.ndarray) -> int:
    """Build a shard directly from (image_path, seg_path) pairs + a
    (3, 14, N) joints array (same inputs as tfrecords.create_image_tfrecord)."""
    import cv2

    from .tfrecords import center_from_visible

    jpegs, pngs, labels, centers = [], [], [], []
    for idx, (img_path, seg_path) in enumerate(pairs):
        label = np.asarray(joints[:, :, idx], np.float32)
        if not (label[2] > 0).any():
            continue
        with open(img_path, "rb") as f:
            img_bytes = f.read()
        seg = cv2.imread(seg_path, cv2.IMREAD_GRAYSCALE)
        ok, png = cv2.imencode(".png", seg)
        assert ok
        jpegs.append(img_bytes)
        pngs.append(png.tobytes())
        labels.append(label)
        centers.append(center_from_visible(label))
    return write_npz_shard(
        out_path, jpegs, pngs, np.stack(labels), np.stack(centers)
    )


def _fit_to_canvas_np(img, seg, label, center, canvas: int, window_half=None):
    """numpy/cv2 twin of pipeline._fit_to_canvas (same geometry,
    including the source-resolution person-window pre-crop)."""
    import cv2

    h, w = img.shape[:2]
    if window_half is not None and window_half > 0:
        cx, cy = int(center[0]), int(center[1])
        x0 = min(max(cx - window_half, 0), max(w - 1, 0))
        y0 = min(max(cy - window_half, 0), max(h - 1, 0))
        x1 = max(min(w, cx + window_half), x0 + 1)
        y1 = max(min(h, cy + window_half), y0 + 1)
        if (x0, y0, x1, y1) != (0, 0, w, h):
            img = img[y0:y1, x0:x1]
            seg = seg[y0:y1, x0:x1]
            label = np.stack(
                [label[0] - x0, label[1] - y0, label[2]], axis=0
            )
            center = np.asarray([cx - x0, cy - y0], np.int32)
            h, w = img.shape[:2]
    scale = min(1.0, canvas / max(h, w))
    new_h, new_w = int(np.floor(h * scale)), int(np.floor(w * scale))
    if (new_h, new_w) != (h, w):
        img = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
        seg = cv2.resize(seg, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    fy, fx = new_h / h, new_w / w
    label = np.stack([label[0] * fx, label[1] * fy, label[2]], axis=0)
    center = np.asarray(
        [int(center[0] * fx), int(center[1] * fy)], np.int32
    )
    img_c = np.zeros((canvas, canvas, 3), np.uint8)
    img_c[:new_h, :new_w] = img
    seg_c = np.zeros((canvas, canvas, 1), np.uint8)
    seg_c[:new_h, :new_w, 0] = seg
    return img_c, seg_c, label.astype(np.float32), center, (new_h, new_w)


class NpzImagePipeline:
    """TF-free image pipeline: npz shards -> host decode/canvas ->
    device augmentation. Yields (GenBatch, n_valid) like ImagePipeline."""

    def __init__(
        self,
        cfg: Config,
        files: Sequence[str],
        mode: str = "train",
        augment: Optional[bool] = None,
        canvas: int = 256,
        shuffle: Optional[bool] = None,
        repeat: Optional[bool] = None,
        seed: Optional[int] = None,
    ):
        self.cfg = cfg
        self.canvas = canvas
        self.batch_size = cfg.batch_size
        self.augment = (mode == "train") if augment is None else augment
        self.shuffle = (mode == "train") if shuffle is None else shuffle
        self.repeat = (mode == "train") if repeat is None else repeat
        self.prep = DevicePreprocessor(cfg, augment=self.augment)
        from .pipeline import person_window_half

        self.window_half = person_window_half(cfg, self.augment)
        self.rng_key = jax.random.PRNGKey(cfg.seed if seed is None else seed)
        self.np_rng = np.random.RandomState(cfg.seed if seed is None else seed)

        self._examples: List[Tuple[bytes, bytes, np.ndarray, np.ndarray]] = []
        for path in files:
            z = np.load(path, allow_pickle=True)
            for j, p, lab, cen in zip(z["jpeg"], z["png"], z["label"], z["center"]):
                self._examples.append((j, p, lab, cen))
        if not self._examples:
            raise FileNotFoundError(f"no examples in npz shards {list(files)}")

    def _decode(self, example):
        import cv2

        jpeg, png, label, center = example
        img = cv2.cvtColor(
            cv2.imdecode(np.frombuffer(jpeg, np.uint8), cv2.IMREAD_COLOR),
            cv2.COLOR_BGR2RGB,
        )
        seg = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_GRAYSCALE)
        return _fit_to_canvas_np(
            img, seg, label, center, self.canvas, window_half=self.window_half
        )

    def __iter__(self) -> Iterator:
        step = 0
        while True:
            order = np.arange(len(self._examples))
            if self.shuffle:
                self.np_rng.shuffle(order)
            for start in range(0, len(order), self.batch_size):
                idx = order[start : start + self.batch_size]
                n = len(idx)
                if n < self.batch_size and self.repeat:
                    continue  # drop remainder while repeating (as tf.data)
                decoded = [self._decode(self._examples[i]) for i in idx]
                pad = self.batch_size - n
                while len(decoded) < self.batch_size:
                    zero = (
                        np.zeros((self.canvas, self.canvas, 3), np.uint8),
                        np.zeros((self.canvas, self.canvas, 1), np.uint8),
                        np.zeros((3, 19), np.float32),
                        np.zeros(2, np.int32),
                        (1, 1),
                    )
                    decoded.append(zero)
                host_batch = {
                    "image": np.stack([d[0] for d in decoded]),
                    "seg": np.stack([d[1] for d in decoded]),
                    "label": np.stack([d[2] for d in decoded]),
                    "center": np.stack([d[3] for d in decoded]),
                    "hw": np.asarray([d[4] for d in decoded], np.int32),
                }
                rng = jax.random.fold_in(self.rng_key, step)
                yield self.prep(host_batch, rng), n
                step += 1
            if not self.repeat:
                return


# ---------------------------------------------------------------------------
# Mocap prior stream (TF-free)
# ---------------------------------------------------------------------------


def write_mocap_npz_shard(out_path: str, pose: np.ndarray, shape: np.ndarray) -> int:
    """Write a mocap shard: pose (N, 72) axis-angle, shape (N, 10) betas
    (the same fields as the reference's mocap tfrecords,
    ref src/util/data_utils.py:109-127)."""
    pose = np.asarray(pose, np.float32)
    shape = np.asarray(shape, np.float32)
    assert pose.ndim == 2 and pose.shape[1] == 72, pose.shape
    assert shape.shape == (pose.shape[0], 10), shape.shape
    np.savez(out_path, pose=pose, shape=shape)
    return pose.shape[0]


def convert_mocap_tfrecords_to_npz(tfrecord_files, out_path: str) -> int:
    """Migrate reference mocap tfrecords to a TF-free npz shard (one-time;
    requires TensorFlow to read the source records)."""
    import tensorflow as tf

    from .tfrecords import parse_mocap_example_tf

    poses, shapes = [], []
    for raw in tf.data.TFRecordDataset(list(tfrecord_files)):
        p, s = parse_mocap_example_tf(raw)
        poses.append(p.numpy())
        shapes.append(s.numpy())
    return write_mocap_npz_shard(out_path, np.stack(poses), np.stack(shapes))


class NpzMocapPipeline:
    """TF-free mocap (pose, shape) stream -> MocapBatch via one batched
    on-device SMPL forward (TF-free twin of data/pipeline.MocapPipeline;
    replaces the reference's per-sample map-time SMPL forward,
    ref src/data_loader.py:139-143). Repeats forever; batch size is
    batch_size * num_stage to pair 1:1 with the concatenated 3-stage
    fakes (ref src/trainer.py:163)."""

    def __init__(
        self,
        cfg: Config,
        smpl,
        files: Sequence[str],
        shuffle: bool = True,
        device_forward: bool = True,
        seed: Optional[int] = None,
    ):
        import jax.numpy as jnp

        from ..core.smpl import smpl_forward
        from ..train.step import MocapBatch

        poses, shapes = [], []
        for path in files:
            z = np.load(path)
            poses.append(np.asarray(z["pose"], np.float32))
            shapes.append(np.asarray(z["shape"], np.float32))
        if not poses:
            raise FileNotFoundError(f"no mocap npz shards in {list(files)}")
        self.pose = np.concatenate(poses, axis=0)
        self.shape = np.concatenate(shapes, axis=0)
        self.batch = cfg.batch_size * cfg.num_stage
        self.shuffle = shuffle
        self.device_forward = device_forward
        self.seed = cfg.seed if seed is None else seed
        # Resumable position: the per-epoch order derives solely from
        # (seed, epoch), so (epoch, pos) is the COMPLETE stream state —
        # the mocap analog of the grain image pipeline's checkpointable
        # iterator (the reference restores weights only,
        # ref src/trainer.py:719-721).
        self._epoch = 0
        self._pos = 0

        def to_mocap(pose, shape):
            out = smpl_forward(smpl, shape, pose, joint_type="cocoplus")
            return MocapBatch(
                joints=out.joints, shapes=shape, rotations=out.rotations[:, 1:]
            )

        self._fwd = jax.jit(to_mocap)

    # ------------------------------------------------------ checkpointing
    def get_state(self) -> dict:
        return {"epoch": self._epoch, "pos": self._pos}

    def set_state(self, state: dict) -> None:
        self._epoch = int(state["epoch"])
        self._pos = int(state["pos"])

    def _order(self, epoch: int) -> np.ndarray:
        order = np.arange(self.pose.shape[0])
        if self.shuffle:
            np.random.RandomState((self.seed + 77003 * epoch) % 2**31).shuffle(
                order
            )
        return order

    def __iter__(self):
        import jax.numpy as jnp

        n = self.pose.shape[0]
        while True:
            order = self._order(self._epoch)
            while self._pos + self.batch <= n:
                idx = order[self._pos : self._pos + self.batch]
                self._pos += self.batch
                pose = jnp.asarray(self.pose[idx])
                shape = jnp.asarray(self.shape[idx])
                if self.device_forward:
                    yield self._fwd(pose, shape)
                else:
                    yield pose, shape
            self._epoch += 1
            self._pos = 0
