"""Input pipelines: host-side record IO feeding device-side preprocessing.

Capability parity with ref src/data_loader.py (DataLoader.load /
load_val_dataset / get_smpl_loader) with the TPU-native split of
SURVEY.md §2/§7:

* host (tf.data, C++ runtime): record read -> shuffle (on serialized
  bytes, before decode) -> repeat -> JPEG/PNG decode -> fit into a fixed
  uint8 canvas -> batch;
* device (one jit program): scale/translation jitter, crop, flip,
  normalization, silhouette extraction (data/augment.py), producing the
  GenBatch consumed by the train step.

The mocap prior stream replaces the reference's per-sample map-time SMPL
forward (ref src/data_loader.py:139-143) with one *batched* SMPL forward
per step on device.
"""
from __future__ import annotations

from typing import Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..core.smpl import SMPLModel, smpl_forward
from ..train.step import GenBatch, MocapBatch
from .augment import AugmentConfig, augment_batch, extract_silhouette
from . import tfrecords


def _tf():
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    return tf


def person_window_half(cfg: Config, augment: bool) -> int:
    """Half-extent of the source-resolution person window that covers
    every possible device-side crop: the img_size-crop at min scale spans
    img_size/scale_min source pixels, plus center jitter and rounding
    slack. Shared by all four host pipelines so their geometry agrees."""
    if augment:
        return int(
            np.ceil(cfg.img_size / (2.0 * min(cfg.scale_min, 1.0)))
            + cfg.trans_max
            + 4
        )
    return int(np.ceil(cfg.img_size / 2.0) + 4)


class DevicePreprocessor:
    """The jit-compiled device half of the input pipeline."""

    def __init__(self, cfg: Config, augment: bool = True):
        self.aug_cfg = AugmentConfig(
            out_size=cfg.img_size,
            trans_max=cfg.trans_max,
            scale_min=cfg.scale_min,
            scale_max=cfg.scale_max,
            augment=augment,
        )
        self.max_sil = cfg.max_silhouette_points
        self._fn = jax.jit(self._impl)

    def _impl(self, images, segs, hw, centers, labels, rng):
        crops, crop_segs, label = augment_batch(
            images, segs, hw, centers, labels, rng, self.aug_cfg
        )
        pts, mask = extract_silhouette(crop_segs, self.max_sil)
        return GenBatch(images=crops, seg_points=pts, seg_mask=mask, kp2d=label)

    def __call__(self, host_batch, rng) -> GenBatch:
        return self._fn(
            jnp.asarray(host_batch["image"]),
            jnp.asarray(host_batch["seg"]),
            jnp.asarray(host_batch["hw"]),
            jnp.asarray(host_batch["center"]),
            jnp.asarray(host_batch["label"]),
            rng,
        )


def _fit_to_canvas(tf, parsed, canvas: int, window_half=None):
    """Crop a person window at SOURCE resolution, then scale-to-fit into a
    fixed uint8 canvas (top-left); geometry (kp/center) is shifted and
    rescaled identically so the device-side crop math sees an equivalent
    original.

    window_half: half-extent (pixels) of the window around the person
    center that covers every possible device-side jitter/scale crop
    (img_size/(2*scale_min) + trans_max). Cropping it FIRST means a small
    person in a large frame keeps (near-)source resolution through the
    pipeline — the reference jitter-scales and crops at original
    resolution (ref src/data_loader.py:160-213); scaling the whole frame
    to the canvas first (the old behavior) destroyed detail. Window
    edges clipped by the image boundary keep the reference's
    edge-replicate semantics (the device resampler clamps at the true
    image edge there)."""
    img = parsed["image"]
    seg = parsed["seg"]
    h = parsed["height"]
    w = parsed["width"]
    label = parsed["label"]
    center = parsed["center"]

    if window_half is not None:
        half = tf.cast(window_half, tf.int32)
        x0 = tf.clip_by_value(center[0] - half, 0, tf.maximum(w - 1, 0))
        y0 = tf.clip_by_value(center[1] - half, 0, tf.maximum(h - 1, 0))
        x1 = tf.maximum(tf.minimum(w, center[0] + half), x0 + 1)
        y1 = tf.maximum(tf.minimum(h, center[1] + half), y0 + 1)
        img = tf.image.crop_to_bounding_box(img, y0, x0, y1 - y0, x1 - x0)
        seg = tf.image.crop_to_bounding_box(seg, y0, x0, y1 - y0, x1 - x0)
        h = y1 - y0
        w = x1 - x0
        fx0 = tf.cast(x0, tf.float32)
        fy0 = tf.cast(y0, tf.float32)
        label = tf.stack([label[0] - fx0, label[1] - fy0, label[2]], axis=0)
        center = center - tf.stack([x0, y0])

    longest = tf.maximum(h, w)
    scale = tf.minimum(1.0, tf.cast(canvas, tf.float32) / tf.cast(longest, tf.float32))
    new_h = tf.cast(tf.math.floor(tf.cast(h, tf.float32) * scale), tf.int32)
    new_w = tf.cast(tf.math.floor(tf.cast(w, tf.float32) * scale), tf.int32)
    img = tf.image.resize(img, (new_h, new_w), method="bilinear")
    seg = tf.image.resize(seg, (new_h, new_w), method="bilinear")
    fy = tf.cast(new_h, tf.float32) / tf.cast(h, tf.float32)
    fx = tf.cast(new_w, tf.float32) / tf.cast(w, tf.float32)
    xy = tf.stack([label[0] * fx, label[1] * fy, label[2]], axis=0)
    center = tf.cast(
        tf.stack(
            [
                tf.cast(center[0], tf.float32) * fx,
                tf.cast(center[1], tf.float32) * fy,
            ]
        ),
        tf.int32,
    )
    img = tf.image.pad_to_bounding_box(
        tf.cast(tf.round(img), tf.uint8), 0, 0, canvas, canvas
    )
    seg = tf.image.pad_to_bounding_box(
        tf.cast(tf.round(seg), tf.uint8), 0, 0, canvas, canvas
    )
    return {
        "image": img,
        "seg": seg,
        "hw": tf.stack([new_h, new_w]),
        "center": center,
        "label": xy,
    }


class ImagePipeline:
    """Image/seg/keypoint stream -> GenBatch iterator.

    mode='train': shuffle(10000) + repeat + augmentation (ref
    src/trainer.py:154-159). mode='val': deterministic by default (no
    jitter/flip, no shuffle, single pass). Note the reference runs the
    SAME random augmentation on validation data (read_data is shared,
    src/data_loader.py:87-93); pass augment=True/shuffle=True/repeat=True
    for that bug-compatible behavior.
    """

    def __init__(
        self,
        cfg: Config,
        datasets: Optional[Sequence[str]] = None,
        files: Optional[Sequence[str]] = None,
        mode: str = "train",
        augment: Optional[bool] = None,
        canvas: int = 256,
        shuffle: Optional[bool] = None,
        repeat: Optional[bool] = None,
        seed: Optional[int] = None,
        shard_by_host: bool = False,
        device_preprocess: bool = True,
        num_shards: Optional[int] = None,
        shard_index: Optional[int] = None,
        cache: bool = False,
    ):
        tf = _tf()
        self.cfg = cfg
        self.canvas = canvas
        self.batch_size = cfg.batch_size
        if files is None:
            files = tfrecords.record_files(
                cfg.data_dir, datasets if datasets is not None else cfg.datasets
            )
        self.files = list(files)
        # Multi-host DP: each host reads a disjoint input shard (the
        # per-host half of the sharded pipeline, SURVEY.md §2 parallelism
        # plan); batch_size here is the per-host batch. Sharding is ALWAYS
        # at the EXAMPLE level (ds.shard): file-level slicing is uneven
        # whenever file example-counts differ (lsp_train=1000 vs
        # lsp_ext=8642 — hosts would step at different example rates,
        # silently skewing epoch accounting and val sweeps), and the
        # reference's LSP datasets are one .tfrecords file each anyway
        # (ref data_utils.py:87-90). The cost — every host scans all
        # files and keeps 1/num_shards of the records — is negligible at
        # this corpus scale (tens of MB per host).
        example_shard = None  # (num, index) applied after dataset creation
        if shard_by_host and (num_shards is None):
            num_shards, shard_index = jax.process_count(), jax.process_index()
        if num_shards is not None and num_shards > 1:
            example_shard = (num_shards, shard_index)
        augment = (mode == "train") if augment is None else augment
        shuffle = (mode == "train") if shuffle is None else shuffle
        repeat = (mode == "train") if repeat is None else repeat
        # device_preprocess=False yields raw HostBatch tuples for the fused
        # train step (train/step.make_fused_train_step), which runs the
        # augmentation inside the training program.
        self.device_preprocess = device_preprocess
        self.prep = DevicePreprocessor(cfg, augment=augment) if device_preprocess else None
        self.rng = jax.random.PRNGKey(cfg.seed if seed is None else seed)
        self.window_half = person_window_half(cfg, augment)

        ds = tf.data.TFRecordDataset(self.files)
        if example_shard is not None:
            ds = ds.shard(*example_shard)
        half = self.window_half
        parse = lambda s: _fit_to_canvas(  # noqa: E731
            tf, tfrecords.parse_image_example(s), canvas, window_half=half
        )
        if cache:
            # Small-corpus hot loop (e.g. the closed-loop quality bench:
            # 512 images cycled every 16 steps): decode + canvas ONCE into
            # an in-memory cache, then shuffle/repeat from it — on a
            # host-CPU-bound box the per-epoch JPEG re-decode otherwise
            # dominates the training loop. Element set per epoch is
            # identical; only the (seeded) shuffle order differs from the
            # uncached stream, so keep one cache setting across compared
            # runs. Off by default: production corpora don't fit in RAM.
            ds = ds.map(parse, num_parallel_calls=tf.data.AUTOTUNE).cache()
            if shuffle:
                ds = ds.shuffle(10000, seed=cfg.seed)
            if repeat:
                ds = ds.repeat()
        else:
            if shuffle:
                ds = ds.shuffle(10000, seed=cfg.seed)
            if repeat:
                ds = ds.repeat()
            ds = ds.map(parse, num_parallel_calls=tf.data.AUTOTUNE)
        ds = ds.batch(self.batch_size, drop_remainder=repeat)
        self.ds = ds.prefetch(tf.data.AUTOTUNE)

    def __iter__(self):
        """Yields (GenBatch, n_valid): n_valid < batch_size only on the
        terminal partial batch of a non-repeating (eval) pipeline — the
        tail is zero-padded to keep one compiled shape."""
        step = 0
        for host_batch in self.ds.as_numpy_iterator():
            n = host_batch["image"].shape[0]
            if n < self.batch_size:
                pad = self.batch_size - n

                def padded(a):
                    return np.concatenate(
                        [a, np.zeros((pad, *a.shape[1:]), a.dtype)], axis=0
                    )

                host_batch = {k: padded(v) for k, v in host_batch.items()}
            if self.device_preprocess:
                rng = jax.random.fold_in(self.rng, step)
                yield self.prep(host_batch, rng), n
            else:
                from ..train.step import HostBatch

                yield (
                    HostBatch(
                        image=host_batch["image"],
                        seg=host_batch["seg"],
                        hw=host_batch["hw"],
                        center=host_batch["center"],
                        label=host_batch["label"],
                    ),
                    n,
                )
            step += 1


class MocapPipeline:
    """Mocap (pose, shape) stream -> MocapBatch via one batched on-device
    SMPL forward (replacing ref preprocess_poses, src/data_loader.py:139-143).

    Batch size is batch_size * num_stage to pair real samples 1:1 with the
    concatenated 3-stage fakes (ref src/trainer.py:163)."""

    def __init__(
        self,
        cfg: Config,
        smpl: SMPLModel,
        files: Optional[Sequence[str]] = None,
        shuffle: bool = True,
        device_forward: bool = True,
    ):
        tf = _tf()
        self.batch = cfg.batch_size * cfg.num_stage
        # device_forward=False yields raw (pose, shape) for the fused train
        # step, which runs the SMPL forward inside the training program.
        self.device_forward = device_forward
        if files is None:
            files = tfrecords.mocap_record_files(cfg.data_dir, cfg.mocap_datasets)
        if not files:
            raise FileNotFoundError(
                f"no mocap tfrecords for {cfg.mocap_datasets} under {cfg.data_dir}"
            )
        ds = tf.data.TFRecordDataset(list(files))
        if shuffle:
            ds = ds.shuffle(10000, seed=cfg.seed)
        ds = ds.repeat().map(
            tfrecords.parse_mocap_example_tf, num_parallel_calls=tf.data.AUTOTUNE
        )
        self.ds = ds.batch(self.batch, drop_remainder=True).prefetch(tf.data.AUTOTUNE)

        def to_mocap(pose, shape):
            out = smpl_forward(smpl, shape, pose, joint_type="cocoplus")
            return MocapBatch(
                joints=out.joints,
                shapes=shape,
                rotations=out.rotations[:, 1:],
            )

        self._fwd = jax.jit(to_mocap)

    def __iter__(self):
        for pose, shape in self.ds.as_numpy_iterator():
            if self.device_forward:
                yield self._fwd(jnp.asarray(pose), jnp.asarray(shape))
            else:
                yield jnp.asarray(pose), jnp.asarray(shape)
