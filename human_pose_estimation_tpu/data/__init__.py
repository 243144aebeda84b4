"""Data layer: host record IO + on-device preprocessing.

Three interchangeable host pipelines produce the same (GenBatch |
HostBatch, n_valid) stream (capability parity with ref
src/data_loader.py DataLoader.load/load_val_dataset):

* ``tfrecord`` — tf.data feeder over the reference-compatible tfrecord
  schema (data/pipeline.ImagePipeline);
* ``npz``      — TF-free pure numpy/cv2 path over npz shards
  (data/npz_dataset.NpzImagePipeline);
* ``native``   — the framework's own C++ multithreaded decoder over the
  same npz shards with background prefetch
  (data/native_pipeline.NativeImagePipeline);
* ``grain``    — grain.MapDataset over the npz shards: deterministic
  per-epoch shuffle, multiprocess decode, checkpointable iterator state
  (data/grain_pipeline.GrainImagePipeline).

``make_image_pipeline`` dispatches on ``Config.input_pipeline``.
"""
from __future__ import annotations

import os
from glob import glob
from typing import List, Optional, Sequence

from ..config import Config


def npz_shard_files(data_dir: str, datasets: Sequence[str]) -> List[str]:
    """Resolve dataset names to npz shard paths: '<name>.npz' or a
    sharded '<name>/*.npz' directory under data_dir."""
    files: List[str] = []
    for name in datasets:
        single = os.path.join(data_dir, f"{name}.npz")
        if os.path.exists(single):
            files.append(single)
            continue
        hits = sorted(glob(os.path.join(data_dir, name, "*.npz")))
        files += hits if hits else [single]
    return files


def make_image_pipeline(
    cfg: Config,
    datasets: Optional[Sequence[str]] = None,
    mode: str = "train",
    **kw,
):
    """Build the image pipeline selected by cfg.input_pipeline."""
    names = list(datasets if datasets is not None else cfg.datasets)
    if cfg.input_pipeline == "tfrecord":
        from .pipeline import ImagePipeline

        return ImagePipeline(cfg, datasets=names, mode=mode, **kw)
    files = npz_shard_files(cfg.data_dir, names)
    shard_by_host = bool(kw.pop("shard_by_host", False))
    if cfg.input_pipeline == "grain":
        from .grain_pipeline import GrainImagePipeline

        kw.pop("device_preprocess", None)
        return GrainImagePipeline(
            cfg, files, mode=mode, shard_by_host=shard_by_host, **kw
        )
    # npz/native have no per-host example sharding: every process would
    # iterate the FULL dataset. Silently duplicating data across hosts is
    # wrong (duplicated epochs, wasted work), so refuse loudly.
    import jax

    if shard_by_host and jax.process_count() > 1:
        raise ValueError(
            f"input_pipeline={cfg.input_pipeline!r} cannot shard the input "
            "stream across hosts; use input_pipeline='grain' (per-host "
            "example sharding + resumable iterator) or 'tfrecord' for "
            "multi-host training"
        )
    if cfg.input_pipeline == "npz":
        from .npz_dataset import NpzImagePipeline

        kw.pop("device_preprocess", None)
        return NpzImagePipeline(cfg, files, mode=mode, **kw)
    if cfg.input_pipeline == "native":
        from .native_pipeline import NativeImagePipeline

        return NativeImagePipeline(cfg, files, mode=mode, **kw)
    raise ValueError(
        f"unknown input_pipeline {cfg.input_pipeline!r} "
        "(expected 'tfrecord', 'npz', 'native', or 'grain')"
    )


def npz_mocap_files(data_dir: str, mocap_datasets: Sequence[str]) -> List[str]:
    """Mocap npz shards, mirroring the tfrecord layout
    (mocap_neutrMosh/neutrSMPL_<name>_*.npz)."""
    files: List[str] = []
    for name in mocap_datasets:
        files += sorted(
            glob(
                os.path.join(
                    data_dir, "mocap_neutrMosh", f"neutrSMPL_{name}_*.npz"
                )
            )
        )
    return files


def make_mocap_pipeline(cfg: Config, smpl, **kw):
    """Build the mocap prior pipeline matching cfg.input_pipeline
    (tfrecord -> tf.data; npz/native -> TF-free numpy shards)."""
    if cfg.input_pipeline == "tfrecord":
        from .pipeline import MocapPipeline

        return MocapPipeline(cfg, smpl, **kw)
    from .npz_dataset import NpzMocapPipeline

    return NpzMocapPipeline(
        cfg, smpl, files=npz_mocap_files(cfg.data_dir, cfg.mocap_datasets), **kw
    )
