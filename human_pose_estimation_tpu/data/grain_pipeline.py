"""Grain-based host input pipeline over npz shards.

A fourth interchangeable host path (`Config.input_pipeline='grain'`)
with the same (GenBatch, n_valid) contract as the tfrecord/npz/native
pipelines (capability parity with ref src/data_loader.py
DataLoader.load/load_val_dataset), built on `grain.MapDataset`. What it
adds over the plain npz path:

* **deterministic, seeded, per-epoch reshuffling** without loading the
  index into Python lists (grain's stateless shuffle);
* **checkpointable iterator state** — `get_state()`/`set_state()`
  capture exactly where the input stream is, so training resume replays
  from the same sample (the reference cannot do this at all: tf.data
  iterator state is never saved, ref src/trainer.py:719-721 restores
  weights only);
* **multiprocess host decode** (`num_workers > 0`) via grain's
  `mp_prefetch`, keeping JPEG decode off the trainer process;
* per-host sharding for multi-host training via an index slice
  (`shard_by_host=True`), grain's equivalent of ShardByJaxProcess.

Device-side work (augmentation -> GenBatch) is the same
DevicePreprocessor used by every other pipeline, so all four paths feed
the identical compiled train step.
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from ..config import Config
from .npz_dataset import _fit_to_canvas_np
from .pipeline import DevicePreprocessor


class NpzShardSource:
    """Random-access grain data source over npz shards (the same shard
    layout as data/npz_dataset.py: jpeg/png object arrays + label/center).

    Shards are opened lazily and cached per process, so the source
    pickles cheaply into grain worker processes (only paths + offsets
    cross the process boundary).
    """

    def __init__(self, files: Sequence[str]):
        self.files = list(files)
        if not self.files:
            raise FileNotFoundError("no npz shards given")
        self._lengths: List[int] = []
        for path in self.files:
            with np.load(path, allow_pickle=True) as z:
                self._lengths.append(int(z["label"].shape[0]))
        self._offsets = np.cumsum([0] + self._lengths)
        self._cache: Dict[int, Any] = {}

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_cache"] = {}
        return state

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def _shard(self, i: int):
        z = self._cache.get(i)
        if z is None:
            data = np.load(self.files[i], allow_pickle=True)
            z = {k: data[k] for k in ("jpeg", "png", "label", "center")}
            self._cache[i] = z
        return z

    def __getitem__(self, index: int) -> Tuple[bytes, bytes, np.ndarray, np.ndarray]:
        index = int(index)
        if index < 0:
            index += len(self)
        s = int(np.searchsorted(self._offsets, index, side="right") - 1)
        z = self._shard(s)
        j = index - int(self._offsets[s])
        return z["jpeg"][j], z["png"][j], z["label"][j], z["center"][j]


def _decode_example(example, canvas: int, window_half=None) -> Dict[str, np.ndarray]:
    """Host decode + fit-to-canvas -> fixed-shape HostBatch row."""
    import cv2

    jpeg, png, label, center = example
    img = cv2.cvtColor(
        cv2.imdecode(np.frombuffer(jpeg, np.uint8), cv2.IMREAD_COLOR),
        cv2.COLOR_BGR2RGB,
    )
    seg = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_GRAYSCALE)
    img_c, seg_c, label, center, hw = _fit_to_canvas_np(
        img, seg, label, center, canvas, window_half=window_half
    )
    return {
        "image": img_c,
        "seg": seg_c,
        "label": label,
        "center": np.asarray(center, np.int32),
        "hw": np.asarray(hw, np.int32),
    }


def _pad_row(canvas: int) -> Dict[str, np.ndarray]:
    return {
        "image": np.zeros((canvas, canvas, 3), np.uint8),
        "seg": np.zeros((canvas, canvas, 1), np.uint8),
        "label": np.zeros((3, 19), np.float32),
        "center": np.zeros(2, np.int32),
        "hw": np.ones(2, np.int32),
    }


class GrainImagePipeline:
    """Grain image pipeline: npz shards -> (multiprocess) host decode ->
    device augmentation. Yields (GenBatch, n_valid) like ImagePipeline.

    One live iterator per pipeline instance: `__iter__` hands out a view
    over the same underlying grain iterator so `get_state`/`set_state`
    always refer to the stream being consumed.
    """

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
        num_workers: int = 0,
        shard_by_host: bool = False,
        read_threads: int = 2,
    ):
        import grain

        self.cfg = cfg
        self.canvas = canvas
        self.batch_size = cfg.batch_size
        self.augment = (mode == "train") if augment is None else augment
        self.shuffle = (mode == "train") if shuffle is None else shuffle
        self.repeat = (mode == "train") if repeat is None else repeat
        self.prep = DevicePreprocessor(cfg, augment=self.augment)
        from .pipeline import person_window_half

        window_half = person_window_half(cfg, self.augment)
        seed = cfg.seed if seed is None else seed
        self.rng_key = jax.random.PRNGKey(seed)
        self._step = 0

        source = NpzShardSource(files)
        ds = grain.MapDataset.source(source).seed(seed)
        if shard_by_host and jax.process_count() > 1:
            ds = ds.slice(slice(jax.process_index(), None, jax.process_count()))
        if self.shuffle:
            ds = ds.shuffle()  # stateless; reshuffles every epoch
        if self.repeat:
            ds = ds.repeat()
        ds = ds.map(lambda ex: _decode_example(ex, canvas, window_half))
        # grain's default batch_fn tree-stacks the dict rows
        ds = ds.batch(self.batch_size, drop_remainder=self.repeat)
        it_ds = ds.to_iter_dataset(
            grain.ReadOptions(num_threads=read_threads, prefetch_buffer_size=8)
        )
        if num_workers > 0:
            it_ds = it_ds.mp_prefetch(
                grain.MultiprocessingOptions(num_workers=num_workers)
            )
        self._it = iter(it_ds)

    # ------------------------------------------------------ checkpointing
    def get_state(self) -> Dict[str, Any]:
        """Resumable input position: grain iterator state + device-RNG step."""
        return {"grain": self._it.get_state(), "step": self._step}

    def set_state(self, state: Dict[str, Any]) -> None:
        self._it.set_state(state["grain"])
        self._step = int(state["step"])

    # ------------------------------------------------------------- stream
    def __iter__(self):
        for host in self._it:
            n = int(host["image"].shape[0])
            if n < self.batch_size:  # non-repeat tail: pad to compiled batch
                pad = _pad_row(self.canvas)
                host = {
                    k: np.concatenate(
                        [host[k], np.stack([pad[k]] * (self.batch_size - n))]
                    )
                    for k in host
                }
            rng = jax.random.fold_in(self.rng_key, self._step)
            self._step += 1
            yield self.prep(host, rng), n
