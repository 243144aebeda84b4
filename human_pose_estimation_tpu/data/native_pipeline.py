"""Native-decoder input pipeline: npz shards -> C++ multithreaded
JPEG/PNG decode + canvas fit (native/dataloader.cpp) -> device
augmentation, with a background prefetch thread.

This is the framework's own native host pipeline — the role tf.data's
C++ runtime plays in the reference (ref train.py:35-40,
src/data_loader.py:87-93) — with zero TensorFlow dependency. Geometry
is identical to data/npz_dataset (same shards, same fit-to-canvas
contract), so it is a drop-in replacement for NpzImagePipeline wherever
an iterator of (GenBatch | HostBatch, n_valid) is consumed.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import numpy as np

from ..config import Config
from .pipeline import DevicePreprocessor


class NativeImagePipeline:
    """TF-free image pipeline with native batch decoding.

    Yields (GenBatch, n_valid), or (HostBatch, n_valid) with
    device_preprocess=False (for the fused train step). Host decode for
    batch k+1 overlaps device compute on batch k via a prefetch thread.
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
        device_preprocess: bool = True,
        num_threads: int = 0,
        prefetch: int = 2,
    ):
        from ..native import get_dataloader

        if get_dataloader() is None:
            raise RuntimeError(
                "native dataloader unavailable (no compiler / libjpeg); "
                "use data.npz_dataset.NpzImagePipeline instead"
            )
        self.cfg = cfg
        self.canvas = canvas
        self.batch_size = cfg.batch_size
        self.augment = (mode == "train") if augment is None else augment
        self.shuffle = (mode == "train") if shuffle is None else shuffle
        self.repeat = (mode == "train") if repeat is None else repeat
        self.num_threads = num_threads
        self.prefetch = max(1, prefetch)
        self.device_preprocess = device_preprocess
        self.prep = (
            DevicePreprocessor(cfg, augment=self.augment)
            if device_preprocess
            else None
        )
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

    # ------------------------------------------------------------ host
    def _decode_batch(self, idx: np.ndarray) -> dict:
        """Decode len(idx) examples (zero-padded to batch_size) into one
        host batch dict with the native decoder."""
        from ..native import decode_fit_batch

        n = len(idx)
        jpegs = [self._examples[i][0] for i in idx]
        pngs = [self._examples[i][1] for i in idx]
        centers_src = np.stack(
            [np.asarray(self._examples[i][3], np.int32) for i in idx]
        )
        img, seg, hw, win_hw, off_yx, _scale, err = decode_fit_batch(
            jpegs,
            pngs,
            self.canvas,
            num_threads=self.num_threads,
            centers=centers_src,
            window_half=self.window_half,
        )
        if (err != 0).any():
            bad = [int(i) for i, e in zip(idx, err) if e]
            raise ValueError(f"native decode failed for examples {bad}")
        label = np.zeros((n, 3, 19), np.float32)
        center = np.zeros((n, 2), np.int32)
        for k, i in enumerate(idx):
            lab = np.asarray(self._examples[i][2], np.float32)
            # float64 new/window ratios: bit-identical geometry with the
            # cv2/numpy path (_fit_to_canvas_np), incl. int truncation.
            # Geometry shifts into window coords (off) before rescaling.
            fy = hw[k, 0] / win_hw[k, 0]
            fx = hw[k, 1] / win_hw[k, 1]
            label[k] = np.stack(
                [
                    (lab[0] - off_yx[k, 1]) * fx,
                    (lab[1] - off_yx[k, 0]) * fy,
                    lab[2],
                ],
                axis=0,
            )
            c = self._examples[i][3]
            center[k] = (
                int((c[0] - off_yx[k, 1]) * fx),
                int((c[1] - off_yx[k, 0]) * fy),
            )

        pad = self.batch_size - n
        if pad:
            zpad = lambda a: np.concatenate(
                [a, np.zeros((pad, *a.shape[1:]), a.dtype)], axis=0
            )
            img, seg, label, center = map(zpad, (img, seg, label, center))
            hw = np.concatenate([hw, np.ones((pad, 2), np.int32)], axis=0)
        return {
            "image": img,
            "seg": seg,
            "hw": hw,
            "center": center,
            "label": label,
            "n": n,
        }

    def _index_batches(self) -> Iterator[np.ndarray]:
        while True:
            order = np.arange(len(self._examples))
            if self.shuffle:
                self.np_rng.shuffle(order)
            for start in range(0, len(order), self.batch_size):
                idx = order[start : start + self.batch_size]
                if len(idx) < self.batch_size and self.repeat:
                    continue  # drop remainder while repeating (as tf.data)
                yield idx
            if not self.repeat:
                return

    def _producer(self, q: queue.Queue, stop: threading.Event):
        try:
            for idx in self._index_batches():
                if stop.is_set():
                    return
                q.put(self._decode_batch(idx))
            q.put(None)  # end of stream
        except BaseException as e:  # surface decode errors to the consumer
            q.put(e)

    # ---------------------------------------------------------- public
    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        thread = threading.Thread(target=self._producer, args=(q, stop), daemon=True)
        thread.start()
        step = 0
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                n = item.pop("n")
                if self.device_preprocess:
                    rng = jax.random.fold_in(self.rng_key, step)
                    yield self.prep(item, rng), n
                else:
                    from ..train.step import HostBatch

                    yield (
                        HostBatch(
                            image=item["image"],
                            seg=item["seg"],
                            hw=item["hw"],
                            center=item["center"],
                            label=item["label"],
                        ),
                        n,
                    )
                step += 1
        finally:
            stop.set()
            # Unblock a producer waiting on a full queue.
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
