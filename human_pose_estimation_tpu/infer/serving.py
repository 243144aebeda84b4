"""Serving layer: request microbatching around the fused Predictor.

The reference serves one frame at a time from a webcam loop
(ref preview.py:70-123). A production TPU server instead wants requests
from many clients coalesced into the Predictor's fixed compiled batch —
one executable, no recompiles, the chip kept busy. This module provides
that: a thread-safe `BatchingPredictor` that queues single-image
requests, flushes a padded batch when it is full or when the oldest
request has waited `max_latency_ms`, and resolves per-request futures.

No external dependencies — plain threading; callers integrate it behind
whatever RPC front-end they use.
"""
from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Dict, Optional

import numpy as np

from .predictor import Predictor


class BatchingPredictor:
    """Microbatching front-end over a Predictor.

    submit(image) -> Future resolving to the per-image result dict
    (same keys as Predictor.predict, leading batch dim stripped).

    * Batches flush when `batch_size` requests are queued OR the oldest
      waiting request exceeds `max_latency_ms` (latency/throughput knob).
    * All device work happens on one dispatcher thread: safe to call
      submit() from many threads without serializing them on the chip.
    * `pipeline_depth` batches are kept in flight (dispatched but not yet
      fetched) when the predictor exposes predict_async/predict_fetch:
      batch k+1's host work + upload can overlap batch k's device compute
      on host-attached chips, where JAX dispatch is asynchronous. Depth 1
      (default) is the strictly-serial loop. Measured on a relay-attached
      chip the depths are throughput-neutral (the relay serializes
      dispatches — PERF.md "Serving layer"), so only raise this on local
      attachments. Results are still fetched eagerly whenever the request
      queue is empty, so light load sees no added latency.
    """

    def __init__(
        self,
        predictor: Predictor,
        max_latency_ms: float = 5.0,
        queue_capacity: int = 4096,
        pipeline_depth: int = 1,
    ):
        self.predictor = predictor
        self.batch_size = predictor.batch_size
        self.max_latency = max_latency_ms / 1000.0
        self.pipeline_depth = max(1, int(pipeline_depth))
        self._queue: queue.Queue = queue.Queue(maxsize=queue_capacity)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._thread.start()
        # served/batches counters for autoscaling / monitoring
        self.stats = {"requests": 0, "batches": 0, "padded_slots": 0}

    # ----------------------------------------------------------- public
    def submit(self, image: np.ndarray) -> "Future[Dict[str, np.ndarray]]":
        """Enqueue one (H, W, 3) image (uint8 preferred); returns a Future."""
        if self._stop.is_set():
            raise RuntimeError("BatchingPredictor is closed")
        fut: Future = Future()
        self._queue.put((np.asarray(image), fut))
        return fut

    def predict_single_image(self, image) -> Dict[str, np.ndarray]:
        """Blocking convenience wrapper (drop-in for light callers)."""
        return self.submit(image).result()

    def close(self, timeout: Optional[float] = 10.0) -> None:
        """Flush outstanding requests and stop the dispatcher."""
        self._stop.set()
        self._thread.join(timeout=timeout)
        # A submit() racing the dispatcher's final empty-queue check could
        # leave an unserved future behind; fail it rather than hang callers.
        while True:
            try:
                _, fut = self._queue.get_nowait()
            except queue.Empty:
                break
            fut.set_exception(RuntimeError("BatchingPredictor closed"))

    # ------------------------------------------------------- dispatcher
    def _collect(self):
        """Block for the first request, then gather until the batch is
        full or the first request's deadline passes."""
        try:
            first = self._queue.get(timeout=0.1)
        except queue.Empty:
            return []
        items = [first]
        deadline = time.perf_counter() + self.max_latency
        while len(items) < self.batch_size:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                items.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return items

    def _dispatch_loop(self):
        # Predictors without the async API (e.g. ExportedPredictor) run
        # blocking-at-fetch: same FIFO semantics, no overlap.
        dispatch = getattr(self.predictor, "predict_async", None)
        fetch = getattr(self.predictor, "predict_fetch", None)
        if dispatch is None or fetch is None:
            dispatch = lambda images: images  # noqa: E731
            fetch = self.predictor.predict  # noqa: E731

        from collections import deque

        inflight: deque = deque()  # (handle, items) in dispatch order

        def drain_oldest():
            handle, items = inflight.popleft()
            try:
                out = fetch(handle)
            except Exception as exc:  # propagate to every waiting caller
                for _, fut in items:
                    fut.set_exception(exc)
                return
            self.stats["requests"] += len(items)
            self.stats["batches"] += 1
            self.stats["padded_slots"] += self.batch_size - len(items)
            for i, (_, fut) in enumerate(items):
                fut.set_result({k: v[i] for k, v in out.items()})

        while True:
            # Fetch eagerly when idle (no latency added under light load)
            # or when the pipeline is full.
            while inflight and (
                len(inflight) >= self.pipeline_depth or self._queue.empty()
            ):
                drain_oldest()
            items = self._collect()
            if not items:
                if self._stop.is_set() and self._queue.empty():
                    while inflight:
                        drain_oldest()
                    return
                continue
            images = np.stack([im for im, _ in items])
            try:
                handle = dispatch(images)
            except Exception as exc:
                for _, fut in items:
                    fut.set_exception(exc)
                continue
            inflight.append((handle, items))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
