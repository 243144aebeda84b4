"""Device mesh + sharding layout for data-parallel training.

The reference is strictly single-device (SURVEY.md §2: no tf.distribute,
no collectives anywhere). The TPU-native framework makes data parallelism
first-class: a 1-D ``data`` mesh over all chips, batch arrays sharded on
axis 0, parameters/optimizer state replicated. Under ``jit`` with these
shardings, XLA compiles the gradient reductions to all-reduces over ICI —
no hand-written communication layer (the "communication backend" IS this
file plus the sharding annotations).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh``;
the same code then spans slices, with DCN crossings handled by the
runtime.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis: str = DATA_AXIS,
    batch_size: Optional[int] = None,
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices.

    When ``batch_size`` is given, the mesh is trimmed to the largest
    device count that divides it (a batch of 4 on 8 devices uses 4).
    """
    devices = list(devices) if devices is not None else jax.devices()
    if batch_size is not None:
        import math

        n = math.gcd(batch_size, len(devices))
        devices = devices[:n]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(
    mesh: Mesh, axis: str = DATA_AXIS, dim: int = 0
) -> NamedSharding:
    """Shard ``dim`` (the batch dim) over the data axis; other dims
    replicated. dim=1 serves stacked multi-step batches (leading k)."""
    return NamedSharding(mesh, P(*([None] * dim), axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = DATA_AXIS, dim: int = 0) -> Any:
    """Place every array in a batch pytree with the batch dim sharded.

    Single-process: a plain device_put with the sharded layout.
    Multi-host (jax.process_count() > 1): each process holds its LOCAL
    slice of the global batch (from its sharded input pipeline); the
    per-process arrays are assembled into one global jax.Array whose
    batch dim spans all hosts' devices — the global batch size is
    per-host batch x process count.
    """
    sh = batch_sharding(mesh, axis, dim)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(sh, np.asarray(a)),
            batch,
        )
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params / train state) over the mesh.

    Multi-host: every process holds the same host-local values (same seed
    / same restored checkpoint); they are assembled into global
    replicated arrays spanning all hosts' devices.
    """
    sh = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(sh, np.asarray(a)),
            tree,
        )
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


def maybe_initialize_distributed() -> bool:
    """Initialize the multi-host JAX runtime when launched under a
    multi-process coordinator (env-configured). Safe no-op single-host.

    Returns True when running multi-host after the call.
    """
    import os

    if jax.process_count() > 1:
        return True
    if any(
        k in os.environ
        for k in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
    ):
        try:
            jax.distributed.initialize()
        except Exception as e:  # already initialized or misconfigured
            print(f"[parallel] distributed init skipped: {e}")
    return jax.process_count() > 1
