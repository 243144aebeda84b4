"""On-chip A/B: sort-based extract_silhouette vs the previous
vmap(jnp.nonzero(size=...)) compaction it replaced.

The silhouette extraction feeds the chamfer mesh loss (the ragged
``tf.where(seg > 0)`` of ref src/trainer.py:443, made XLA-static). The
round-3 rewrite compacts active pixels with ONE batched single-operand
sort (hash key and flat index packed into a uint32) instead of a
per-image nonzero gather; this bench measures both on the same inputs.

    python benchmarks/silhouette_bench.py --batch 64 --iters 50

Protocol per PERF.md "Measurement pitfalls": chained carries (call i+1's
input depends on call i's output), >=10 warmup calls, device_get fence,
one process on the chip.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from human_pose_estimation_tpu.utils.jax_cache import ensure_compilation_cache

ensure_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from human_pose_estimation_tpu.data.augment import extract_silhouette


def nonzero_extract(segs, max_points, threshold=0.0):
    """The previous implementation (pre round-3-end): strided permutation
    on the host + per-image jnp.nonzero(size=...) under vmap."""
    n, h, w = segs.shape[:3]
    m = segs.reshape(n, h * w) > threshold
    total = h * w
    stride = 9973 if total % 9973 else 101
    perm = np.asarray(
        (np.arange(total, dtype=np.int64) * stride) % total, np.int32
    )
    m_perm = m[:, perm]

    def one(mask1d):
        (idx_p,) = jnp.nonzero(mask1d, size=max_points, fill_value=0)
        count = jnp.sum(mask1d)
        valid = (
            jax.lax.broadcasted_iota(jnp.int32, (max_points, 1), 0)[:, 0]
            < count
        )
        flat = jnp.asarray(perm)[idx_p]
        ys = flat // w
        xs = flat % w
        pts = jnp.stack([xs, ys], axis=-1).astype(jnp.float32)
        return pts, valid.astype(jnp.float32)

    return jax.vmap(one)(m_perm)


def timeit(extract, segs, max_points, iters, warmup=10):
    @jax.jit
    def step(carry):
        segs, acc = carry
        pts, mask = extract(segs, max_points)
        # fold the outputs into a scalar the next call depends on, so
        # successive dispatches serialize on-device
        return segs, acc + jnp.sum(mask) + jnp.sum(pts[:, 0, :])

    carry = (segs, jnp.zeros((), jnp.float32))
    for _ in range(warmup):
        carry = step(carry)
    jax.device_get(carry[1])
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = step(carry)
    jax.device_get(carry[1])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--img", type=int, default=224)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    rows = []
    for h, w, label in (
        (args.img, args.img, "packed uint32 path"),
        (272, 260, "two-operand fallback"),
    ):
        # blob-ish masks around the measured real silhouette sizes
        # (synthetic rigged human at 256px: mean 4.1k / p99 9.2k px)
        segs = np.zeros((args.batch, h, w, 1), np.float32)
        for i in range(args.batch):
            cy, cx = rng.randint(h // 4, 3 * h // 4), rng.randint(
                w // 4, 3 * w // 4
            )
            r = rng.randint(25, 55)
            yy, xx = np.ogrid[:h, :w]
            segs[i, ..., 0] = (
                ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r
            ).astype(np.float32)
        jseg = jnp.asarray(segs)
        for max_points in (2048, 16384):
            ms_new = timeit(extract_silhouette, jseg, max_points, args.iters)
            ms_old = timeit(nonzero_extract, jseg, max_points, args.iters)
            rows.append(
                {
                    "seg": f"{h}x{w}",
                    "path": label,
                    "max_points": max_points,
                    "sort_ms": round(ms_new, 2),
                    "nonzero_ms": round(ms_old, 2),
                    "speedup": round(ms_old / ms_new, 1),
                }
            )
            print(json.dumps(rows[-1]))
    print(json.dumps({"batch": args.batch, "rows": rows}))


if __name__ == "__main__":
    main()
