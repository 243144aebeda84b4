"""A/B harness for chamfer fused val+grad kernel micro-variants.

The production kernel (`ops/pallas_chamfer._bwd_kernel`) sits within ~2x
of its own ~30-wide-ops/pair VPU roofline (PERF.md "Step anatomy").
This bench measures semantically identical rewrites of the tile body
against the baseline, interleaved in one process (relay drift makes
cross-process comparisons meaningless — PERF.md "Measurement pitfalls").

Variants:
  base   — the production kernel (int32 index-carrying mins).
  f32idx — all index carriers / sentinels in f32 (exact for V < 2^24):
           Mosaic keeps the whole tile body in float vregs, testing
           whether int<->float mixed select/compare chains are part of
           the 2x gap.

Usage: python benchmarks/chamfer_variant_bench.py --batch 64 --pixels 2048
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/hpe_jax_cache")
)
from human_pose_estimation_tpu.utils.jax_cache import ensure_compilation_cache

ensure_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from human_pose_estimation_tpu.ops import pallas_chamfer as pc

FBIG = 1e30
FIBIG = float(2**30)


def _bwd_kernel_f32idx(
    count_ref, gt_ref, mask_ref, pred_ref,
    l1gx_ref, l1gy_ref, vmin_ref, bx_ref, by_ref, l1v_ref, *, c,
):
    """_bwd_kernel with every index carrier in f32 (exact: V, C < 2^24)."""
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    pt = pl.program_id(1)

    @pl.when(jnp.logical_or(pt == 0, pt * c < count_ref[b]))
    def _active():
        gx = gt_ref[0, :, 0:1]
        gy = gt_ref[0, :, 1:2]
        px = pred_ref[0, 0:1, :]
        py = pred_ref[0, 1:2, :]
        mask = mask_ref[0, :, :]

        dx = gx - px
        dy = gy - py
        d = dx * dx + dy * dy

        dmin = jnp.min(d, axis=1, keepdims=True)
        iv = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1).astype(jnp.float32)
        idx_near = jnp.min(jnp.where(d <= dmin, iv, FIBIG), axis=1, keepdims=True)
        a = (iv == idx_near).astype(jnp.float32) * mask
        agx = a * jnp.sign(dx)
        agy = a * jnp.sign(dy)
        tile_gx = -jnp.sum(agx, axis=0, keepdims=True)
        tile_gy = -jnp.sum(agy, axis=0, keepdims=True)

        d_masked = jnp.where(mask > 0, d, FBIG)
        tmin = jnp.min(d_masked, axis=0, keepdims=True)
        is_min = d_masked <= tmin
        ir = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0).astype(jnp.float32)
        row_near = jnp.min(jnp.where(is_min, ir, FIBIG), axis=0, keepdims=True)
        sel = ir == row_near
        tx = jnp.min(jnp.where(sel, gx, FBIG), axis=0, keepdims=True)
        ty = jnp.min(jnp.where(sel, gy, FBIG), axis=0, keepdims=True)

        tile_l1 = jnp.sum(agx * dx) + jnp.sum(agy * dy)

        @pl.when(pt == 0)
        def _():
            l1gx_ref[0, :, :] = tile_gx
            l1gy_ref[0, :, :] = tile_gy
            vmin_ref[0, :, :] = tmin
            bx_ref[0, :, :] = tx
            by_ref[0, :, :] = ty
            l1v_ref[0, :, :] = jnp.full((1, 128), tile_l1, dtype=jnp.float32)

        @pl.when(pt > 0)
        def _():
            l1gx_ref[0, :, :] = l1gx_ref[0, :, :] + tile_gx
            l1gy_ref[0, :, :] = l1gy_ref[0, :, :] + tile_gy
            take = tmin < vmin_ref[0, :, :]
            bx_ref[0, :, :] = jnp.where(take, tx, bx_ref[0, :, :])
            by_ref[0, :, :] = jnp.where(take, ty, by_ref[0, :, :])
            vmin_ref[0, :, :] = jnp.minimum(vmin_ref[0, :, :], tmin)
            l1v_ref[0, :, :] = l1v_ref[0, :, :] + tile_l1


def run_variant(kernel_fn, gt, mask, pred, chunk):
    """pallas_call plumbing identical to pc._run_bwd_kernel(with_value)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, p, _ = gt.shape
    v = pred.shape[1]
    f32 = jnp.float32
    c = min(chunk, max(8, p))
    c = ((c + 7) // 8) * 8
    pad_p = (-p) % c
    vp = ((v + 127) // 128) * 128

    gt_p = jnp.pad(gt.astype(f32), ((0, 0), (0, pad_p), (0, 0)))
    mask_p = jnp.pad(mask.astype(f32), ((0, 0), (0, pad_p)))[:, :, None]
    pred_t = jnp.transpose(pred.astype(f32), (0, 2, 1))
    pred_t = jnp.pad(pred_t, ((0, 0), (0, 0), (0, vp - v)), constant_values=1e15)

    grid = (n, gt_p.shape[1] // c)
    counts = pc._last_active(mask)
    row_spec = pl.BlockSpec((1, 1, vp), lambda b, t, counts: (b, 0, 0))
    out_specs = [row_spec] * 5 + [
        pl.BlockSpec((1, 1, 128), lambda b, t, counts: (b, 0, 0))
    ]
    out_shape = [jax.ShapeDtypeStruct((n, 1, vp), f32)] * 5 + [
        jax.ShapeDtypeStruct((n, 1, 128), f32)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, c, 2), lambda b, t, counts: (b, t, 0)),
            pl.BlockSpec((1, c, 1), lambda b, t, counts: (b, t, 0)),
            pl.BlockSpec((1, 2, vp), lambda b, t, counts: (b, 0, 0)),
        ],
        out_specs=out_specs,
    )
    return pl.pallas_call(
        functools.partial(kernel_fn, c=c),
        grid_spec=grid_spec,
        out_shape=out_shape,
    )(counts, gt_p, mask_p, pred_t)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--pixels", type=int, default=2048)
    ap.add_argument("--verts", type=int, default=6890)
    ap.add_argument(
        "--chunk", type=int, default=128,
        help="pixel tile size; 128 matches the production train path",
    )
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    gt = jnp.asarray(rng.rand(args.batch, args.pixels, 2).astype(np.float32) * 224)
    mask = jnp.ones((args.batch, args.pixels), np.float32)
    pred = jnp.asarray(
        rng.rand(args.batch, args.verts, 2).astype(np.float32) * 224
    )

    variants = {
        "base": functools.partial(run_variant, pc._bwd_kernel, chunk=args.chunk),
        "f32idx": functools.partial(
            run_variant, _bwd_kernel_f32idx, chunk=args.chunk
        ),
    }
    jitted = {
        name: jax.jit(lambda g, m, p, fn=fn: fn(g, m, p))
        for name, fn in variants.items()
    }

    # Correctness: variants must agree exactly.
    outs = {n: jax.device_get(f(gt, mask, pred)) for n, f in jitted.items()}
    for i in range(6):
        np.testing.assert_array_equal(outs["base"][i], outs["f32idx"][i])
    print("variant outputs exactly equal: ok")

    for name, f in jitted.items():  # compile+warm
        for _ in range(8):
            r = f(gt, mask, pred)
        jax.block_until_ready(r)

    results = {n: [] for n in jitted}
    names = list(jitted)
    for rep in range(args.reps):
        # alternate variant order across reps so neither systematically
        # absorbs residual warm-cache effects
        for name in names if rep % 2 == 0 else reversed(names):
            f = jitted[name]
            jax.block_until_ready(f(gt, mask, pred))  # settle before timing
            t0 = time.perf_counter()
            for _ in range(args.iters):
                r = f(gt, mask, pred)
            jax.block_until_ready(r)
            dt = (time.perf_counter() - t0) / args.iters * 1e3
            results[name].append(dt)
    for name, ms in results.items():
        print(f"{name}: {[round(x, 2) for x in ms]} ms  best {min(ms):.2f}")


if __name__ == "__main__":
    main()
