"""Pallas TPU kernel for the bidirectional silhouette chamfer distance.

The mesh-reprojection loss needs, per image, a (P silhouette pixels) x
(V projected vertices) distance field reduced two ways:
  * gt->pred: L1 distance to the L2-nearest vertex, summed over pixels;
  * pred->gt: L2 distance to the nearest pixel, summed over vertices.
(ref src/ops.py:60-137 computes the full matrix per image in a Python
batch loop.)

This kernel streams the field tile-by-tile in VMEM (flash-attention-style:
SURVEY.md §5 identifies the P x V axes as the real blockwise-computation
opportunity in this model):

  grid = (batch, P/C); each step materializes one (C, V) tile of exact
  squared distances on the VPU (no expanded-form cancellation), folds it
  into a running per-vertex minimum (pred->gt) that lives in the output
  ref across grid steps, and accumulates the masked per-pixel L1-of-
  nearest via an index-carrying two-pass min (no gather/argmin needed on
  TPU). HBM traffic is O(P + V) per image instead of O(P*V).

Exact distance ties resolve first-index-wins (an iota-carrying masked
min), matching the reference's tf.argmin selections (src/ops.py:64-71).

Cost is proportional to the TRUE silhouette size, not the padded budget:
a scalar-prefetched per-image "last active pixel" count gates each grid
step, so tiles past the final valid pixel skip their (C, V) compute
entirely (their mask is all zero — skipping is exactly a no-op). This is
what makes a generous ``max_silhouette_points`` (16384, covering every
real silhouette — see QUALITY.md) nearly free: the kernel only pays for
pixels that exist.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BIG = 1e30
IBIG = 2**30  # integer sentinel for index-carrying mins (plain int so
# kernels don't capture a traced constant)


def _last_active(gt_mask: jax.Array) -> jax.Array:
    """(N,) int32 index one past the last valid pixel per image (0 when
    empty). Correct for ARBITRARY masks — for the production prefix masks
    (data/augment.extract_silhouette packs valid pixels first) this is
    simply the pixel count."""
    p = gt_mask.shape[1]
    any_valid = jnp.any(gt_mask > 0, axis=1)
    last = p - jnp.argmax(gt_mask[:, ::-1] > 0, axis=1)
    return jnp.where(any_valid, last, 0).astype(jnp.int32)


def _kernel(count_ref, gt_ref, mask_ref, pred_ref, l1_ref, vmin_ref, *, c):
    """Every intermediate is kept 2-D: Mosaic's vector layouts want
    (sublane, lane) shapes — 1-D slices/reductions hit unsupported
    relayouts. The input layouts are chosen so both broadcast operands
    come out in the right orientation without any transpose:
      gt   (1, C, 2) block -> gx = [:, 0:1] is (C, 1)
      pred (1, 2, V) block -> px = [0:1, :] is (1, V)
      mask (1, C, 1) block -> (C, 1)
    count_ref: scalar-prefetched (N,) last-active-pixel counts; tiles at
    or past the count carry only masked-out pixels and are skipped
    (pt == 0 always runs: it initializes the accumulators).
    """
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    pt = pl.program_id(1)

    @pl.when(jnp.logical_or(pt == 0, pt * c < count_ref[b]))
    def _active():
        gx = gt_ref[0, :, 0:1]  # (C, 1)
        gy = gt_ref[0, :, 1:2]
        px = pred_ref[0, 0:1, :]  # (1, V)
        py = pred_ref[0, 1:2, :]
        mask = mask_ref[0, :, :]  # (C, 1)

        dx = gx - px  # (C, V)
        dy = gy - py
        d = dx * dx + dy * dy

        # --- pred -> gt: running per-vertex min over masked pixels ------
        d_row_masked = jnp.where(mask > 0, d, BIG)
        tile_min = jnp.min(d_row_masked, axis=0, keepdims=True)  # (1, V)

        @pl.when(pt == 0)
        def _():
            vmin_ref[0, :, :] = tile_min

        @pl.when(pt > 0)
        def _():
            vmin_ref[0, :, :] = jnp.minimum(vmin_ref[0, :, :], tile_min)

        # --- gt -> pred: L1 of the (first) L2-nearest vertex, masked sum
        # (iotas must be integer for Mosaic's tpu.iota; IBIG is the int
        # sentinel playing BIG's role in the index-carrying min.)
        dmin = jnp.min(d, axis=1, keepdims=True)  # (C, 1)
        iv = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)  # (C, V)
        idx_near = jnp.min(
            jnp.where(d <= dmin, iv, IBIG), axis=1, keepdims=True
        )  # (C, 1) first tied vertex index
        l1 = jnp.abs(dx) + jnp.abs(dy)
        l1_near = jnp.min(
            jnp.where(iv == idx_near, l1, BIG), axis=1, keepdims=True
        )  # (C, 1)
        tile_l1 = jnp.sum(l1_near * mask)  # full 2-D -> scalar reduce

        # Scalar accumulation as a broadcast lane-vector store (scalar
        # VMEM stores are rejected; sub-(8,128) 2-D output blocks as
        # well, hence the (1, 1, 128) accumulator row).
        @pl.when(pt == 0)
        def _():
            l1_ref[0, :, :] = jnp.full((1, 128), tile_l1, dtype=jnp.float32)

        @pl.when(pt > 0)
        def _():
            l1_ref[0, :, :] = l1_ref[0, :, :] + tile_l1


def _chamfer_forward(
    gt_points: jax.Array,  # (N, P, 2)
    gt_mask: jax.Array,  # (N, P)
    pred_points: jax.Array,  # (N, V, 2)
    chunk_size: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """(N,) unnormalized bidirectional chamfer distances (see
    ops.losses.chamfer_loss for semantics; this is the TPU fast path)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, p, _ = gt_points.shape
    v = pred_points.shape[1]
    f32 = jnp.float32

    c = min(chunk_size, max(8, p))
    c = ((c + 7) // 8) * 8  # sublane-aligned pixel tiles
    pad_p = (-p) % c
    vp = ((v + 127) // 128) * 128

    # Layouts chosen for transpose-free 2-D broadcasting in the kernel:
    # gt natural (N, P, 2); mask (N, P, 1); pred transposed (N, 2, V).
    gt_p = jnp.pad(gt_points.astype(f32), ((0, 0), (0, pad_p), (0, 0)))
    mask_p = jnp.pad(gt_mask.astype(f32), ((0, 0), (0, pad_p)))[:, :, None]
    pred_t = jnp.transpose(pred_points.astype(f32), (0, 2, 1))  # (N, 2, V)
    # padding vertices sit at BIG distance so they never win any minimum
    pred_t = jnp.pad(pred_t, ((0, 0), (0, 0), (0, vp - v)), constant_values=1e15)

    num_pt = gt_p.shape[1] // c
    grid = (n, num_pt)
    counts = _last_active(gt_mask)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, c, 2), lambda b, t, counts: (b, t, 0)),
            pl.BlockSpec((1, c, 1), lambda b, t, counts: (b, t, 0)),
            pl.BlockSpec((1, 2, vp), lambda b, t, counts: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 128), lambda b, t, counts: (b, 0, 0)),
            pl.BlockSpec((1, 1, vp), lambda b, t, counts: (b, 0, 0)),
        ],
    )
    l1_sum, vert_min = pl.pallas_call(
        functools.partial(_kernel, c=c),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, 1, 128), f32),
            jax.ShapeDtypeStruct((n, 1, vp), f32),
        ],
        interpret=interpret,
    )(counts, gt_p, mask_p, pred_t)

    has_gt = jnp.sum(gt_mask, axis=-1) > 0
    vmin = vert_min[:, 0, :v]
    l2 = jnp.sum(jnp.sqrt(jnp.maximum(vmin, 0.0)) * (vmin < BIG / 2), axis=-1)
    l1 = l1_sum[:, 0, 0]
    return jnp.where(has_gt, l1 + l2, 0.0)


def _bwd_kernel(
    count_ref, gt_ref, mask_ref, pred_ref,
    l1gx_ref, l1gy_ref, vmin_ref, bx_ref, by_ref,
    l1v_ref=None, *, c,
):
    """Backward-pass streaming kernel (same tiling/layouts as _kernel).

    Per pixel tile, accumulates the gt->pred L1 gradient columns
    (first-index nearest assignment x -sign(diff)) and tracks the running
    per-vertex nearest-pixel coordinates for the pred->gt L2 gradient —
    all 2-D, gather-free. Tiles past the last active pixel are skipped
    (count_ref, same contract as _kernel).

    With ``l1v_ref`` (the train-path variant) it ALSO accumulates the
    forward gt->pred L1 value from the same distance tile, so training
    needs a single P x V pass for loss + gradient instead of a forward
    pass plus a recomputing backward pass.
    """
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    pt = pl.program_id(1)

    @pl.when(jnp.logical_or(pt == 0, pt * c < count_ref[b]))
    def _active():
        gx = gt_ref[0, :, 0:1]  # (C, 1)
        gy = gt_ref[0, :, 1:2]
        px = pred_ref[0, 0:1, :]  # (1, V)
        py = pred_ref[0, 1:2, :]
        mask = mask_ref[0, :, :]  # (C, 1)

        dx = gx - px  # (C, V) = g - p
        dy = gy - py
        d = dx * dx + dy * dy

        # gt -> pred: first-index nearest assignment, column-accumulated.
        dmin = jnp.min(d, axis=1, keepdims=True)  # (C, 1)
        iv = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)  # (C, V)
        idx_near = jnp.min(jnp.where(d <= dmin, iv, IBIG), axis=1, keepdims=True)
        a = (iv == idx_near).astype(jnp.float32) * mask  # (C, V) one-hot rows
        agx = a * jnp.sign(dx)  # (C, V), nonzero only at selected vertices
        agy = a * jnp.sign(dy)
        tile_gx = -jnp.sum(agx, axis=0, keepdims=True)  # (1, V)
        tile_gy = -jnp.sum(agy, axis=0, keepdims=True)

        # pred -> gt: running masked min + first-pixel coordinate selection
        # (across tiles the strict `<` take keeps the earlier tile's pixel).
        d_masked = jnp.where(mask > 0, d, BIG)
        tmin = jnp.min(d_masked, axis=0, keepdims=True)  # (1, V)
        is_min = d_masked <= tmin
        ir = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)  # (C, V)
        row_near = jnp.min(jnp.where(is_min, ir, IBIG), axis=0, keepdims=True)
        sel = ir == row_near  # one row per column
        tx = jnp.min(jnp.where(sel, gx, BIG), axis=0, keepdims=True)
        ty = jnp.min(jnp.where(sel, gy, BIG), axis=0, keepdims=True)

        if l1v_ref is not None:
            # Forward value: masked sum of L1-of-the-L2-nearest. The one-hot
            # sign products above double as the value accumulators —
            # sum(a*sign(dx)*dx) = sum over valid pixels of |dx| at the
            # selected vertex — saving the abs/where/min re-selection pass
            # (identical semantics to _kernel's gt->pred path).
            tile_l1 = jnp.sum(agx * dx) + jnp.sum(agy * dy)

        @pl.when(pt == 0)
        def _():
            l1gx_ref[0, :, :] = tile_gx
            l1gy_ref[0, :, :] = tile_gy
            vmin_ref[0, :, :] = tmin
            bx_ref[0, :, :] = tx
            by_ref[0, :, :] = ty
            if l1v_ref is not None:
                l1v_ref[0, :, :] = jnp.full((1, 128), tile_l1, dtype=jnp.float32)

        @pl.when(pt > 0)
        def _():
            l1gx_ref[0, :, :] = l1gx_ref[0, :, :] + tile_gx
            l1gy_ref[0, :, :] = l1gy_ref[0, :, :] + tile_gy
            take = tmin < vmin_ref[0, :, :]
            bx_ref[0, :, :] = jnp.where(take, tx, bx_ref[0, :, :])
            by_ref[0, :, :] = jnp.where(take, ty, by_ref[0, :, :])
            vmin_ref[0, :, :] = jnp.minimum(vmin_ref[0, :, :], tmin)
            if l1v_ref is not None:
                l1v_ref[0, :, :] = l1v_ref[0, :, :] + tile_l1


def _run_bwd_kernel(
    gt_points, gt_mask, pred_points, chunk_size, interpret, with_value: bool
):
    """Shared pallas_call for the backward / fused-train kernels. Returns
    (l1_grad (N,V,2), l2_grad (N,V,2), has_gt (N,), vmin (N,V),
    l1_value (N,) or None)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, p, _ = gt_points.shape
    v = pred_points.shape[1]
    f32 = jnp.float32

    c = min(chunk_size, max(8, p))
    c = ((c + 7) // 8) * 8
    pad_p = (-p) % c
    vp = ((v + 127) // 128) * 128

    gt_p = jnp.pad(gt_points.astype(f32), ((0, 0), (0, pad_p), (0, 0)))
    mask_p = jnp.pad(gt_mask.astype(f32), ((0, 0), (0, pad_p)))[:, :, None]
    pred_t = jnp.transpose(pred_points.astype(f32), (0, 2, 1))
    pred_t = jnp.pad(pred_t, ((0, 0), (0, 0), (0, vp - v)), constant_values=1e15)

    grid = (n, gt_p.shape[1] // c)
    counts = _last_active(gt_mask)
    row_spec = pl.BlockSpec((1, 1, vp), lambda b, t, counts: (b, 0, 0))
    out_specs = [row_spec] * 5
    out_shape = [jax.ShapeDtypeStruct((n, 1, vp), f32)] * 5
    if with_value:
        out_specs.append(
            pl.BlockSpec((1, 1, 128), lambda b, t, counts: (b, 0, 0))
        )
        out_shape.append(jax.ShapeDtypeStruct((n, 1, 128), f32))
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
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, c=c),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(counts, gt_p, mask_p, pred_t)
    l1gx, l1gy, vmin, bx, by = outs[:5]

    l1_grad = jnp.stack([l1gx[:, 0, :v], l1gy[:, 0, :v]], axis=-1)  # (N, V, 2)
    best_xy = jnp.stack([bx[:, 0, :v], by[:, 0, :v]], axis=-1)
    vmin = vmin[:, 0, :v]

    delta = pred_points - best_xy
    norm = jnp.sqrt(jnp.sum(delta * delta, axis=-1, keepdims=True))
    l2_grad = jnp.where(norm > 1e-12, delta / jnp.maximum(norm, 1e-12), 0.0)
    l2_grad = jnp.where((vmin < BIG / 2)[..., None], l2_grad, 0.0)

    has_gt = (jnp.sum(gt_mask, axis=-1) > 0).astype(jnp.float32)
    l1_value = outs[5][:, 0, 0] if with_value else None
    return l1_grad, l2_grad, has_gt, vmin, l1_value


def _chamfer_grad_pred_pallas(
    gt_points, gt_mask, pred_points, cotangent, chunk_size=128, interpret=False
):
    """Pallas-accelerated analytic gradient (see _chamfer_grad_pred for the
    reference semantics; both match XLA autodiff up to tie handling)."""
    l1_grad, l2_grad, has_gt, _, _ = _run_bwd_kernel(
        gt_points, gt_mask, pred_points, chunk_size, interpret, with_value=False
    )
    scale = (cotangent * has_gt)[:, None, None]
    return scale * (l1_grad + l2_grad)


def _chamfer_value_and_grad_pallas(
    gt_points, gt_mask, pred_points, chunk_size, interpret
):
    """ONE streaming P x V pass computing the loss value AND the unscaled
    d(loss)/d(pred) — the training path (custom-VJP fwd), replacing
    forward kernel + recomputing backward kernel (~1.8x on the train-time
    chamfer cost; PERF.md "Pallas chamfer kernel")."""
    l1_grad, l2_grad, has_gt, vmin, l1_value = _run_bwd_kernel(
        gt_points, gt_mask, pred_points, chunk_size, interpret, with_value=True
    )
    l2_value = jnp.sum(jnp.sqrt(jnp.maximum(vmin, 0.0)) * (vmin < BIG / 2), axis=-1)
    value = has_gt * (l1_value + l2_value)
    grad_unscaled = has_gt[:, None, None] * (l1_grad + l2_grad)
    return value, grad_unscaled


def _chamfer_grad_pred(gt_points, gt_mask, pred_points, cotangent, chunk_size=128):
    """Analytic d(chamfer)/d(pred_points), chunked over pixels.

    Matches autodiff of the XLA implementation: gradient flows through the
    selected distances, not the (piecewise-constant) selections:
      * pred->gt: unit vector from nearest pixel to each vertex;
      * gt->pred: -sign(g - p) scattered onto each pixel's nearest
        vertex (exact ties resolve first-index-wins, as everywhere).
    """
    n, p, _ = gt_points.shape
    v = pred_points.shape[1]
    big = jnp.asarray(BIG, jnp.float32)

    pad = (-p) % chunk_size
    gt_p = jnp.pad(gt_points, ((0, 0), (0, pad), (0, 0)))
    mask_p = jnp.pad(gt_mask, ((0, 0), (0, pad)))
    num_chunks = gt_p.shape[1] // chunk_size
    gt_c = gt_p.reshape(n, num_chunks, chunk_size, 2).transpose(1, 0, 2, 3)
    mask_c = mask_p.reshape(n, num_chunks, chunk_size).transpose(1, 0, 2)

    def body(carry, chunk):
        vmin, best_xy, l1_grad = carry
        pts, mask = chunk  # (N, C, 2), (N, C)
        diff = pts[:, :, None, :] - pred_points[:, None, :, :]  # (N, C, V, 2)
        d = jnp.sum(diff * diff, axis=-1)  # (N, C, V)
        # gt->pred: assignment to the FIRST nearest vertex (index-carrying
        # min, matching the reference's argmin under exact ties)
        from .losses import _first_min_mask

        dmin_pix = jnp.min(d, axis=2, keepdims=True)
        assign = _first_min_mask(d <= dmin_pix, axis=2).astype(jnp.float32)
        contrib = -jnp.sign(diff) * (assign * mask[:, :, None])[..., None]
        l1_grad = l1_grad + jnp.sum(contrib, axis=1)  # (N, V, 2)
        # pred->gt: running nearest pixel per vertex. Coordinate selection
        # uses the masked-min trick instead of argmin + take_along_axis
        # (TPU lowers such gathers to serialized dynamic slices); ties take
        # the first pixel index.
        d_masked = jnp.where(mask[:, :, None] > 0, d, big)
        tile_min = jnp.min(d_masked, axis=1)  # (N, V)
        is_min = d_masked <= tile_min[:, None, :]
        sel = _first_min_mask(is_min, axis=1)
        tile_x = jnp.min(jnp.where(sel, pts[:, :, 0:1], big), axis=1)
        tile_y = jnp.min(jnp.where(sel, pts[:, :, 1:2], big), axis=1)
        tile_xy = jnp.stack([tile_x, tile_y], axis=-1)
        take = tile_min < vmin
        best_xy = jnp.where(take[..., None], tile_xy, best_xy)
        vmin = jnp.where(take, tile_min, vmin)
        return (vmin, best_xy, l1_grad), None

    init = (
        jnp.full((n, v), big),
        jnp.zeros((n, v, 2), jnp.float32),
        jnp.zeros((n, v, 2), jnp.float32),
    )
    (vmin, best_xy, l1_grad), _ = jax.lax.scan(body, init, (gt_c, mask_c))

    delta = pred_points - best_xy
    norm = jnp.linalg.norm(delta, axis=-1, keepdims=True)
    l2_grad = jnp.where(norm > 1e-12, delta / jnp.maximum(norm, 1e-12), 0.0)
    l2_grad = jnp.where((vmin < BIG / 2)[..., None], l2_grad, 0.0)

    has_gt = (jnp.sum(gt_mask, axis=-1) > 0).astype(jnp.float32)
    scale = (cotangent * has_gt)[:, None, None]
    return scale * (l1_grad + l2_grad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def chamfer_pallas(gt_points, gt_mask, pred_points, chunk_size=128, interpret=False):
    return _chamfer_forward(gt_points, gt_mask, pred_points, chunk_size, interpret)


def _chamfer_fwd(gt_points, gt_mask, pred_points, chunk_size, interpret):
    # Single fused pass for value + gradient (the backward kernel keeps
    # more (C, V) intermediates live than the forward; halve the pixel
    # tile to fit VMEM). The gradient rides along as the VJP residual,
    # so _chamfer_bwd is just a cotangent scale — no second P x V pass.
    out, grad_unscaled = _chamfer_value_and_grad_pallas(
        gt_points, gt_mask, pred_points,
        chunk_size=max(8, chunk_size // 2), interpret=interpret,
    )
    return out, (grad_unscaled, gt_points.shape, gt_mask.shape)


def _chamfer_bwd(chunk_size, interpret, residuals, cotangent):
    grad_unscaled, gt_shape, mask_shape = residuals
    grad_pred = cotangent[:, None, None] * grad_unscaled
    return (
        jnp.zeros(gt_shape, jnp.float32),
        jnp.zeros(mask_shape, jnp.float32),
        grad_pred,
    )


chamfer_pallas.defvjp(_chamfer_fwd, _chamfer_bwd)
