"""On-device, batched image preprocessing / augmentation.

Capability parity with the reference's per-example CPU pipeline
(ref src/data_loader.py:160-213 image_preprocessing + src/util/
data_utils.py:144-238 jitter_center / jitter_scale / pad_image_edge /
random_flip / flip_image), redesigned for TPU:

The reference materializes a scale-jittered resize of the whole image,
edge-pads it by margin+trans_max+50, crops 224x224, and maybe flips — all
per example on the host. Here the entire chain collapses into ONE
separable bilinear resampling expressed as two dense matmuls per axis
(``W_y @ img @ W_x^T``): scale jitter, crop offset, edge-replicate
padding (coordinate clamping) and horizontal flip all fold into the
sampling weight matrices. Matmuls run on the MXU; there is no resized or
padded intermediate, no gather, and the whole batch augments as one
jit-compiled program.

Geometry notes (to match the reference's output exactly):
* resized size is ``floor(h * s)`` per axis and the keypoint factor is
  ``floor(h * s) / h`` (ref jitter_scale, data_utils.py:150-172);
* the 224-crop starts at ``scaled_center - 112`` in resized coords
  (pad + crop in the reference, data_loader.py:174-196);
* out-of-bounds reads edge-replicate (ref pad_image_edge) == clamping the
  resized integer coordinate before mapping back to source coords;
* bilinear sampling uses half-pixel centers like ``tf.image.resize``;
* flip remaps x to ``size - x - 1`` and swaps the L/R joints with the
  19-joint cocoplus table (ref flip_image, data_utils.py:221-238).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# L/R joint swap for horizontal flips, cocoplus 19-keypoint order
# (ref data_utils.py:234-236).
FLIP_SWAP_19 = (5, 4, 3, 2, 1, 0, 11, 10, 9, 8, 7, 6, 12, 13, 14, 16, 15, 18, 17)


class AugmentConfig(NamedTuple):
    out_size: int = 224
    trans_max: int = 20
    scale_min: float = 0.8
    scale_max: float = 1.23
    augment: bool = True  # False -> deterministic center crop at scale 1


def _axis_weights(
    in_size: jax.Array,  # scalar int32: true extent within the canvas
    canvas: int,
    out_size: int,
    scale: jax.Array,  # scalar float32
    start: jax.Array,  # scalar int32 crop start in resized coords
    flip: jax.Array,  # scalar bool
) -> jax.Array:
    """(out_size, canvas) bilinear sampling matrix for one axis."""
    f_in = in_size.astype(jnp.float32)
    new_size = jnp.floor(f_in * scale)  # int cast in the reference
    factor = new_size / f_in
    o = jax.lax.broadcasted_iota(jnp.int32, (out_size, 1), 0)[:, 0]
    o = jnp.where(flip, out_size - 1 - o, o)
    # integer coordinate in the resized image, edge-clamped (== edge pad)
    r = jnp.clip(start + o, 0, jnp.maximum(new_size.astype(jnp.int32) - 1, 0))
    # half-pixel-center source coordinate, clamped to the valid extent
    s = (r.astype(jnp.float32) + 0.5) / factor - 0.5
    s = jnp.clip(s, 0.0, f_in - 1.0)
    i0 = jnp.floor(s).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    frac = s - i0.astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (out_size, canvas), 1)
    w = jnp.where(cols == i0[:, None], 1.0 - frac[:, None], 0.0)
    w = w + jnp.where(cols == i1[:, None], frac[:, None], 0.0)
    # i0 == i1 (edge): both terms hit the same column summing to 1.
    return w


def _resample_one(img, wy, wx):
    """(H_out, W_out, C) = wy @ img @ wx^T via MXU matmuls."""
    tmp = jnp.einsum("oh,hwc->owc", wy, img, preferred_element_type=jnp.float32)
    return jnp.einsum("pw,owc->opc", wx, tmp, preferred_element_type=jnp.float32)


def augment_batch(
    images: jax.Array,  # (N, Hc, Wc, 3) uint8 or float in [0, 1]
    segs: jax.Array,  # (N, Hc, Wc, 1) same scale
    hw: jax.Array,  # (N, 2) int32 true [h, w] inside the canvas
    centers: jax.Array,  # (N, 2) int32 [cx, cy] person center
    keypoints: jax.Array,  # (N, 3, 19) rows [x, y, vis] (ref label layout)
    rng: Optional[jax.Array],
    cfg: AugmentConfig,
    overrides: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched preprocess: returns (crop [-1,1] (N,S,S,3), seg crop
    (N,S,S,1), labels (N,19,3) with kp normalized to [-1,1]).

    ``overrides=(trans (N,2) int, scales (N,), flips (N,) bool)`` pins the
    augmentation draws (tests / reproducibility)."""
    n, canvas_h, canvas_w, _ = images.shape
    out = cfg.out_size
    margin = out // 2
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    if segs.dtype == jnp.uint8:
        segs = segs.astype(jnp.float32) / 255.0

    if overrides is not None:
        trans, scales, flips = overrides
    elif cfg.augment:
        assert rng is not None
        r_trans, r_scale, r_flip = jax.random.split(rng, 3)
        # tf.random.uniform int is [min, max) (ref jitter_center).
        if cfg.trans_max > 0:
            trans = jax.random.randint(
                r_trans, (n, 2), -cfg.trans_max, cfg.trans_max
            )
        else:
            trans = jnp.zeros((n, 2), jnp.int32)
        scales = jax.random.uniform(
            r_scale, (n,), minval=cfg.scale_min, maxval=cfg.scale_max
        )
        flips = jax.random.uniform(r_flip, (n,)) < 0.5
    else:
        trans = jnp.zeros((n, 2), jnp.int32)
        scales = jnp.ones((n,))
        flips = jnp.zeros((n,), bool)

    center_j = centers + trans  # jittered center, original coords
    h = hw[:, 0]
    w = hw[:, 1]

    def scaled_center(c, extent, scale):
        # int(center * floor(extent*s)/extent) (ref jitter_scale :168-172)
        factor = jnp.floor(extent.astype(jnp.float32) * scale) / extent.astype(
            jnp.float32
        )
        return (c.astype(jnp.float32) * factor).astype(jnp.int32)

    cx = scaled_center(center_j[:, 0], w, scales)
    cy = scaled_center(center_j[:, 1], h, scales)
    start_x = cx - margin
    start_y = cy - margin

    def per_example(img, seg, h_i, w_i, sc, sy, sx, flip):
        wy = _axis_weights(h_i, canvas_h, out, sc, sy, jnp.asarray(False))
        wx = _axis_weights(w_i, canvas_w, out, sc, sx, flip)
        crop = _resample_one(img, wy, wx)
        crop_seg = _resample_one(seg, wy, wx)
        return crop, crop_seg

    crops, crop_segs = jax.vmap(per_example)(
        images, segs, h, w, scales, start_y, start_x, flips
    )

    # ---- keypoint transform (mirrors the crop math) ----------------------
    kp_xy = keypoints[:, :2, :]  # (N, 2, 19)
    vis = keypoints[:, 2, :]  # (N, 19)
    fx = jnp.floor(w.astype(jnp.float32) * scales) / w.astype(jnp.float32)
    fy = jnp.floor(h.astype(jnp.float32) * scales) / h.astype(jnp.float32)
    x = kp_xy[:, 0, :] * fx[:, None] - start_x[:, None].astype(jnp.float32)
    y = kp_xy[:, 1, :] * fy[:, None] - start_y[:, None].astype(jnp.float32)

    swap = jnp.asarray(FLIP_SWAP_19)
    x_f = jnp.asarray(out, jnp.float32) - x - 1.0
    x = jnp.where(flips[:, None], x_f[:, swap], x)
    y = jnp.where(flips[:, None], y[:, swap], y)
    vis = jnp.where(flips[:, None], vis[:, swap], vis)

    # normalize to [-1, 1], zeroing hidden keypoints (ref :200-207)
    vis = (vis > 0).astype(jnp.float32)
    label = jnp.stack(
        [
            (2.0 * (x / out) - 1.0) * vis,
            (2.0 * (y / out) - 1.0) * vis,
            vis,
        ],
        axis=-1,
    )  # (N, 19, 3)

    crops = crops * 2.0 - 1.0  # [0,1] -> [-1,1] (ref rescale_image)
    return crops, crop_segs, label


def extract_silhouette(
    segs: jax.Array, max_points: int, threshold: float = 0.0
) -> Tuple[jax.Array, jax.Array]:
    """Padded silhouette pixel sets from seg crops, XLA-static.

    Replaces the reference's ragged ``tf.where(seg > 0)``
    (ref src/trainer.py:443) with a fixed-size (max_points, 2) [x, y]
    list + validity mask per image. Rows are visited in an interleaved
    order so that truncation (when a silhouette has more than
    ``max_points`` pixels) samples the whole figure instead of its top.
    """
    n, h, w = segs.shape[:3]
    m = segs.reshape(n, h * w) > threshold
    total = h * w
    # Visit pixels in a strided order (stride coprime with h*w) so that
    # truncation at the cap samples the whole figure instead of its top
    # rows. Implemented gather-free: pixel f's visit position is
    # (f*stride) % total, computed arithmetically, and compaction is ONE
    # batched sort. When key and flat index both fit 16 bits (every crop
    # up to 256x256) they pack into a single uint32 so a SINGLE-operand
    # sort does the whole compaction — measured 26.9 -> 3.5 ms at
    # B64/P=2048 and 36.8 -> 3.5 ms at P=16384 vs the previous
    # vmap(jnp.nonzero(size=...)) (benchmarks/silhouette_bench.py,
    # chained+fenced protocol; PERF.md "Silhouette extraction"). Larger
    # images fall back to a two-operand (key, index) sort. int32-safe:
    # the stride is chosen so (total-1)*stride < 2^31.
    iota = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)  # flat f
    if total <= 1 << 16:
        # 16-bit multiplicative hash (odd constant -> bijective mod 2^16):
        # one multiply + AND, vs an integer `% total` which lowers to a
        # slow division sequence on the VPU.
        key = (iota * 40503) & 0xFFFF
        pack = (key.astype(jnp.uint32) << 16) | iota.astype(jnp.uint32)
        pack = jnp.where(m, pack, jnp.uint32(0xFFFFFFFF))
        sorted_f = (
            jax.lax.sort(pack, dimension=1)[:, :max_points]
            & jnp.uint32(0xFFFF)
        ).astype(jnp.int32)
    else:
        # Pick the largest prime stride that (a) is coprime with total
        # (primes: total % p != 0 suffices) and (b) keeps iota * stride
        # inside int32 before the mod. Larger strides interleave better.
        for stride in (8191, 4093, 2039, 1021, 509, 251, 127, 61, 31, 13,
                       7, 5, 3, 1):
            if total % stride and (total - 1) * stride < 2**31:
                break
        if stride == 1:  # only for ~2^30-pixel seg crops; never silently
            import warnings

            warnings.warn(
                f"extract_silhouette: {h}x{w} seg too large for an "
                "interleaved truncation stride; falling back to row order "
                "(truncation will bias toward top rows)",
                stacklevel=2,
            )
        # Sentinel above every real key: keys are < total <= 2^31 - 1.
        keys = jnp.where(m, (iota * stride) % total, jnp.int32(2**31 - 1))
        _, idx = jax.lax.sort((keys, iota), dimension=1, num_keys=1)
        sorted_f = idx[:, :max_points]
    counts = jnp.sum(m, axis=1)
    valid = iota[:, :max_points] < counts[:, None]
    flat = jnp.where(valid, sorted_f, 0)  # 0-padded
    ys = flat // w
    xs = flat % w
    pts = jnp.stack([xs, ys], axis=-1).astype(jnp.float32)
    return pts, valid.astype(jnp.float32)
