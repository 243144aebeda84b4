"""On-device augmentation tests: invariants + pixel-level parity against
the reference's resize/pad/crop/flip pipeline."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from human_pose_estimation_tpu.data import augment


def _example(rng, h=57, w=63, canvas=128):
    img = np.zeros((canvas, canvas, 3), np.float32)
    img[:h, :w] = rng.rand(h, w, 3).astype(np.float32)
    seg = np.zeros((canvas, canvas, 1), np.float32)
    seg[:h, :w] = (rng.rand(h, w, 1) > 0.6).astype(np.float32)
    kp = np.zeros((3, 19), np.float32)
    kp[0] = rng.rand(19) * (w - 1)
    kp[1] = rng.rand(19) * (h - 1)
    kp[2] = (rng.rand(19) > 0.3).astype(np.float32)
    center = np.asarray([w // 2, h // 2], np.int32)
    return img, seg, kp, center, (h, w)


def _run_ours(img, seg, kp, center, hw, scale, trans, flip, out=64):
    cfg = augment.AugmentConfig(out_size=out, augment=True)
    n = 1
    crops, crop_segs, labels = jax.jit(
        lambda *a: augment.augment_batch(
            *a,
            rng=None,
            cfg=cfg,
            overrides=(
                jnp.asarray([trans], jnp.int32),
                jnp.asarray([scale], jnp.float32),
                jnp.asarray([flip], bool),
            ),
        )
    )(
        jnp.asarray(img[None]),
        jnp.asarray(seg[None]),
        jnp.asarray(np.asarray([hw], np.int32)),
        jnp.asarray(center[None]),
        jnp.asarray(kp[None]),
    )
    return np.asarray(crops[0]), np.asarray(crop_segs[0]), np.asarray(labels[0])


def _run_reference(img, seg, kp, center, hw, scale, trans, out=64):
    """Drive the reference image_preprocessing with pinned randomness
    (scale range collapsed, flip monkeypatched off)."""
    tf = pytest.importorskip("tensorflow")
    from src import data_loader as ref_dl
    from src.util import data_utils as ref_du

    h, w = hw
    loader = object.__new__(ref_dl.DataLoader)
    loader.output_size = out
    loader.trans_max = 0
    loader.scale_range = [scale, scale + 1e-7]
    loader.image_normalizing_fn = ref_du.rescale_image

    orig_flip = ref_du.random_flip
    orig_jc = ref_du.jitter_center
    ref_du.random_flip = lambda i, s, k: (i, s, k)
    ref_du.jitter_center = lambda c, t: c + np.asarray(trans, np.int32).reshape(2, 1)
    try:
        crop, crop_gt, label = loader.image_preprocessing(
            tf.constant(img[:h, :w]),
            tf.constant(seg[:h, :w]),
            tf.constant([h, w]),
            tf.constant(kp),
            tf.constant(center.reshape(2, 1)),
            tf.constant("x"),
        )
    finally:
        ref_du.random_flip = orig_flip
        ref_du.jitter_center = orig_jc
    return crop.numpy(), crop_gt.numpy(), label.numpy()


@pytest.mark.parametrize("scale", [1.0, 0.83, 1.19])
@pytest.mark.parametrize("trans", [(0, 0), (9, -7)])
def test_parity_vs_reference_no_flip(reference_src, rng, scale, trans):
    img, seg, kp, center, hw = _example(rng)
    ours = _run_ours(img, seg, kp, center, hw, scale, trans, flip=False)
    ref = _run_reference(img, seg, kp, center, hw, scale, trans)
    np.testing.assert_allclose(ours[0], ref[0], atol=2e-2)
    assert np.mean(np.abs(ours[0] - ref[0])) < 2e-3
    np.testing.assert_allclose(ours[1], ref[1], atol=5e-2)
    np.testing.assert_allclose(ours[2], ref[2], atol=2e-3)


def test_flip_parity_vs_reference(reference_src, rng):
    """Our flipped output == reference flip_image applied to the
    reference's unflipped crop."""
    tf = pytest.importorskip("tensorflow")
    from src.util import data_utils as ref_du

    img, seg, kp, center, hw = _example(rng)
    scale, trans = 1.07, (3, 4)
    ref_crop01, ref_seg, ref_label = _run_reference(img, seg, kp, center, hw, scale, trans)
    ours = _run_ours(img, seg, kp, center, hw, scale, trans, flip=True)

    # flip the reference crop in *pixel* space: x coords before normalize
    out = 64
    crop_kp = np.stack(
        [
            (ref_label[:, 0] / np.maximum(ref_label[:, 2], 1e-9) + 1) / 2 * out,
            (ref_label[:, 1] / np.maximum(ref_label[:, 2], 1e-9) + 1) / 2 * out,
            ref_label[:, 2],
        ]
    )
    # hidden kps have x=y=0 in normalized space -> reconstruct as center;
    # only compare visible ones below.
    f_img, f_seg, f_kp = ref_du.flip_image(
        tf.constant((ref_crop01 + 1) / 2), tf.constant(ref_seg), tf.constant(crop_kp)
    )
    f_img = f_img.numpy() * 2 - 1
    f_kp = f_kp.numpy()
    vis = f_kp[2] > 0
    np.testing.assert_allclose(ours[0], f_img, atol=2e-2)
    ours_x_pix = (ours[2][:, 0] + 1) / 2 * out
    ours_y_pix = (ours[2][:, 1] + 1) / 2 * out
    np.testing.assert_allclose(ours_x_pix[vis], f_kp[0][vis], atol=1e-2)
    np.testing.assert_allclose(ours_y_pix[vis], f_kp[1][vis], atol=1e-2)
    np.testing.assert_allclose(ours[2][:, 2], f_kp[2], atol=1e-6)


def test_extract_silhouette():
    seg = np.zeros((2, 16, 16, 1), np.float32)
    seg[0, 3, 5] = 1.0
    seg[0, 10, 2] = 1.0
    seg[1, :, :] = 1.0  # overflow case
    pts, mask = augment.extract_silhouette(jnp.asarray(seg), max_points=8)
    pts, mask = np.asarray(pts), np.asarray(mask)
    assert mask[0].sum() == 2
    got = {tuple(p) for p in pts[0][mask[0] > 0].astype(int)}
    assert got == {(5, 3), (2, 10)}  # (x, y)
    assert mask[1].sum() == 8  # truncated to cap
    ys = pts[1][:, 1]
    assert ys.max() - ys.min() > 4  # interleaving spreads rows


@pytest.mark.parametrize(
    "h,w",
    [
        (16, 16),  # packed single-sort path (h*w <= 2^16)
        (256, 256),  # packed path at its exact boundary (h*w == 2^16)
        (272, 260),  # two-operand-sort fallback (h*w > 2^16)
    ],
)
def test_extract_silhouette_matches_nonzero_oracle(rng, h, w):
    """Both compaction branches against the plain jnp.nonzero semantics
    the sort-based rewrite replaced: identical point SET when under the
    cap, a true subset spread across the figure when truncated, and
    exact zero padding. (Feeds the ragged tf.where(seg > 0) silhouette
    of ref src/trainer.py:443.)"""
    n = 3
    segs = np.zeros((n, h, w, 1), np.float32)
    # image 0: sparse random mask, under the cap
    m0 = rng.rand(h, w) > 0.999
    segs[0, ..., 0] = m0.astype(np.float32)
    # image 1: dense blob, over the cap
    segs[1, h // 4 : 3 * h // 4, w // 4 : 3 * w // 4, 0] = 1.0
    # image 2: empty
    max_points = 64
    pts, mask = augment.extract_silhouette(jnp.asarray(segs), max_points)
    pts, mask = np.asarray(pts), np.asarray(mask)

    for i in range(n):
        ys, xs = np.nonzero(segs[i, ..., 0] > 0)
        active = {(int(x), int(y)) for x, y in zip(xs, ys)}
        count = len(active)
        k = int(mask[i].sum())
        assert k == min(count, max_points)
        # mask is a prefix (valid rows first), padding exact zeros
        assert (mask[i][:k] == 1).all() and (mask[i][k:] == 0).all()
        assert (pts[i][k:] == 0).all()
        got = {tuple(p) for p in pts[i][:k].astype(int)}
        assert len(got) == k, "duplicate points emitted"
        if count <= max_points:
            assert got == active
        else:
            assert got <= active, "truncation emitted a non-silhouette pixel"
            # interleaving samples the whole blob, not its top rows
            got_ys = pts[i][:k, 1]
            assert got_ys.max() - got_ys.min() > (3 * h // 4 - h // 4) * 0.5


def test_extract_silhouette_threshold(rng):
    seg = np.zeros((1, 16, 16, 1), np.float32)
    seg[0, 2, 3] = 0.4
    seg[0, 5, 6] = 0.9
    pts, mask = augment.extract_silhouette(
        jnp.asarray(seg), max_points=4, threshold=0.5
    )
    pts, mask = np.asarray(pts), np.asarray(mask)
    assert mask[0].sum() == 1
    assert tuple(pts[0][0].astype(int)) == (6, 5)


def test_deterministic_eval_mode(rng):
    img, seg, kp, center, hw = _example(rng)
    cfg = augment.AugmentConfig(out_size=64, augment=False)
    args = (
        jnp.asarray(img[None]),
        jnp.asarray(seg[None]),
        jnp.asarray(np.asarray([hw], np.int32)),
        jnp.asarray(center[None]),
        jnp.asarray(kp[None]),
    )
    a = augment.augment_batch(*args, rng=None, cfg=cfg)
    b = augment.augment_batch(*args, rng=None, cfg=cfg)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    # center crop at scale 1: a visible keypoint maps to kp - (center-32)
    lab = np.asarray(a[2])
    vis = lab[:, :, 2][0] > 0
    expect_x = kp[0] - (center[0] - 32)
    got_x = (lab[0, :, 0] + 1) / 2 * 64
    np.testing.assert_allclose(got_x[vis], expect_x[vis], atol=1e-3)
