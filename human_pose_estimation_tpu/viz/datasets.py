"""Dataset sanity visualizers.

Capability parity with ref src/visualizations/vis_2d_datasets.py (grids of
image / keypoints / segmentation batches) and draw_smpls.py (renders of
mocap SMPL meshes from multiple camera angles). Used as visual-inspection
harnesses for the data pipeline (SURVEY.md §4).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def show_image_batch(
    batch,  # GenBatch
    n: Optional[int] = None,
    out_path: Optional[str] = None,
):
    """Grid of (image + keypoints, segmentation-points overlay) per example
    (ref vis_2d_datasets.py:28-58). Saves to out_path or returns the
    matplotlib figure."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    images = np.asarray(batch.images)
    kps = np.asarray(batch.kp2d)
    pts = np.asarray(batch.seg_points)
    mask = np.asarray(batch.seg_mask)
    n = n or images.shape[0]
    size = images.shape[1]

    fig, axes = plt.subplots(n, 2, figsize=(6, 3 * n), squeeze=False)
    for i in range(n):
        img01 = (images[i] + 1) * 0.5
        axes[i][0].imshow(np.clip(img01, 0, 1))
        vis = kps[i, :, 2] > 0
        xs = (kps[i, vis, 0] + 1) * 0.5 * size
        ys = (kps[i, vis, 1] + 1) * 0.5 * size
        axes[i][0].scatter(xs, ys, c="r", s=8)
        axes[i][0].set_title("image + keypoints")
        axes[i][1].imshow(np.clip(img01, 0, 1))
        m = mask[i] > 0
        axes[i][1].scatter(pts[i, m, 0], pts[i, m, 1], c="lime", s=1)
        axes[i][1].set_title("silhouette points")
        for ax in axes[i]:
            ax.axis("off")
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path)
        plt.close(fig)
        return out_path
    return fig


def draw_smpl_meshes(
    smpl,
    poses: np.ndarray,  # (N, 72)
    shapes: np.ndarray,  # (N, 10)
    angles: Sequence[float] = (0.0, 60.0, -60.0, 180.0),
    img_size: int = 256,
    out_path: Optional[str] = None,
):
    """Render SMPL meshes for mocap samples from several yaw angles
    (ref draw_smpls.py:26-77)."""
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..core.smpl import smpl_forward
    from .renderer import SMPLRenderer

    out = smpl_forward(smpl, jnp.asarray(shapes), jnp.asarray(poses))
    verts = np.asarray(out.verts)
    faces = smpl.faces if smpl.faces is not None else np.zeros((0, 3), np.int64)
    renderer = SMPLRenderer(img_size=img_size, faces=faces)

    n = verts.shape[0]
    fig, axes = plt.subplots(n, len(angles), figsize=(3 * len(angles), 3 * n),
                             squeeze=False)
    for i in range(n):
        v = verts[i] + np.array([0.0, 0.0, 2.5])  # push in front of camera
        for j, ang in enumerate(angles):
            img = renderer.rotated(v, ang, axis="y") if ang else renderer(v)
            axes[i][j].imshow(img)
            axes[i][j].set_title(f"{ang:.0f}°")
            axes[i][j].axis("off")
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path)
        plt.close(fig)
        return out_path
    return fig
