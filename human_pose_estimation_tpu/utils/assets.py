"""Synthetic SMPL-shaped assets for tests, demos, and benchmarks.

The real SMPL model is licensed and must be downloaded by the user
(ref README.md:24-45 directs users to the SMPL site); nothing in this repo
ships the actual body model. These generators produce assets with the
exact shapes/dtypes of the real thing — plus a miniature variant for fast
unit tests — so every code path (including the reference-pickle loader)
can be exercised hermetically.
"""
from __future__ import annotations

import pickle

import numpy as np
import scipy.sparse as sp

from ..core.smpl import SMPL_PARENTS, SMPLModel


def synthetic_model(
    num_verts: int = 6890, seed: int = 0, as_jax: bool = True
) -> SMPLModel:
    """Deterministic random SMPL-shaped asset.

    The kinematic tree is the true (public) SMPL topology; all learned
    tensors are small random numbers so forward outputs stay O(1).
    """
    rng = np.random.RandomState(seed)
    v = num_verts
    v_template = rng.uniform(-1.0, 1.0, size=(v, 3)).astype(np.float32)
    shapedirs = (0.03 * rng.randn(10, v * 3)).astype(np.float32)
    posedirs = (0.01 * rng.randn(207, v * 3)).astype(np.float32)

    def _regressor(rows):
        # Each regressed point is a convex combination of ~8 vertices.
        reg = np.zeros((v, rows), np.float32)
        for j in range(rows):
            idx = rng.choice(v, size=min(8, v), replace=False)
            w = rng.uniform(0.1, 1.0, size=idx.shape[0])
            reg[idx, j] = (w / w.sum()).astype(np.float32)
        return reg

    j_regressor = _regressor(24)
    joint_regressor = _regressor(19)
    # LBS weights: soft assignment to the 2 nearest joints of a random
    # rest skeleton, normalized.
    rest_joints = v_template.T @ j_regressor  # (3, 24)
    d2 = ((v_template[:, :, None] - rest_joints[None]) ** 2).sum(1)  # (v, 24)
    w = np.exp(-d2 / (0.5 + d2.mean()))
    lbs_weights = (w / w.sum(axis=1, keepdims=True)).astype(np.float32)

    faces = None
    if v >= 3:
        # Arbitrary but deterministic triangle soup for renderer tests.
        faces = rng.choice(v, size=(max(4, v // 2), 3)).astype(np.int32)

    model = SMPLModel(
        v_template=v_template,
        shapedirs=shapedirs,
        posedirs=posedirs,
        j_regressor=j_regressor,
        lbs_weights=lbs_weights,
        joint_regressor=joint_regressor,
        parents=SMPL_PARENTS,
        faces=faces,
    )
    if as_jax:
        import jax.numpy as jnp

        model = model.replace(
            **{
                f: jnp.asarray(getattr(model, f))
                for f in (
                    "v_template",
                    "shapedirs",
                    "posedirs",
                    "j_regressor",
                    "lbs_weights",
                    "joint_regressor",
                )
            }
        )
    return model


def write_reference_pickle(model: SMPLModel, path: str) -> None:
    """Write a model in the official SMPL pickle layout.

    Matches the field shapes the reference loader consumes
    (ref src/tf_smpl/batch_smpl.py:31-79): shapedirs (V,3,10), posedirs
    (V,3,207), sparse J_regressor (24,V) and cocoplus_regressor (19,V).
    Used to hermetically exercise the pickle loader and TF-parity tests.
    """
    v = int(np.asarray(model.v_template).shape[0])
    kintree = np.zeros((2, 24), dtype=np.uint32)
    kintree[0] = np.asarray(model.parents, dtype=np.uint32)
    kintree[0, 0] = np.uint32(0xFFFFFFFF)  # root marker, as in real assets
    kintree[1] = np.arange(24, dtype=np.uint32)
    dd = {
        "v_template": np.asarray(model.v_template, np.float64),
        "shapedirs": np.asarray(model.shapedirs).T.reshape(v, 3, 10).astype(np.float64),
        "posedirs": np.asarray(model.posedirs).T.reshape(v, 3, 207).astype(np.float64),
        "J_regressor": sp.csc_matrix(np.asarray(model.j_regressor, np.float64).T),
        "weights": np.asarray(model.lbs_weights, np.float64),
        "cocoplus_regressor": sp.csc_matrix(
            np.asarray(model.joint_regressor, np.float64).T
        ),
        "kintree_table": kintree,
    }
    if model.faces is not None:
        dd["f"] = np.asarray(model.faces, np.uint32)
    with open(path, "wb") as f:
        pickle.dump(dd, f)


def synthetic_mean_params(seed: int = 1) -> np.ndarray:
    """An 85-d mean Theta in the layout the trainer expects
    ([scale, tx, ty | pose 72 | shape 10]); see utils/mean_params.py for
    the real-asset loader it stands in for."""
    rng = np.random.RandomState(seed)
    mean = np.zeros(85, np.float32)
    mean[0] = 0.9
    pose = 0.1 * rng.randn(72).astype(np.float32)
    pose[:3] = 0.0
    pose[0] = np.pi
    mean[3:75] = pose
    mean[75:] = 0.05 * rng.randn(10).astype(np.float32)
    return mean
