"""Differentiable SMPL body model in pure JAX.

Covers the capabilities of the reference's body-model layer
(ref: src/tf_smpl/batch_smpl.py:26-160, src/tf_smpl/batch_lbs.py:91-152):
shape blendshapes, joint regression, pose blendshapes, forward kinematics
down the 24-joint kinematic tree, linear blend skinning, and the
cocoplus/LSP joint regressor.

TPU-first design notes
----------------------
* The model is a pytree of arrays (``SMPLModel``) instead of a stateful
  object holding framework variables, so it can be closed over by ``jit``,
  donated, sharded, or cast as a whole.
* All per-vertex work is expressed as a handful of large matmuls
  (``(N,10)x(10,20670)``, ``(N,207)x(207,20670)``, ``(N,V)x(V,24)``) that
  map straight onto the MXU; the homogeneous-coordinate bookkeeping of the
  reference (explicit 4x4 matrices padded/concatenated per joint) is
  replaced by (R, t) pairs so the skinning contraction is two einsums
  rather than a batched 4x4 matmul over 6890 vertices.
* Forward kinematics is an unrolled loop over the static 24-joint tree —
  23 tiny (3x3) matmul chains that XLA schedules alongside the big
  blendshape matmuls. (A ``lax.scan`` would force a sequential dependence
  on level-parallel subtrees for no gain at this size.)
* ``dtype`` is configurable: the big blendshape matmuls are numerically
  benign in bfloat16, while FK/skinning stay in float32 by default.
"""
from __future__ import annotations

import pickle
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .rotations import rodrigues

NUM_JOINTS = 24
NUM_BETAS = 10
POSE_FEATURE_DIM = 207  # 23 * 9

# Standard SMPL kinematic-tree parents (index 0 is the root; entry kept for
# alignment, never dereferenced). This is public model topology, identical to
# kintree_table[0] in every released SMPL model.
SMPL_PARENTS = (
    0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19,
    20, 21,
)


def _dense(x: Any) -> np.ndarray:
    """Convert possibly-sparse / chumpy-wrapped arrays to plain numpy."""
    if hasattr(x, "todense"):
        x = np.asarray(x.todense())
    elif hasattr(x, "r"):  # chumpy
        x = np.asarray(x.r)
    return np.asarray(x)


@struct.dataclass
class SMPLModel:
    """SMPL template assets as a JAX pytree.

    Shapes use V = number of vertices (6890 for real SMPL), K = 24 joints,
    J = 19 cocoplus keypoints.
    """

    v_template: jax.Array  # (V, 3)
    shapedirs: jax.Array  # (NUM_BETAS, V*3) — transposed for (N,10)@(10,3V)
    posedirs: jax.Array  # (POSE_FEATURE_DIM, V*3)
    j_regressor: jax.Array  # (V, K)
    lbs_weights: jax.Array  # (V, K)
    joint_regressor: jax.Array  # (V, 19) cocoplus keypoint regressor
    parents: Tuple[int, ...] = struct.field(pytree_node=False, default=SMPL_PARENTS)
    faces: Optional[np.ndarray] = struct.field(pytree_node=False, default=None)

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]

    def astype(self, dtype) -> "SMPLModel":
        return jax.tree.map(lambda a: a.astype(dtype), self)


@struct.dataclass
class SMPLOutput:
    verts: jax.Array  # (N, V, 3) posed, skinned vertices
    joints: jax.Array  # (N, 19|14, 3) regressed keypoints
    rotations: jax.Array  # (N, 24, 3, 3) per-joint rotation matrices
    joints_smpl: jax.Array  # (N, 24, 3) posed kinematic-tree joints


def load_model(path: str) -> SMPLModel:
    """Load an SMPL asset from a pickle (official release format) or npz.

    The pickle layout matches what the reference consumes
    (ref: src/tf_smpl/batch_smpl.py:31-79): v_template, shapedirs
    (V,3,10), posedirs (V,3,207), J_regressor (24,V sparse), weights
    (V,24), cocoplus_regressor (19,V sparse), kintree_table, optional f.
    """
    if path.endswith(".npz"):
        return load_model_npz(path)
    with open(path, "rb") as f:
        dd = pickle.load(f, encoding="latin1")
    v_template = _dense(dd["v_template"]).astype(np.float32)
    num_betas = int(_dense(dd["shapedirs"]).shape[-1])
    shapedirs = _dense(dd["shapedirs"]).reshape(-1, num_betas).T.astype(np.float32)
    posedirs = _dense(dd["posedirs"]).reshape(-1, POSE_FEATURE_DIM).T.astype(np.float32)
    j_regressor = _dense(dd["J_regressor"]).T.astype(np.float32)  # (V, 24)
    lbs_weights = _dense(dd["weights"]).astype(np.float32)
    joint_regressor = _dense(dd["cocoplus_regressor"]).T.astype(np.float32)  # (V, 19)
    parents = tuple(int(p) for p in _dense(dd["kintree_table"])[0])
    # Root parent is stored as uint32(-1) in official assets; normalize to 0.
    parents = (0,) + parents[1:]
    faces = _dense(dd["f"]).astype(np.int32) if "f" in dd else None
    return SMPLModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        j_regressor=jnp.asarray(j_regressor),
        lbs_weights=jnp.asarray(lbs_weights),
        joint_regressor=jnp.asarray(joint_regressor),
        parents=parents,
        faces=faces,
    )


def save_model_npz(model: SMPLModel, path: str) -> None:
    """One-time offline conversion target (no pickle/chumpy at train time)."""
    np.savez(
        path,
        v_template=np.asarray(model.v_template),
        shapedirs=np.asarray(model.shapedirs),
        posedirs=np.asarray(model.posedirs),
        j_regressor=np.asarray(model.j_regressor),
        lbs_weights=np.asarray(model.lbs_weights),
        joint_regressor=np.asarray(model.joint_regressor),
        parents=np.asarray(model.parents, dtype=np.int32),
        faces=(model.faces if model.faces is not None else np.zeros((0, 3), np.int32)),
    )


def load_model_npz(path: str) -> SMPLModel:
    z = np.load(path)
    faces = z["faces"]
    return SMPLModel(
        v_template=jnp.asarray(z["v_template"]),
        shapedirs=jnp.asarray(z["shapedirs"]),
        posedirs=jnp.asarray(z["posedirs"]),
        j_regressor=jnp.asarray(z["j_regressor"]),
        lbs_weights=jnp.asarray(z["lbs_weights"]),
        joint_regressor=jnp.asarray(z["joint_regressor"]),
        parents=tuple(int(p) for p in z["parents"]),
        faces=(faces if faces.size else None),
    )


def global_rigid_transform(
    rotations: jax.Array, joints: jax.Array, parents: Tuple[int, ...]
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Forward kinematics down the kinematic tree.

    Functional equivalent of the reference's unrolled 4x4-matmul chain
    (ref: src/tf_smpl/batch_lbs.py:91-152), expressed as (R, t) pairs.

    Args:
      rotations: (N, K, 3, 3) per-joint local rotations.
      joints: (N, K, 3) rest-pose joint locations.
      parents: static tuple of K parent indices (parents[0] ignored).
    Returns:
      (posed_joints (N,K,3), world_R (N,K,3,3), skin_t (N,K,3)) where
      ``skin_t = t_world - world_R @ J_rest`` is the translation of the
      relative ("final minus initial bone") skinning transform — the same
      quantity the reference assembles via its init_bone subtraction trick
      (src/tf_smpl/batch_lbs.py:146-150).
    """
    world_r = [rotations[:, 0]]
    world_t = [joints[:, 0]]
    for k in range(1, len(parents)):
        p = parents[k]
        bone = joints[:, k] - joints[:, p]
        r = jnp.einsum("nij,njk->nik", world_r[p], rotations[:, k])
        t = world_t[p] + jnp.einsum("nij,nj->ni", world_r[p], bone)
        world_r.append(r)
        world_t.append(t)
    world_r = jnp.stack(world_r, axis=1)  # (N, K, 3, 3)
    world_t = jnp.stack(world_t, axis=1)  # (N, K, 3)
    skin_t = world_t - jnp.einsum("nkij,nkj->nki", world_r, joints)
    return world_t, world_r, skin_t


def smpl_forward(
    model: SMPLModel,
    beta: jax.Array,
    theta: jax.Array,
    joint_type: str = "cocoplus",
    blend_dtype=None,
) -> SMPLOutput:
    """Batched SMPL forward pass.

    Args:
      model: SMPL assets.
      beta: (N, 10) shape coefficients.
      theta: (N, 72) axis-angle pose (including global rotation).
      joint_type: 'cocoplus' (19 keypoints) or 'lsp' (first 14).
      blend_dtype: optional dtype (e.g. jnp.bfloat16) for the two large
        blendshape matmuls; accumulation stays float32.
    Returns:
      SMPLOutput with verts (N,V,3), joints (N,19|14,3), rotations
      (N,24,3,3), joints_smpl (N,24,3).

    Mirrors ref src/tf_smpl/batch_smpl.py:88-160 behaviorally.
    """
    if joint_type not in ("cocoplus", "lsp"):
        raise ValueError(f"joint_type must be 'cocoplus' or 'lsp', got {joint_type!r}")
    n = beta.shape[0]
    v = model.num_verts
    f32 = jnp.float32

    def blend(coefs, dirs):
        if blend_dtype is not None:
            coefs = coefs.astype(blend_dtype)
            dirs = dirs.astype(blend_dtype)
        out = jnp.dot(coefs, dirs, preferred_element_type=f32)
        return out.reshape(n, v, 3)

    # 1. Shape blendshapes.
    with jax.named_scope("smpl_shape_blend"):
        v_shaped = blend(beta, model.shapedirs) + model.v_template

        # 2. Shape-dependent joint locations.
        joints_rest = jnp.einsum("nvc,vk->nkc", v_shaped, model.j_regressor)

    # 3. Per-joint rotations + pose blendshapes.
    with jax.named_scope("smpl_pose_blend"):
        rotations = rodrigues(theta.reshape(n, NUM_JOINTS, 3))
        pose_feature = (
            rotations[:, 1:] - jnp.eye(3, dtype=rotations.dtype)
        ).reshape(n, POSE_FEATURE_DIM)
        v_posed = blend(pose_feature, model.posedirs) + v_shaped

    # 4. Forward kinematics.
    with jax.named_scope("smpl_fk"):
        posed_joints, world_r, skin_t = global_rigid_transform(
            rotations, joints_rest, model.parents
        )

    # 5. Linear blend skinning. Blend the flattened per-joint (R | t) with
    #    the LBS weights in ONE (V,K)x(K,12) matmul per sample — the
    #    blended tensor is (N,V,12) (tens of MB at serving batch sizes);
    #    blending R and t separately as (N,V,3,3) einsums materializes a
    #    multi-GB intermediate at batch >= 128 and collapses throughput.
    #    The final 3-vector contraction fuses elementwise in XLA.
    with jax.named_scope("smpl_lbs"):
        a_flat = jnp.concatenate(
            [world_r.reshape(n, NUM_JOINTS, 9), skin_t], axis=-1
        )  # (N, K, 12)
        blended = jnp.einsum(
            "vk,nkx->nvx", model.lbs_weights, a_flat, preferred_element_type=f32
        )
        r_blend = blended[..., :9].reshape(n, v, 3, 3)
        verts = jnp.einsum("nvij,nvj->nvi", r_blend, v_posed) + blended[..., 9:]

    # 6. Keypoint regression (cocoplus 19 / LSP 14).
    with jax.named_scope("smpl_joint_regress"):
        regressor = model.joint_regressor
        if joint_type == "lsp":
            regressor = regressor[:, :14]
        joints = jnp.einsum("nvc,vj->njc", verts, regressor)

    return SMPLOutput(
        verts=verts, joints=joints, rotations=rotations, joints_smpl=posed_joints
    )
