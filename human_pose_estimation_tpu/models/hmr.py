"""HMR: the flagship end-to-end model — ResNet-50 encoder + iterative
error feedback (IEF) regression to SMPL parameters + body model +
weak-perspective projection, as one jit-able pure function.

Capability parity with the reference's model wiring inside
Trainer.train_step / Predictor.predict (ref src/trainer.py:383-474,
src/predictor.py:114-158), redesigned so the whole pipeline — encoder,
3x IEF stages, SMPL, projection — traces into a single fused XLA program
with no Python between stages (the BASELINE.json "single fused inference
graph" requirement).

Reference behaviors preserved:
* theta layout [cam(3) | pose(72) | shape(10)] (ref src/trainer.py:404-406);
* dropout active only on the *final* IEF stage during training
  (ref src/trainer.py:395-398);
* rotations returned without the root joint for the critic
  (ref src/trainer.py:414).
"""
from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from flax.core import FrozenDict

from ..core.projection import orth_project
from ..core.smpl import SMPLModel, smpl_forward
from .regressor import IEFRegressor, THETA_DIM
from .resnet import ResNet50

NUM_CAM = 3
NUM_POSE = 72
NUM_SHAPE = 10


@struct.dataclass
class StageOutput:
    """Per-IEF-stage outputs (shapes: N batch, V verts, J joints)."""

    theta: jax.Array  # (N, 85)
    cam: jax.Array  # (N, 3)
    pose: jax.Array  # (N, 72)
    shape: jax.Array  # (N, 10)
    verts: jax.Array  # (N, V, 3)
    joints3d: jax.Array  # (N, J, 3)
    rotations: jax.Array  # (N, 23, 3, 3) — root excluded
    kp2d: jax.Array  # (N, J, 2) projected keypoints in [-1, 1]


def split_theta(theta: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """[cam | pose | shape] split (ref src/trainer.py:404-406)."""
    return (
        theta[..., :NUM_CAM],
        theta[..., NUM_CAM : NUM_CAM + NUM_POSE],
        theta[..., NUM_CAM + NUM_POSE :],
    )


class HMR:
    """Bundles the encoder + regressor module defs with the SMPL assets.

    Functional: all state lives in the ``variables`` dict
    ({'params': {'encoder', 'regressor'}, 'batch_stats': ...}); the
    trainable mean theta is owned by the training state, not this class
    (mirroring the reference where mean_var is a separate variable,
    ref src/trainer.py:705).
    """

    def __init__(
        self,
        smpl: SMPLModel,
        num_stage: int = 3,
        joint_type: str = "lsp",
        encoder_dtype: Any = jnp.float32,
        encoder_stage_sizes=None,
        remat_encoder: bool = False,
        encoder_depth: int = 50,
    ):
        self.smpl = smpl
        self.num_stage = num_stage
        self.joint_type = joint_type
        if encoder_stage_sizes is None:
            from .resnet import make_resnet

            self.encoder = make_resnet(encoder_depth, compute_dtype=encoder_dtype)
        else:  # shallow encoder for tests (feature dim follows stages)
            from .resnet import ResNet

            self.encoder = ResNet(
                stage_sizes=tuple(encoder_stage_sizes), compute_dtype=encoder_dtype
            )
        self.regressor = IEFRegressor(compute_dtype=encoder_dtype)
        self.remat_encoder = remat_encoder

    # ------------------------------------------------------------------
    # Initialization
    # ------------------------------------------------------------------
    def init(self, rng: jax.Array, img_size: int = 224) -> FrozenDict:
        enc_rng, reg_rng = jax.random.split(rng)
        dummy = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
        enc_vars = self.encoder.init(enc_rng, dummy, train=False)
        # Regressor input dim = whatever the encoder emits (2048 for the
        # production ResNet-50; shallow test encoders can differ).
        feat = jax.eval_shape(
            lambda v, x: self.encoder.apply(v, x, train=False), enc_vars, dummy
        )
        feat_dim = int(feat.shape[-1])
        reg_vars = self.regressor.init(
            reg_rng, jnp.zeros((1, feat_dim)), jnp.zeros((1, THETA_DIM)), train=False
        )
        return FrozenDict(
            params={
                "encoder": enc_vars["params"],
                "regressor": reg_vars["params"],
            },
            batch_stats={"encoder": enc_vars.get("batch_stats", {})},
        )

    # ------------------------------------------------------------------
    # Quantization (inference serving path)
    # ------------------------------------------------------------------
    def quantize_encoder(self, variables, calibration_images=None):
        """Fold BN + int8-quantize the encoder weights (PTQ) for the
        serving fast path. Run once (e.g. at checkpoint restore); pass the
        result to ``__call__(..., encoder_qparams=...)``.

        With ``calibration_images`` (any representative batch — e.g. the
        serving warmup batch) activation scales are calibrated statically,
        which is what makes int8 *fast* (requant fuses into the conv
        epilogues; see models/quantize.py). Without them the path falls
        back to per-image dynamic scales (correct but slower than bf16).
        """
        from .quantize import calibrate_resnet, quantize_resnet

        if getattr(self.encoder, "stem", "standard") != "standard":
            raise ValueError("int8 encoder supports the standard stem only")
        weights = quantize_resnet(
            variables["params"]["encoder"],
            variables["batch_stats"]["encoder"],
            self.encoder.stage_sizes,
        )
        act = None
        if calibration_images is not None:
            act = calibrate_resnet(
                weights, calibration_images, self.encoder.stage_sizes
            )
        return {"weights": weights, "act": act}

    # ------------------------------------------------------------------
    # Forward
    # ------------------------------------------------------------------
    def __call__(
        self,
        variables,
        images: jax.Array,
        mean_theta: jax.Array,
        train: bool = False,
        dropout_rng: Optional[jax.Array] = None,
        smpl_stages: str = "all",
        encoder_qparams=None,
    ):
        """Full forward pass.

        Args:
          variables: {'params': ..., 'batch_stats': ...}.
          images: (N, H, W, 3) in [-1, 1].
          mean_theta: (1, 85) initial parameter estimate (trainable in the
            trainer, frozen at inference).
          train: training mode (BN batch stats + last-stage dropout).
          dropout_rng: required when train=True.
          smpl_stages: 'all' runs the body model at every IEF stage (needed
            for losses); 'last' runs it only on the final stage (inference
            fast path — earlier stages only need theta).
          encoder_qparams: optional int8 encoder weights from
            ``quantize_encoder`` — inference only (train must be False);
            runs the PTQ serving path (models/quantize.py).
        Returns:
          (stages, new_batch_stats): list of StageOutput (entries for
          skipped SMPL stages contain theta/cam/pose/shape only, other
          fields None), and updated batch_stats (None when train=False).
        """
        n = images.shape[0]
        enc_vars = {
            "params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"]["encoder"],
        }
        if encoder_qparams is not None:
            if train:
                raise ValueError("encoder_qparams is an inference-only path")
            from .quantize import resnet_apply_int8

            features = resnet_apply_int8(
                encoder_qparams["weights"],
                images,
                self.encoder.stage_sizes,
                act_scales=encoder_qparams["act"],
            )
            new_batch_stats = None
        elif train:
            def enc_fwd(variables, images):
                return self.encoder.apply(
                    variables, images, train=True, mutable=["batch_stats"]
                )

            if self.remat_encoder:
                # Rematerialize encoder activations in the backward pass —
                # trades FLOPs for HBM so training batches can grow.
                enc_fwd = jax.checkpoint(enc_fwd)
            features, enc_mut = enc_fwd(enc_vars, images)
            new_batch_stats = {"encoder": enc_mut["batch_stats"]}
        else:
            features = self.encoder.apply(enc_vars, images, train=False)
            new_batch_stats = None

        reg_params = {"params": variables["params"]["regressor"]}
        theta = jnp.tile(mean_theta, (n, 1))
        stages: List[StageOutput] = []
        for stage in range(self.num_stage):
            last = stage == self.num_stage - 1
            # Reference quirk: dropout only on the final IEF stage
            # (ref src/trainer.py:395-398).
            stage_train = train and last
            delta = self.regressor.apply(
                reg_params,
                features,
                theta,
                train=stage_train,
                rngs=(
                    {"dropout": jax.random.fold_in(dropout_rng, stage)}
                    if stage_train and dropout_rng is not None
                    else None
                ),
            )
            theta = theta + delta
            cam, pose, shape = split_theta(theta)
            if smpl_stages == "all" or last:
                out = smpl_forward(self.smpl, shape, pose, joint_type=self.joint_type)
                kp2d = orth_project(out.joints, cam)
                stages.append(
                    StageOutput(
                        theta=theta,
                        cam=cam,
                        pose=pose,
                        shape=shape,
                        verts=out.verts,
                        joints3d=out.joints,
                        rotations=out.rotations[:, 1:],
                        kp2d=kp2d,
                    )
                )
            else:
                stages.append(
                    StageOutput(
                        theta=theta,
                        cam=cam,
                        pose=pose,
                        shape=shape,
                        verts=None,
                        joints3d=None,
                        rotations=None,
                        kp2d=None,
                    )
                )
        return stages, new_batch_stats
