"""The fused training step: generator update + critic (WGAN-GP) update in
one jit-compiled program.

Behavioral parity with ref Trainer.train_step (src/trainer.py:352-619):
* 3x IEF stages with per-stage keypoint / mesh-reprojection / critic
  losses; the generator loss is the LAST stage's selected terms only
  (ref src/trainer.py:487-496);
* generator variables = encoder + regressor + trainable mean theta
  (ref src/trainer.py:481-482);
* critic trains real (mocap) vs all-3-stages fake (3N batch)
  (ref src/trainer.py:511-546);
* improved-WGAN gradient penalty, weight 10, with per-element uniform
  interpolation coefficients matching the reference quirk
  (src/trainer.py:551-553) and both penalty formulations (SURVEY.md §8.7);
* double-backward (grad-of-grad through the critic) expressed with
  ``jax.grad`` inside the critic loss.

TPU-first differences: one compiled program for both updates (the
reference runs two eager tapes); explicit PRNG threading; data-parallel by
construction — batch arrays may arrive sharded over a mesh 'data' axis and
XLA inserts the gradient all-reduces.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import Config
from ..core.projection import reproject_to_pixels
from ..ops import losses as L
from ..ops import kcs as K
from .state import TrainState, make_optimizers


class GenBatch(NamedTuple):
    """One step of image data (ref dataset tuple, src/trainer.py:734)."""

    images: jax.Array  # (N, H, W, 3) in [-1, 1]
    seg_points: jax.Array  # (N, P, 2) padded silhouette pixel coords [x, y]
    seg_mask: jax.Array  # (N, P)
    kp2d: jax.Array  # (N, 19, 3) [x, y, vis] in [-1, 1]


class HostBatch(NamedTuple):
    """Raw decoded examples as the host pipeline produced them (fixed
    uint8 canvas + geometry); consumed by the fused train step, which
    runs the augmentation on device inside the same program."""

    image: jax.Array  # (N, Hc, Wc, 3) uint8
    seg: jax.Array  # (N, Hc, Wc, 1) uint8
    hw: jax.Array  # (N, 2) int32
    center: jax.Array  # (N, 2) int32
    label: jax.Array  # (N, 3, 19)


class MocapBatch(NamedTuple):
    """Real samples for the critic (ref src/trainer.py:736-738)."""

    joints: jax.Array  # (M, >=14, 3)
    shapes: jax.Array  # (M, 10)
    rotations: jax.Array  # (M, 23, 3, 3)


@struct.dataclass
class StepMetrics:
    kpr_losses: jax.Array  # (num_stage,)
    mr_losses: jax.Array  # (num_stage,)
    gen_critic_losses: jax.Array  # (num_stage,)
    generator_loss: jax.Array
    critic_loss: jax.Array
    critic_penalty: jax.Array
    bone_length_pred: jax.Array
    bone_length_gt: jax.Array


def _stage_losses(stages, batch: GenBatch, critic_apply, critic_params, c_matrix, cfg):
    """Per-stage losses (all stages, like the reference; only the last
    enters the generator objective)."""
    kpr, mr, gcl = [], [], []
    for i, s in enumerate(stages):
        # gt labels carry 19 cocoplus points (14 + 5 face); with a 14-joint
        # LSP head we compare the first 14 — identical loss, since the face
        # points have zero visibility on LSP data (SURVEY.md §8 quirk 6).
        kp_gt = batch.kp2d[:, : s.kp2d.shape[1]]
        kpr.append(cfg.kpr_loss_weight * L.keypoint_reprojection_loss(kp_gt, s.kp2d))
        # Early-stage mesh losses are metrics only (the generator objective
        # takes the last stage); mr_metric_stages='last' skips their
        # chamfer evaluations entirely.
        mr_wanted = cfg.mr_metric_stages == "all" or i == len(stages) - 1
        if cfg.use_mesh_repro_loss and mr_wanted:
            sil_pred = reproject_to_pixels(s.verts, s.cam, float(cfg.img_size))
            mr.append(
                cfg.mr_loss_weight
                * L.mesh_reprojection_loss(
                    batch.seg_points,
                    batch.seg_mask,
                    sil_pred,
                    scale_mode=cfg.mr_scale_mode,
                )
            )
        else:
            mr.append(jnp.zeros(()))
        if not cfg.encoder_only:
            kcs_mat = K.kcs(s.joints3d, c_matrix)
            scores = critic_apply(
                critic_params, kcs_mat, s.joints3d[:, :14], s.shape, s.rotations
            )
            # -sum(mean over batch) (ref src/trainer.py:467).
            gcl.append(cfg.critic_loss_weight * -jnp.sum(jnp.mean(scores, axis=0)))
        else:
            gcl.append(jnp.zeros(()))
    return jnp.stack(kpr), jnp.stack(mr), jnp.stack(gcl)


def make_train_step(hmr, critic_def, cfg: Config):
    """Build the jit-able train_step(state, gen_batch, mocap_batch, rng)."""
    gen_tx, critic_tx = make_optimizers(
        cfg.generator_lr, cfg.critic_lr, cfg.lr_schedule, cfg.lr_decay_steps
    )
    c_matrix = jnp.asarray(K.bone_incidence_matrix())
    critic_apply = lambda p, *a: critic_def.apply({"params": p}, *a)

    def generator_loss_fn(gen_params, state: TrainState, batch: GenBatch, rng):
        variables = {
            "params": {k: gen_params[k] for k in ("encoder", "regressor")},
            "batch_stats": state.batch_stats,
        }
        stages, new_bs = hmr(
            variables,
            batch.images,
            gen_params["mean_theta"],
            train=True,
            dropout_rng=rng,
            smpl_stages="all",
        )
        kpr, mr, gcl = _stage_losses(
            stages, batch, critic_apply, state.critic_params, c_matrix, cfg
        )
        loss = jnp.zeros(())
        if cfg.use_kpr_loss:
            loss = loss + kpr[-1]
        if cfg.use_mesh_repro_loss:
            loss = loss + mr[-1]
        if not cfg.encoder_only:
            loss = loss + gcl[-1]
        if cfg.cam_scale_hinge > 0.0:
            # Gauge fix (Config.cam_scale_hinge): keep the weak-perspective
            # scale of the stage that feeds the losses out of the mirrored
            # s<0 gauge. Zero whenever s >= margin.
            s = stages[-1].cam[:, 0]
            hinge = jnp.mean(jnp.square(jax.nn.relu(cfg.cam_scale_margin - s)))
            loss = loss + cfg.cam_scale_hinge * hinge
        aux = dict(stages=stages, new_batch_stats=new_bs, kpr=kpr, mr=mr, gcl=gcl)
        return loss, aux

    def critic_loss_fn(critic_params, fakes, real: MocapBatch, rng):
        fake_joints, fake_shapes, fake_rs = fakes
        real_joints = real.joints[:, :14]
        real_kcs = K.kcs(real_joints, c_matrix)
        fake_kcs = K.kcs(fake_joints, c_matrix)
        real_out = critic_apply(
            critic_params, real_kcs, real_joints, real.shapes, real.rotations
        )
        fake_out = critic_apply(
            critic_params, fake_kcs, fake_joints, fake_shapes, fake_rs
        )
        # WGAN loss: sum over the 3 heads of the batch-mean margin
        # (ref src/trainer.py:546).
        wgan = jnp.sum(jnp.mean(fake_out - real_out, axis=0))
        penalty = jnp.zeros(())
        if cfg.use_gradient_penalty:
            ra, rb, rc = jax.random.split(rng, 3)
            # Per-element uniforms, matching the reference quirk
            # (src/trainer.py:551-553; a per-sample scalar is the paper's
            # formulation).
            alpha = jax.random.uniform(ra, fake_joints.shape)
            beta = jax.random.uniform(rb, fake_shapes.shape)
            gamma = jax.random.uniform(rc, fake_rs.shape)
            i_joints = fake_joints + alpha * (real_joints - fake_joints)
            i_shapes = fake_shapes + beta * (real.shapes - fake_shapes)
            i_rs = fake_rs + gamma * (real.rotations - fake_rs)
            i_kcs = K.kcs(i_joints, c_matrix)

            def critic_sum(kcs_in, joints_in, shapes_in, rs_in):
                out = critic_apply(
                    critic_params, kcs_in, joints_in[:, :14], shapes_in, rs_in
                )
                return jnp.sum(out)

            grads = jax.grad(critic_sum, argnums=(0, 1, 2, 3))(
                i_kcs, i_joints, i_shapes, i_rs
            )
            penalty = L.gradient_penalty(list(grads), mode=cfg.gp_mode)
            wgan = wgan + 10.0 * penalty
        return wgan, penalty

    def train_step(
        state: TrainState,
        batch: GenBatch,
        mocap: Optional[MocapBatch],
        rng: jax.Array,
    ) -> Tuple[TrainState, StepMetrics]:
        rng = jax.random.fold_in(rng, state.step)
        drop_rng, gp_rng = jax.random.split(rng)

        # ------------------------- generator update -----------------------
        (gen_loss, aux), gen_grads = jax.value_and_grad(
            generator_loss_fn, has_aux=True
        )(state.gen_params, state, batch, drop_rng)
        updates, new_gen_opt = gen_tx.update(gen_grads, state.gen_opt, state.gen_params)
        new_gen_params = optax.apply_updates(state.gen_params, updates)

        stages = aux["stages"]
        fake_joints = jnp.concatenate([s.joints3d[:, :14] for s in stages], axis=0)
        fake_shapes = jnp.concatenate([s.shape for s in stages], axis=0)
        fake_rs = jnp.concatenate([s.rotations for s in stages], axis=0)
        bone_pred = jnp.mean(jnp.sum(K.bone_lengths_sq(fake_joints, c_matrix), axis=1))

        # bone_gt is a metric, not a critic input: compute it whenever
        # mocap data is present — encoder_only + do_bone_evaluation still
        # iterates mocap purely for this scalar (trainer.py), and it must
        # not silently read 0 in that config.
        bone_gt = (
            jnp.mean(
                jnp.sum(K.bone_lengths_sq(mocap.joints[:, :14], c_matrix), axis=1)
            )
            if mocap is not None
            else jnp.zeros(())
        )

        # --------------------------- critic update ------------------------
        if cfg.encoder_only or mocap is None:
            new_critic_params = state.critic_params
            new_critic_opt = state.critic_opt
            critic_loss = jnp.zeros(())
            penalty = jnp.zeros(())
        else:
            fakes = jax.lax.stop_gradient((fake_joints, fake_shapes, fake_rs))
            (critic_loss, penalty), critic_grads = jax.value_and_grad(
                critic_loss_fn, has_aux=True
            )(state.critic_params, fakes, mocap, gp_rng)
            cupd, new_critic_opt = critic_tx.update(
                critic_grads, state.critic_opt, state.critic_params
            )
            new_critic_params = optax.apply_updates(state.critic_params, cupd)

        new_state = state.replace(
            step=state.step + 1,
            gen_params=new_gen_params,
            batch_stats=aux["new_batch_stats"],
            gen_opt=new_gen_opt,
            critic_params=new_critic_params,
            critic_opt=new_critic_opt,
        )
        metrics = StepMetrics(
            kpr_losses=aux["kpr"],
            mr_losses=aux["mr"],
            gen_critic_losses=aux["gcl"],
            generator_loss=gen_loss,
            critic_loss=critic_loss,
            critic_penalty=penalty,
            bone_length_pred=bone_pred,
            bone_length_gt=bone_gt,
        )
        return new_state, metrics

    return train_step


def make_val_step(hmr, critic_def, cfg: Config, return_stages: bool = False):
    """Evaluation forward pass + losses, no parameter updates
    (ref Trainer.val_step, src/trainer.py:226-348).

    return_stages=True additionally returns per-IEF-stage keypoints /
    verts / cams stacked on a leading stage axis — the inputs for the
    reference's per-stage visualization panels (ref visualize_img /
    draw_results, src/trainer.py:622-695). Off by default: the stacked
    (S, N, V, 3) verts are pure overhead for metric sweeps."""
    c_matrix = jnp.asarray(K.bone_incidence_matrix())
    critic_apply = lambda p, *a: critic_def.apply({"params": p}, *a)

    def val_step(state: TrainState, batch: GenBatch, encoder_qparams=None):
        """encoder_qparams: optional PTQ int8 encoder weights
        (models/quantize.py) — evaluates the SERVING graph with the
        task metrics, so int8 accuracy is quantified in PCK/KPR/MR
        rather than tensor drift (PERF.md "int8 task metrics")."""
        variables = {
            "params": {k: state.gen_params[k] for k in ("encoder", "regressor")},
            "batch_stats": state.batch_stats,
        }
        stages, _ = hmr(
            variables,
            batch.images,
            state.gen_params["mean_theta"],
            train=False,
            smpl_stages="all",
            encoder_qparams=encoder_qparams,
        )
        kpr, mr, gcl = _stage_losses(
            stages, batch, critic_apply, state.critic_params, c_matrix, cfg
        )
        last = stages[-1]
        out = dict(
            kpr_losses=kpr,
            mr_losses=mr,
            gen_critic_losses=gcl,
            pred_keypoints=last.kp2d,
            verts=last.verts,
            cams=last.cam,
        )
        if return_stages:
            out.update(
                stage_kp2d=jnp.stack([s.kp2d for s in stages]),
                stage_verts=jnp.stack([s.verts for s in stages]),
                stage_cams=jnp.stack([s.cam for s in stages]),
            )
        return out

    return val_step


def make_fused_train_step(hmr, critic_def, cfg: Config, smpl, augment: bool = True):
    """One-dispatch training: preprocessing + mocap prior + both updates
    in a SINGLE compiled program.

    The default path runs three executables per step (device augmentation,
    mocap SMPL forward, train step). Fusing them removes two host->device
    dispatch boundaries and lets XLA schedule the augmentation matmuls and
    the mocap body-model forward alongside the encoder — the TPU-idiomatic
    endpoint of the host/device split (SURVEY.md §2: "device: everything
    after decode, as one fused XLA program").

    Signature: fused(state, host_batch: HostBatch,
                     mocap_raw: Optional[(pose (M,72), shape (M,10))],
                     rng) -> (state, metrics).
    """
    from ..core.smpl import smpl_forward
    from ..data.augment import AugmentConfig, augment_batch, extract_silhouette

    base = make_train_step(hmr, critic_def, cfg)
    aug_cfg = AugmentConfig(
        out_size=cfg.img_size,
        trans_max=cfg.trans_max,
        scale_min=cfg.scale_min,
        scale_max=cfg.scale_max,
        augment=augment,
    )

    def fused(state, host: HostBatch, mocap_raw, rng):
        aug_rng = jax.random.fold_in(jax.random.fold_in(rng, 1), state.step)
        crops, crop_segs, label = augment_batch(
            host.image, host.seg, host.hw, host.center, host.label,
            aug_rng, aug_cfg,
        )
        pts, mask = extract_silhouette(crop_segs, cfg.max_silhouette_points)
        batch = GenBatch(images=crops, seg_points=pts, seg_mask=mask, kp2d=label)
        mocap = None
        if mocap_raw is not None:
            pose, shape = mocap_raw
            out = smpl_forward(smpl, shape, pose, joint_type="cocoplus")
            mocap = MocapBatch(
                joints=out.joints, shapes=shape, rotations=out.rotations[:, 1:]
            )
        return base(state, batch, mocap, rng)

    return fused


def make_multi_step(step_fn, k: int):
    """Scan ``k`` training steps inside ONE jit dispatch.

    Amortizes per-dispatch latency (the dominant loop cost on remote/
    relay-attached chips, PERF.md "Training-loop host overhead") over k
    steps: the host ships k stacked batches, the device runs k full
    updates under ``lax.scan``, and the stacked (k, ...) metrics come
    back in a single transfer — per-step scalars survive.

    Semantically identical to k sequential step calls: the step
    functions fold their PRNG with ``state.step`` internally, so the
    same outer ``rng`` yields the same per-step randomness either way.
    (Numerics agree to float32 rounding — XLA fuses the scanned body
    differently than the standalone program.)

    Takes a TUPLE of k batch pytrees (and k mocap pytrees or None); the
    stack to the scan's leading dim happens INSIDE the program — doing
    it with jnp.stack on device arrays outside jit costs ~2 extra
    dispatches per leaf and erases the win (measured: 59 ms/step vs the
    expected ~15).
    """

    def multi(state, batch_tuple, mocap_tuple, rng):
        # Normalize container types so the scan carry is structurally
        # stable (the step emits plain dicts; a restored/initial state
        # may hold FrozenDicts).
        from flax.core import unfreeze

        state = state.replace(batch_stats=unfreeze(state.batch_stats))
        batches = jax.tree.map(lambda *xs: jnp.stack(xs), *batch_tuple)
        mocaps = (
            jax.tree.map(lambda *xs: jnp.stack(xs), *mocap_tuple)
            if mocap_tuple is not None
            else None
        )

        def body(st, inp):
            b, m = inp
            return step_fn(st, b, m, rng)

        return jax.lax.scan(body, state, (batches, mocaps))

    return multi
