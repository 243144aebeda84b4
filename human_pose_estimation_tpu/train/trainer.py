"""Training orchestration: epochs, logging, validation, checkpoints.

Capability parity with ref src/trainer.py Trainer (train loop
:700-870, validate_checkpoint :882-995, visualization :622-695), around
the jit-compiled step functions of train/step.py:

* epoch accounting from the dataset-size table (ref :109-111, 819-868)
  with progress bar + ETA;
* TensorBoard scalars every step (separate train/val writers), rendered
  mesh/skeleton/seg overlays every ``log_img_step``;
* validation every ``validation_step_size`` steps;
* checkpoint every ``checkpoint_every_epochs`` epochs (Orbax, full train
  state — fixing the reference's lost step counter / untrained-mean-theta
  restore, SURVEY.md §8 quirk 5);
* full-sweep checkpoint validation with mean KPR/MR losses plus PCK@0.5
  and bone-length stats, and best/worst batch rendering.

Data-parallel: the trainer owns a 1-D ``data`` mesh; batches are sharded
on arrival, state is replicated, XLA lowers gradient reductions onto ICI.
"""
from __future__ import annotations

import datetime
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..core.smpl import load_model
from ..data import tfrecords
from ..models.critic import Critic
from ..models.hmr import HMR
from ..parallel import mesh as pmesh
from ..utils import checkpoint as ckpt
from ..utils.mean_params import load_mean_theta
from ..utils.summary import SummaryWriter
from ..ops.metrics import pck
from .state import TrainState, create_train_state
from .step import GenBatch, make_train_step, make_val_step


class Trainer:
    def __init__(
        self,
        config: Config,
        dataset=None,  # iterator of (GenBatch, n) — e.g. data.pipeline.ImagePipeline
        mocap_dataset=None,  # iterator of MocapBatch
        val_dataset=None,
        validation_only: bool = False,
        smpl=None,
        use_mesh: bool = True,
        encoder_stage_sizes=None,  # shallow encoder override (tests/smoke)
    ):
        from ..utils.jax_cache import ensure_compilation_cache

        ensure_compilation_cache()  # minutes/executable on remote chips
        self.config = config
        self.dataset = dataset
        self.mocap_dataset = mocap_dataset
        self.val_dataset = val_dataset
        self.validation_only = validation_only

        self.smpl = smpl if smpl is not None else load_model(config.smpl_model_path)
        dtype = jnp.bfloat16 if config.encoder_dtype == "bfloat16" else jnp.float32
        if encoder_stage_sizes is None and config.encoder_stage_sizes:
            # CLI smoke-run override (Config.encoder_stage_sizes).
            encoder_stage_sizes = tuple(
                int(x) for x in config.encoder_stage_sizes.split(",")
            )
        self.hmr = HMR(
            self.smpl,
            num_stage=config.num_stage,
            joint_type=config.joint_type,
            encoder_dtype=dtype,
            encoder_stage_sizes=encoder_stage_sizes,
            remat_encoder=config.remat_encoder,
            encoder_depth=config.encoder_depth,
        )
        self.critic = Critic()
        mean_theta = load_mean_theta(config.mean_params_path)
        self.state: TrainState = create_train_state(
            jax.random.PRNGKey(config.seed),
            self.hmr,
            self.critic,
            mean_theta,
            config.generator_lr,
            config.critic_lr,
            img_size=config.img_size,
            lr_schedule=config.lr_schedule,
            lr_decay_steps=config.lr_decay_steps,
        )
        if config.init_encoder_from and not config.train_from_checkpoint:
            self._graft_encoder(config.init_encoder_from)

        self.mesh = (
            pmesh.make_mesh(batch_size=config.batch_size) if use_mesh else None
        )
        if self.mesh is not None:
            self.state = pmesh.replicate(self.state, self.mesh)
        if config.fuse_preprocess:
            # One dispatch per step: augmentation + mocap SMPL forward +
            # both updates in a single program. Requires pipelines built
            # with device_preprocess=False / device_forward=False.
            from .step import make_fused_train_step

            step_fn = make_fused_train_step(self.hmr, self.critic, config, self.smpl)
        else:
            step_fn = make_train_step(self.hmr, self.critic, config)
        self.train_step = jax.jit(step_fn, donate_argnums=(0,))
        if config.steps_per_call > 1:
            from .step import make_multi_step

            self._multi_step = jax.jit(
                make_multi_step(step_fn, config.steps_per_call),
                donate_argnums=(0,),
            )
        self.val_step = jax.jit(make_val_step(self.hmr, self.critic, config))
        self._viz_step = None  # lazy: per-stage val step for image panels

        if config.num_examples_override > 0:
            num_images = config.num_examples_override
        else:
            try:
                num_images = tfrecords.num_examples(config.datasets)
            except KeyError as e:
                raise ValueError(
                    f"unknown dataset size for {e.args[0]!r}: epoch "
                    "accounting needs the example count (the reference "
                    "hard-codes these, ref src/data_loader.py:18-42). Add "
                    "it to data/tfrecords.NUM_EXAMPLES or set "
                    "--num_examples_override."
                ) from e
        self.num_itr_per_epoch = max(num_images / config.batch_size, 1)

        self.writers: Dict[str, SummaryWriter] = {}
        if not validation_only and config.model_dir:
            self.writers["train"] = SummaryWriter(
                os.path.join(config.model_dir, "training")
            )
            self.writers["val"] = SummaryWriter(
                os.path.join(config.model_dir, "validation")
            )
        self._renderer = None

    # ------------------------------------------------------------------
    def _writer(self, name: str) -> SummaryWriter:
        if name not in self.writers:
            self.writers[name] = SummaryWriter(None)
        return self.writers[name]

    @property
    def renderer(self):
        if self._renderer is None:
            from ..viz.renderer import SMPLRenderer

            faces = self.smpl.faces
            if faces is None:
                faces = np.zeros((0, 3), np.int64)
            self._renderer = SMPLRenderer(
                img_size=self.config.img_size, faces=faces
            )
        return self._renderer

    def _shard(self, batch, dim: int = 0):
        if self.mesh is None or batch is None:
            return batch
        return pmesh.shard_batch(batch, self.mesh, dim=dim)

    def _graft_encoder(self, donor_dir: str) -> None:
        """Pretrained-encoder init (Config.init_encoder_from): copy the
        encoder parameters + BN statistics out of another run's checkpoint
        into this fresh state. Everything else (regressor, critic, mean
        theta, both optimizers, step=0) starts anew — the exact analog of
        the reference's ImageNet encoder with fresh heads
        (ref src/models.py:35-41)."""
        from flax.core import freeze

        raw, step = ckpt.restore_raw(donor_dir)
        try:
            # freeze(): raw restore yields plain nested dicts, a different
            # pytree node type than the state's FrozenDicts — normalize so
            # two-tree jax.tree.map/structure comparison is meaningful.
            donor_enc = freeze(raw["gen_params"]["encoder"])
            donor_bs = freeze(raw["batch_stats"]["encoder"])
        except (KeyError, TypeError) as e:
            raise ValueError(
                f"checkpoint under {donor_dir!r} has no encoder subtree "
                "(is it a TrainState checkpoint?)"
            ) from e
        own_enc = self.state.gen_params["encoder"]
        donor_shapes = jax.tree.map(lambda x: jnp.asarray(x).shape, donor_enc)
        own_shapes = jax.tree.map(lambda x: x.shape, own_enc)
        if jax.tree.structure(donor_shapes) != jax.tree.structure(own_shapes) or (
            jax.tree.leaves(donor_shapes) != jax.tree.leaves(own_shapes)
        ):
            raise ValueError(
                f"encoder in {donor_dir!r} (step {step}) does not match this "
                "model's encoder structure — same encoder_depth/stage sizes "
                "required for init_encoder_from"
            )
        cast = lambda ref, x: jnp.asarray(x, ref.dtype)
        new_gen = dict(self.state.gen_params)
        new_gen["encoder"] = jax.tree.map(cast, own_enc, donor_enc)
        new_bs = dict(self.state.batch_stats)
        new_bs["encoder"] = jax.tree.map(
            cast, self.state.batch_stats["encoder"], donor_bs
        )
        from flax.core import FrozenDict

        self.state = self.state.replace(
            gen_params=FrozenDict(new_gen), batch_stats=FrozenDict(new_bs)
        )
        print(f"initialized encoder from {donor_dir} (step {step})")

    # ------------------------------------------------------------------
    def restore(self) -> Optional[int]:
        self.state, step = ckpt.restore_train_state(
            self.config.checkpoint_dir, self.state
        )
        if self.mesh is not None:
            self.state = pmesh.replicate(self.state, self.mesh)
        # Resume the input streams too, when the pipelines support it
        # (grain images; npz-backed mocap); the reference restores
        # weights only.
        if step is not None:
            input_state = ckpt.restore_input_state(self.config.checkpoint_dir, step)
            if input_state is not None:
                # current format: {"image": ..., "mocap": ...}; legacy
                # checkpoints stored the image-pipeline state bare.
                legacy = "image" not in input_state and "mocap" not in input_state
                img_state = input_state if legacy else input_state.get("image")
                mocap_state = None if legacy else input_state.get("mocap")
                if img_state is not None and hasattr(self.dataset, "set_state"):
                    self.dataset.set_state(img_state)
                if mocap_state is not None and hasattr(
                    self.mocap_dataset, "set_state"
                ):
                    self.mocap_dataset.set_state(mocap_state)
        return step

    def save(self) -> None:
        img_state = (
            self.dataset.get_state()
            if hasattr(self.dataset, "get_state")
            else None
        )
        mocap_state = (
            self.mocap_dataset.get_state()
            if hasattr(self.mocap_dataset, "get_state")
            else None
        )
        input_state = None
        if img_state is not None or mocap_state is not None:
            input_state = {"image": img_state, "mocap": mocap_state}
        ckpt.save_train_state(
            self.config.checkpoint_dir, self.state, input_state=input_state
        )

    # ------------------------------------------------------------------
    def train(self, max_steps: Optional[int] = None) -> Dict[str, List[float]]:
        """Run the training loop (ref Trainer.train, src/trainer.py:700-870).

        ``max_steps`` bounds total steps (tests / smoke runs); otherwise
        runs config.epoch epochs by the reference's fractional epoch
        accounting.
        """
        cfg = self.config
        start_step = 0
        if cfg.train_from_checkpoint:
            restored = self.restore()
            print(f"restored checkpoint at step {restored}")
            start_step = restored or 0

        rng = jax.random.PRNGKey(cfg.seed + 1)
        history = {"kpr": [], "mr": [], "gen_critic": [], "critic": []}
        epoch_acc = {k: [] for k in history}
        train_writer = self._writer("train")
        val_writer = self._writer("val")
        val_iter = iter(self.val_dataset) if self.val_dataset is not None else None

        mocap_iter = iter(self.mocap_dataset) if self.mocap_dataset is not None else None
        need_mocap = not cfg.encoder_only or cfg.do_bone_evaluation

        k = max(cfg.steps_per_call, 1)
        data_iter = iter(self.dataset)
        itr, epoch, global_itr = 0, 0, 0
        t_epoch = time.time()
        t_step = time.time()
        last_logged_step = start_step
        stop = False
        while not stop:
            # -- gather this dispatch's batches ------------------------
            try:
                gathered = []
                for _ in range(k):
                    b, _n = next(data_iter)
                    m = (
                        next(mocap_iter)
                        if (mocap_iter is not None and need_mocap)
                        else None
                    )
                    gathered.append((b, m))
            except StopIteration:
                break
            if k == 1:
                batch, mocap = gathered[0]
                state, metrics = self.train_step(
                    self.state, self._shard(batch), self._shard(mocap), rng
                )
            else:
                # Multi-step dispatch: ship k batches as separate inputs;
                # the program stacks them and runs k updates under one
                # lax.scan — amortizes dispatch latency; metrics come
                # back stacked (k, ...).
                state, metrics = self._multi_step(
                    self.state,
                    tuple(self._shard(g[0]) for g in gathered),
                    (
                        tuple(self._shard(g[1]) for g in gathered)
                        if gathered[0][1] is not None
                        else None
                    ),
                    rng,
                )
            self.state = state
            got = None  # stacked metrics, transferred lazily (one round trip)

            for j in range(k):
                # Host-side step counter (state.step mirrors it on device;
                # reading it back would add a sync per step).
                global_itr += 1
                step = start_step + global_itr

                # -- profiling (SURVEY.md §5: jax.profiler trace + timing)
                if cfg.profile_dir:
                    if step == cfg.profile_start_step:
                        jax.profiler.start_trace(cfg.profile_dir)
                    elif step == cfg.profile_end_step:
                        jax.block_until_ready(state.gen_params)
                        jax.profiler.stop_trace()

                # Scalar cadence: reading metrics is ONE device->host
                # transfer per dispatch (each float() alone would be its
                # own round trip); scalar_log_step>1 additionally skips
                # transfers so steps dispatch back-to-back (async).
                cadence = max(cfg.scalar_log_step, 1)
                # The final step of each epoch always logs, so the epoch
                # averages and `history` are never empty when the scalar
                # cadence exceeds the epoch length (scalar_log_step > 1).
                epoch_final = itr + 1 >= self.num_itr_per_epoch
                do_scalars = cadence == 1 or step % cadence == 0 or epoch_final
                if do_scalars:
                    if got is None:
                        got = jax.device_get(metrics)
                    row = (
                        jax.tree.map(lambda a: a[j], got) if k > 1 else got
                    )
                    now = time.time()
                    train_writer.scalar(
                        "perf/step_time_ms",
                        (now - t_step) * 1e3 / max(step - last_logged_step, 1),
                        step,
                    )
                    t_step = now
                    last_logged_step = step

                # -- scalars (ref :747-783) ----------------------------
                if do_scalars and cfg.use_kpr_loss:
                    v = float(row.kpr_losses[-1])
                    train_writer.scalar("generator/kpr_loss", v, step)
                    history["kpr"].append(v)
                    epoch_acc["kpr"].append(v)
                if do_scalars and cfg.use_mesh_repro_loss:
                    v = float(row.mr_losses[-1])
                    train_writer.scalar("generator/mr_loss", v, step)
                    history["mr"].append(v)
                    epoch_acc["mr"].append(v)
                if do_scalars and cfg.do_bone_evaluation:
                    train_writer.scalar(
                        "bones/avg_total_bone_length_pred",
                        float(row.bone_length_pred),
                        step,
                    )
                    train_writer.scalar(
                        "bones/avg_total_bone_length_gt",
                        float(row.bone_length_gt),
                        step,
                    )
                if do_scalars and not cfg.encoder_only:
                    train_writer.scalar(
                        "critic/critic_network_loss", float(row.critic_loss), step
                    )
                    train_writer.scalar(
                        "critic/generator_critic_loss",
                        float(row.gen_critic_losses[-1]),
                        step,
                    )
                    train_writer.scalar(
                        "critic/penalty", float(row.critic_penalty), step
                    )
                    history["critic"].append(float(row.critic_loss))
                    epoch_acc["critic"].append(float(row.critic_loss))
                    history["gen_critic"].append(float(row.gen_critic_losses[-1]))
                    epoch_acc["gen_critic"].append(float(row.gen_critic_losses[-1]))

                # -- image summaries (ref :762-771) --------------------
                if cfg.log_img_step and step % cfg.log_img_step == 0:
                    self._log_images(train_writer, gathered[j][0], step)

                # -- validation every N steps (ref :791-815) -----------
                if (
                    cfg.use_validation
                    and val_iter is not None
                    and step % cfg.validation_step_size == 0
                ):
                    try:
                        val_batch, _ = next(val_iter)
                    except StopIteration:
                        val_iter = iter(self.val_dataset)
                        val_batch, _ = next(val_iter)
                    vout = jax.device_get(
                        self.val_step(self.state, self._shard(val_batch))
                    )
                    if cfg.use_kpr_loss:
                        val_writer.scalar(
                            "generator/kpr_loss", float(vout["kpr_losses"][-1]), step
                        )
                    if cfg.use_mesh_repro_loss:
                        val_writer.scalar(
                            "generator/mr_loss", float(vout["mr_losses"][-1]), step
                        )
                    if cfg.log_img_step and step % cfg.log_img_step == 0:
                        self._log_images(val_writer, val_batch, step, vout)

                itr += 1
                self._progress(epoch, itr)

                # -- epoch boundary (ref :828-868) ---------------------
                if itr >= self.num_itr_per_epoch:
                    itr = 0
                    epoch += 1
                    dt = time.time() - t_epoch
                    if epoch % cfg.checkpoint_every_epochs == 0:
                        self.save()
                    msg = f"Finished epoch {epoch - 1}, average losses:"
                    for key, label in (
                        ("kpr", "kpr"),
                        ("mr", "mr"),
                        ("gen_critic", "gc"),
                        ("critic", "cn"),
                    ):
                        if epoch_acc[key]:
                            msg += f" {label}={np.mean(epoch_acc[key]):.2f}"
                    print(msg)
                    epoch_acc = {key: [] for key in epoch_acc}
                    if epoch >= cfg.epoch:
                        stop = True
                        break
                    eta = datetime.datetime.now() + datetime.timedelta(
                        seconds=(cfg.epoch - epoch) * dt
                    )
                    print(
                        f"Starting epoch {epoch} "
                        f"({dt / 60:.2f} min/epoch, approx done {eta})"
                    )
                    t_epoch = time.time()

                if max_steps is not None and step >= max_steps:
                    stop = True
                    break

        for w in self.writers.values():
            w.flush()
        return history

    def _progress(self, epoch: int, itr: int) -> None:
        length = 30
        stride = max(int(self.num_itr_per_epoch / length), 1)
        if itr % stride == 0 or itr == 1:
            frac = min(itr / self.num_itr_per_epoch, 1.0)
            filled = int(length * frac)
            bar = "#" * filled + "-" * (length - filled)
            print(f"\rEpoch {epoch}: |{bar}| {100 * frac:.1f}%", end="", flush=True)
        if itr >= self.num_itr_per_epoch:
            print()

    # ------------------------------------------------------------------
    @property
    def viz_step(self):
        """Per-stage val step (lazily jitted — only image logging needs
        the stacked per-stage verts)."""
        if self._viz_step is None:
            from .step import make_val_step

            self._viz_step = jax.jit(
                make_val_step(self.hmr, self.critic, self.config, return_stages=True)
            )
        return self._viz_step

    def _log_images(self, writer, batch: GenBatch, step: int, vout=None) -> None:
        """Render the reference's full visualization grid (ref
        visualize_img/draw_results, src/trainer.py:622-695): one row per
        IEF stage, each row = [skeleton gt+pred | mesh over image | mesh
        over gt silhouette]; rows vstacked per example. The seg-overlay
        panel is what makes the mesh-reprojection loss debuggable."""
        try:
            from ..viz.renderer import draw_skeleton, draw_text

            if vout is None or "stage_verts" not in vout:
                vout = jax.device_get(self.viz_step(self.state, self._shard(batch)))
            n_show = min(3, batch.images.shape[0])
            images = np.asarray(batch.images)
            kp_gt = np.asarray(batch.kp2d)
            seg_pts = np.asarray(batch.seg_points)
            seg_mask = np.asarray(batch.seg_mask)
            stage_kp = np.asarray(vout["stage_kp2d"])  # (S, N, K, 2)
            stage_verts = np.asarray(vout["stage_verts"])  # (S, N, V, 3)
            stage_cams = np.asarray(vout["stage_cams"])  # (S, N, 3)
            size = self.config.img_size
            render_mesh = self.smpl.faces is not None and len(self.smpl.faces)
            for i in range(n_show):
                img01 = (images[i] + 1) * 0.5
                # dense gt silhouette image from the padded pixel list
                seg_img = np.zeros((size, size, 3), np.float32)
                valid = seg_mask[i] > 0
                if valid.any():
                    xs = np.clip(seg_pts[i, valid, 0].round().astype(int), 0, size - 1)
                    ys = np.clip(seg_pts[i, valid, 1].round().astype(int), 0, size - 1)
                    seg_img[ys, xs] = 1.0
                gt_px = (kp_gt[i, :, :2] + 1) * 0.5 * size
                vis = kp_gt[i, :, 2] > 0
                rows = []
                for s in range(stage_kp.shape[0]):
                    pr_px = (stage_kp[s, i] + 1) * 0.5 * size
                    panel = draw_skeleton(img01, gt_px, draw_edges=False, vis=vis)
                    panel = np.asarray(
                        draw_skeleton(panel, pr_px), np.float32
                    )
                    panels = [panel]
                    if render_mesh:
                        cam = stage_cams[s, i]
                        f = 5.0
                        tz = f / max(float(cam[0]), 1e-6)
                        cam_t = np.array([cam[1], cam[2], tz])
                        cam_render = 0.5 * size * np.array([f, 1, 1])
                        v_shift = stage_verts[s, i] + cam_t
                        rend = (
                            self.renderer(v_shift, cam_render, img=img01, ssaa=2)
                            / 255.0
                        )
                        rend = draw_text(
                            rend, {"sc": cam[0], "tx": cam[1], "ty": cam[2]}
                        )
                        panels.append(np.asarray(rend, np.float32))
                        rend_seg = (
                            self.renderer(v_shift, cam_render, img=seg_img, ssaa=2)
                            / 255.0
                        )
                        panels.append(np.asarray(rend_seg, np.float32))
                    rows.append(np.hstack(panels))
                writer.image(f"vis_images/{i}", np.vstack(rows), step)
            writer.flush()
        except Exception as e:  # visualization must never kill training
            print(f"[viz] image logging failed: {e}")

    # ------------------------------------------------------------------
    def validate_checkpoint(
        self,
        draw_best_worst: bool = False,
        draw_every_image: bool = False,
        restore: bool = True,
    ) -> Dict[str, float]:
        """Full validation sweep (ref validate_checkpoint,
        src/trainer.py:882-995): mean KPR/MR loss + PCK@0.5, optional
        best/worst batch renders."""
        if restore:
            self.restore()
        assert self.val_dataset is not None, "validate requires a val dataset"
        writer = self._writer("checkpoint_val")

        qparams = None
        if self.config.encoder_int8:
            # PTQ the restored encoder once and calibrate activation
            # scales on the first val batch, then sweep the SERVING graph
            # so int8 accuracy is reported in the task metrics themselves.
            first_batch, _ = next(iter(self.val_dataset))
            variables = {
                "params": {"encoder": self.state.gen_params["encoder"]},
                "batch_stats": self.state.batch_stats,
            }
            qparams = jax.jit(
                lambda v, c: self.hmr.quantize_encoder(v, calibration_images=c)
            )(variables, first_batch.images)

        kpr_losses, mr_losses, pcks = [], [], []
        gts, preds = [], []  # accumulated for PCK curve / AUC / per-joint
        best = {"val": np.inf, "batch": None, "out": None}
        worst = {"val": -np.inf, "batch": None, "out": None}
        step = 0
        for batch, n_valid in self.val_dataset:
            out = jax.device_get(
                self.val_step(self.state, self._shard(batch), qparams)
            )
            kpr = float(out["kpr_losses"][-1])
            mr = float(out["mr_losses"][-1])
            kpr_losses.append(kpr)
            mr_losses.append(mr)
            k = out["pred_keypoints"].shape[1]
            pcks.append(
                float(
                    pck(batch.kp2d[:n_valid, :k], out["pred_keypoints"][:n_valid])
                )
            )
            gts.append(np.asarray(batch.kp2d[:n_valid, :k]))
            preds.append(np.asarray(out["pred_keypoints"][:n_valid]))
            combined = kpr + mr
            if draw_best_worst:
                if combined < best["val"]:
                    best.update(val=combined, batch=batch, out=out)
                if combined > worst["val"]:
                    worst.update(val=combined, batch=batch, out=out)
            if draw_every_image:
                self._log_images(writer, batch, step, out)
            step += 1

        if draw_best_worst and best["batch"] is not None:
            self._log_images(writer, best["batch"], 0, best["out"])
            self._log_images(writer, worst["batch"], 1, worst["out"])

        results = {
            "mean_kpr_loss": float(np.mean(kpr_losses)) if kpr_losses else float("nan"),
            "mean_mr_loss": float(np.mean(mr_losses)) if mr_losses else float("nan"),
            "pck@0.5": float(np.mean(pcks)) if pcks else float("nan"),
        }
        if gts:
            from ..ops.metrics import pck_auc, pck_curve, per_joint_pck

            gt_all = np.concatenate(gts)
            pred_all = np.concatenate(preds)
            thresholds = (0.1, 0.2, 0.3, 0.4, 0.5)
            curve = np.asarray(pck_curve(gt_all, pred_all, thresholds))
            results.update(
                {f"pck@{t}": float(v) for t, v in zip(thresholds, curve)}
            )
            results["pck_auc@0.5"] = float(pck_auc(gt_all, pred_all))
            results["per_joint_pck@0.5"] = [
                round(float(v), 4) for v in np.asarray(per_joint_pck(gt_all, pred_all))
            ]
        print(f"average kpr_loss = {results['mean_kpr_loss']}")
        print(f"average mr_loss = {results['mean_mr_loss']}")
        print(f"PCK@0.5 = {results['pck@0.5']}")
        if gts:
            print(
                "PCK curve "
                + " ".join(f"@{t}={results[f'pck@{t}']:.3f}" for t in thresholds)
                + f" | AUC@0.5={results['pck_auc@0.5']:.3f}"
            )
        return results
