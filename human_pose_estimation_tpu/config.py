"""Typed configuration system.

Replaces the reference's absl global-flag singleton (ref src/config.py:30-98,
src/data_config.py:22-34) with a plain dataclass + CLI overrides, while
keeping its features: auto-named run directories encoding hyperparameters
(ref src/config.py:111-176) and a params.json dump (ref src/config.py:179-190).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
from datetime import datetime
from typing import List, Optional, Sequence


@dataclasses.dataclass
class Config:
    # --- assets -----------------------------------------------------------
    smpl_model_path: str = "models/model.pkl"  # pickle or npz (ours)
    smpl_mean_params_path: str = ""  # default: neutral_smpl_mean_params.h5 next to model
    smpl_face_path: str = ""  # optional; faces usually come from the model asset

    # --- general (ref src/config.py:36-41) --------------------------------
    img_size: int = 224
    data_format: str = "NHWC"
    num_stage: int = 3
    joint_type: str = "lsp"

    # --- paths / datasets (ref src/config.py:44-55) ------------------------
    data_dir: str = "datasets"
    logs: str = "logs"
    model_dir: Optional[str] = None  # filled by prepare_dirs
    datasets: List[str] = dataclasses.field(
        default_factory=lambda: ["lsp_train", "lsp_ext"]
    )
    val_datasets: List[str] = dataclasses.field(default_factory=lambda: ["lsp_val"])
    mocap_datasets: List[str] = dataclasses.field(
        default_factory=lambda: ["CMU", "jointLim"]
    )

    # --- training (ref src/config.py:57-69) --------------------------------
    validation_step_size: int = 50
    log_img_step: int = 1000
    # Scalar-summary cadence. 1 = every step (reference behavior). Larger
    # values skip the per-step device_get so the host dispatches steps
    # back-to-back (async), hiding dispatch latency behind device compute.
    scalar_log_step: int = 1
    # Train steps executed per device dispatch (lax.scan inside the jit).
    # >1 amortizes dispatch latency over k steps; metrics come back
    # stacked so per-step scalars are preserved. Bit-identical updates.
    steps_per_call: int = 1
    epoch: int = 125
    batch_size: int = 8
    generator_lr: float = 1e-4
    critic_lr: float = 5e-4
    # Learning-rate schedule. 'constant' = reference behavior (plain Adam,
    # ref src/trainer.py:183-184). 'cosine' decays both rates to zero over
    # lr_decay_steps (must be > 0) — closes the last few percent of
    # closed-loop PA vertex error that a constant rate orbits around
    # (QUALITY.md "Extended schedule").
    lr_schedule: str = "constant"  # 'constant' | 'cosine'
    lr_decay_steps: int = 0
    kpr_loss_weight: float = 60.0
    mr_loss_weight: float = 1e-3
    critic_loss_weight: float = 1e-2

    # --- augmentation (ref src/config.py:72-74) -----------------------------
    trans_max: int = 20
    scale_max: float = 1.23
    scale_min: float = 0.8

    # --- model / loss toggles (ref src/config.py:77-90) ---------------------
    use_mesh_repro_loss: bool = False
    use_kpr_loss: bool = True
    encoder_only: bool = False
    use_gradient_penalty: bool = True
    do_bone_evaluation: bool = True
    use_validation: bool = True

    # --- checkpointing (ref src/config.py:93-95) ----------------------------
    train_from_checkpoint: bool = False
    checkpoint_dir: str = "checkpoints"
    checkpoint_every_epochs: int = 5
    # Pretrained-encoder initialization: graft the encoder weights + BN
    # statistics from another run's checkpoint directory into a FRESH
    # train state (regressor/critic/mean-theta/optimizers start anew) —
    # the framework's analog of the reference's ImageNet encoder init
    # (ref src/models.py:35-41, keras weights='imagenet'). Offline
    # pretrained evidence: QUALITY.md "Pretrained-encoder transfer".
    # Ignored when train_from_checkpoint resumes a full state.
    init_encoder_from: str = ""

    # --- debug (ref src/config.py:98) ---------------------------------------
    debug: bool = False

    # --- TPU-native knobs (no reference equivalent) -------------------------
    encoder_dtype: str = "bfloat16"  # MXU-friendly conv/matmul compute dtype
    encoder_depth: int = 50  # ResNet depth: 50 (reference) | 101 | 152
    # PTQ int8 encoder for inference/serving (models/quantize.py): 1.43x
    # serving throughput on v5e at ~0.5% output drift. Activation scales
    # calibrate from Predictor(calibration_images=...) / the serve CLI
    # --calibration glob, or lazily from the first served batch.
    encoder_int8: bool = False
    # Padded gt silhouette pixel budget per image. The reference's mesh
    # loss sums L1 over EVERY silhouette pixel (ref src/ops.py:117-137),
    # so the cap must exceed real silhouettes or MR losses aren't
    # comparable to the reference. Measured on synthetic rigged-human
    # renders at LSP crop scale (256px): mean 4.1k / p99 9.2k / max 10.2k
    # pixels (QUALITY.md); clothed real humans run larger, so the default
    # budget is 16384. Nearly free: the Pallas chamfer kernels gate each
    # pixel tile on a per-image last-active count, so cost tracks the
    # TRUE silhouette size, not the budget (PERF.md).
    max_silhouette_points: int = 16384
    # Weak-perspective gauge fix: hinge penalty pushing the predicted
    # camera scale s above cam_scale_margin. Nothing in the reference
    # forbids s < 0 (ref src/tf_smpl/projection.py:23-33), and the
    # negated-scale + 180°-roll gauge projects IDENTICALLY — image
    # metrics stay perfect while model-space geometry mirrors (QUALITY.md
    # "Model-space recovery and the monocular gauge"). The penalty is
    # exactly 0 whenever s >= margin, so in-gauge training is untouched.
    # Set to 0 for strict reference behavior.
    cam_scale_hinge: float = 10.0
    cam_scale_margin: float = 0.1
    gp_mode: str = "reference"  # 'reference' | 'per_sample' (SURVEY.md §8.7)
    mr_scale_mode: str = "reference"  # 'reference' | 'count' (SURVEY.md §8.9)
    # Which IEF stages get the (expensive) chamfer mesh-loss evaluated.
    # 'all' = reference parity: per-stage TB scalars (ref src/trainer.py:436-450).
    # 'last' = only the final stage — the only one in the generator
    # objective (ref src/trainer.py:487-496); earlier stages log 0. Cuts
    # ~30% off the full-hybrid step (PERF.md "Mesh-loss metric stages").
    mr_metric_stages: str = "all"  # 'all' | 'last'
    # Epoch accounting needs the training-set size; known dataset names
    # resolve via data/tfrecords.NUM_EXAMPLES (the reference hard-codes
    # these, ref src/data_loader.py:18-42). For custom datasets set this
    # explicitly (>0); unknown names otherwise raise instead of silently
    # treating one batch as an epoch.
    num_examples_override: int = 0
    # Shallow-encoder override for smoke runs / CI of the CLI path:
    # comma-separated ResNet stage block counts (e.g. "1,1,1,1"). Empty =
    # the full encoder_depth architecture (production default).
    encoder_stage_sizes: str = ""
    seed: int = 0
    input_pipeline: str = "tfrecord"  # 'tfrecord' | 'npz' | 'native' (C++) | 'grain'
    mesh_axis: str = "data"  # DP mesh axis name
    remat_encoder: bool = False  # jax.checkpoint the encoder in training
    fuse_preprocess: bool = False  # augmentation + mocap SMPL inside the train step
    profile_dir: str = ""  # when set, capture a jax.profiler trace here
    profile_start_step: int = 10
    profile_end_step: int = 15

    def __post_init__(self):
        if self.data_format != "NHWC":
            # The reference exposes NCHW for cuDNN (src/config.py:38,
            # src/trainer.py:368-371); TPU/XLA is NHWC-native and the
            # transpose would be pure overhead here.
            raise ValueError("data_format must be 'NHWC' on TPU")
        if self.joint_type not in ("cocoplus", "lsp"):
            raise ValueError("joint_type must be 'cocoplus' or 'lsp'")
        if self.input_pipeline not in ("tfrecord", "npz", "native", "grain"):
            raise ValueError(
                "input_pipeline must be 'tfrecord', 'npz', 'native', or 'grain'"
            )
        if self.encoder_depth not in (50, 101, 152):
            raise ValueError("encoder_depth must be 50, 101, or 152")
        if self.mr_metric_stages not in ("all", "last"):
            raise ValueError("mr_metric_stages must be 'all' or 'last'")
        if self.lr_schedule not in ("constant", "cosine"):
            raise ValueError("lr_schedule must be 'constant' or 'cosine'")
        if self.lr_schedule == "cosine" and self.lr_decay_steps <= 0:
            raise ValueError("lr_schedule='cosine' requires lr_decay_steps > 0")

    @property
    def mean_params_path(self) -> str:
        if self.smpl_mean_params_path:
            return self.smpl_mean_params_path
        return os.path.join(
            os.path.dirname(self.smpl_model_path), "neutral_smpl_mean_params.h5"
        )

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def _add_args(parser: argparse.ArgumentParser) -> None:
    for f in dataclasses.fields(Config):
        name = "--" + f.name
        if f.type in ("bool", bool):
            default = f.default
            parser.add_argument(
                name,
                type=lambda s: s.lower() in ("1", "true", "yes"),
                default=default,
                help=f"(default {default})",
            )
        elif f.type in ("List[str]", List[str]) or "List" in str(f.type):
            parser.add_argument(
                name, type=lambda s: s.split(","), default=None, help="comma separated"
            )
        else:
            typ = {"int": int, "float": float}.get(str(f.type), str)
            parser.add_argument(name, type=typ, default=None)


def parse_config(argv: Optional[Sequence[str]] = None) -> Config:
    """Build a Config from CLI args (unset args keep dataclass defaults)."""
    parser = argparse.ArgumentParser(description="human_pose_estimation_tpu")
    _add_args(parser)
    ns, _ = parser.parse_known_args(argv)
    cfg = Config()
    overrides = {}
    for f in dataclasses.fields(Config):
        v = getattr(ns, f.name, None)
        if v is not None:
            overrides[f.name] = v
    return cfg.replace(**overrides)


def run_name(cfg: Config, prefix: str = "HMR") -> str:
    """Auto-named run directory encoding hyperparameters, feature-parity
    with ref prepare_dirs (src/config.py:111-176)."""
    parts = [prefix]
    if cfg.num_stage != 3:
        parts.append(f"T{cfg.num_stage}")
    parts.append(f"_{cfg.epoch}e_")
    post = ["-".join(sorted(cfg.datasets))]
    if sorted(cfg.mocap_datasets) != sorted(["CMU", "H3.6", "jointLim"]):
        post.append("-".join(cfg.mocap_datasets))
    post.append(f"Elr{cfg.generator_lr:.0e}")
    if cfg.kpr_loss_weight != 1:
        post.append(f"kp-weight{cfg.kpr_loss_weight:g}")
    if not cfg.encoder_only:
        post.append(f"Dlr{cfg.critic_lr:.0e}")
        if cfg.critic_loss_weight != 1:
            post.append(f"d-weight{cfg.critic_loss_weight:g}")
    if cfg.use_mesh_repro_loss:
        post.append("mr")
    if cfg.use_kpr_loss:
        post.append("kp")
    if cfg.trans_max != 20:
        post.append(f"transmax-{cfg.trans_max}")
    if cfg.scale_max != 1.23:
        post.append(f"scmax_{cfg.scale_max:.3g}")
    if cfg.scale_min != 0.8:
        post.append(f"scmin-{cfg.scale_min:.3g}")
    stamp = datetime.now().strftime("%b%d_%H%M")
    return "_".join(parts) + "_" + "_".join(post) + "_" + stamp


def prepare_dirs(cfg: Config, prefix: str = "HMR") -> Config:
    """Create the run/log directories and fill cfg.model_dir."""
    cfg = cfg.replace(model_dir=os.path.join(cfg.logs, run_name(cfg, prefix)))
    for path in (cfg.logs, cfg.model_dir, cfg.checkpoint_dir):
        os.makedirs(path, exist_ok=True)
    return cfg


def save_config(cfg: Config) -> str:
    """Dump the full config to params.json in the run dir
    (feature parity with ref save_config, src/config.py:179-190)."""
    assert cfg.model_dir, "call prepare_dirs first"
    path = os.path.join(cfg.model_dir, "params.json")
    with open(path, "w") as fp:
        json.dump(dataclasses.asdict(cfg), fp, indent=4, sort_keys=True)
    return path


def load_config(path: str) -> Config:
    with open(path) as fp:
        raw = json.load(fp)
    known = {f.name for f in dataclasses.fields(Config)}
    return Config(**{k: v for k, v in raw.items() if k in known})
