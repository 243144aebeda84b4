"""Closed-loop training-quality validation.

Ground truth is generated FROM the synthetic rigged human body model
(data/synthetic.py): sample (theta, beta, cam) -> render RGB +
silhouette -> project keypoints -> train the full hybrid recipe
(keypoint + mesh-reprojection + critic/WGAN-GP) -> assert pose recovery.

This converts "parts are parity-exact" into "the capability works": the
reference's only quality oracle is a licensed-data eval it cannot run
hermetically (ref src/trainer.py:882-995, report.pdf Tables 1-2). The
full-scale on-chip version of this experiment lives in
benchmarks/quality_bench.py (results in QUALITY.md); this CPU-sized
variant guards the loop itself: the recipe must measurably learn pose
from the rendered images within a few hundred steps.
"""
import os

import numpy as np
import pytest

import jax

from human_pose_estimation_tpu.config import Config
from human_pose_estimation_tpu.core.smpl import save_model_npz
from human_pose_estimation_tpu.data.pipeline import ImagePipeline, MocapPipeline
from human_pose_estimation_tpu.data.synthetic import generate_closed_loop_dataset
from human_pose_estimation_tpu.train.trainer import Trainer
from human_pose_estimation_tpu.utils.synthetic_human import synthetic_human_model

IMG = 64
N_TRAIN = 48
N_VAL = 16


@pytest.fixture(scope="module")
def closed_loop_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("closed_loop")
    model = synthetic_human_model(num_verts=900, ring_size=8)
    stats = generate_closed_loop_dataset(
        str(tmp),
        model,
        n_train=N_TRAIN,
        n_val=N_VAL,
        n_mocap=512,
        img_size=IMG,
        seed=0,
        fmt="tfrecord",
        train_name="synth_train",
        val_name="synth_val",
    )
    save_model_npz(model, str(tmp / "model.npz"))
    return str(tmp), stats


def test_dataset_statistics(closed_loop_dir):
    out_dir, stats = closed_loop_dir
    assert stats["n_train"] == N_TRAIN and stats["n_val"] == N_VAL
    # people must actually be in frame: silhouettes are hundreds of pixels
    # even at 64px (the 224px full-scale distribution is measured in
    # QUALITY.md and sets the max_silhouette_points default)
    assert stats["sil_pixels_p50"] > 100
    gt = np.load(os.path.join(out_dir, "ground_truth.npz"))
    assert gt["synth_train_theta"].shape == (N_TRAIN, 72)
    assert gt["synth_val_cam"].shape == (N_VAL, 3)


def test_kp_only_overfit_smoke(closed_loop_dir):
    """UNGATED learning guard (the reference's lsp_single/lsp_16 overfit
    idiom, ref src/data_loader.py:19-32, as CI): kp-only supervised
    training on the rendered set must halve the train keypoint loss
    within 300 steps, and val PCK@0.5 must rise over the second half.
    (Val PCK vs step 0 is NOT monotone early: eval uses BN moving
    averages, which start at the accidental (0,1)/mean-theta optimum and
    pass through a mid-convergence dip around step ~150 before the
    trained statistics take over.) The run is deterministic per machine
    but the 300-step endpoint is NOT machine-portable: XLA:CPU codegen
    differences moved it from 0.66 -> 0.19 -> 0.67 on one host to
    0.66 -> 0.31 -> 0.41 on another (identical seeds), so the
    assertions are the loss halving, the second-half rise, and a PCK
    floor comfortably above the mid-dip — not a comparison against the
    init's accidental optimum. Runs in the default suite — a regression
    in the learning path (loss wiring, optimizer, label augmentation)
    fails here instead of hiding behind the env-gated full-recipe test
    below."""
    out_dir, _ = closed_loop_dir
    cfg = Config(
        smpl_model_path=os.path.join(out_dir, "model.npz"),
        data_dir=out_dir,
        logs=os.path.join(out_dir, "logs"),
        model_dir=os.path.join(out_dir, "logs", "smoke"),
        checkpoint_dir=os.path.join(out_dir, "ckpt_smoke"),
        datasets=["synth_train"],
        val_datasets=["synth_val"],
        num_examples_override=N_TRAIN,
        img_size=IMG,
        batch_size=8,
        epoch=1000,  # bounded by max_steps below
        generator_lr=3e-4,
        use_kpr_loss=True,
        use_mesh_repro_loss=False,  # kp-only: no chamfer, no critic
        encoder_only=True,
        do_bone_evaluation=False,
        max_silhouette_points=256,
        encoder_dtype="float32",
        use_validation=False,
        log_img_step=0,
        checkpoint_every_epochs=10**6,
        scalar_log_step=10,
    )
    files = [os.path.join(out_dir, "synth_train.tfrecords")]
    val_files = [os.path.join(out_dir, "synth_val.tfrecords")]
    trainer = Trainer(
        cfg,
        dataset=ImagePipeline(cfg, files=files, mode="train", canvas=IMG),
        val_dataset=ImagePipeline(
            cfg, files=val_files, mode="val", augment=False, canvas=IMG
        ),
        encoder_stage_sizes=(1, 1, 1, 1),
    )

    pck0 = trainer.validate_checkpoint(restore=False)["pck@0.5"]
    h1 = trainer.train(max_steps=150)
    pck_mid = trainer.validate_checkpoint(restore=False)["pck@0.5"]
    h2 = trainer.train(max_steps=150)  # 150 more -> global step 300
    pck1 = trainer.validate_checkpoint(restore=False)["pck@0.5"]

    kpr = np.asarray(h1["kpr"] + h2["kpr"])
    head, tail = kpr[:10].mean(), kpr[-10:].mean()
    print(
        f"smoke: train kpr {head:.2f} -> {tail:.2f}, "
        f"PCK {pck0:.3f} -> {pck_mid:.3f} -> {pck1:.3f}"
    )
    assert np.isfinite(kpr).all()
    assert tail < 0.5 * head, (head, tail)
    # second-half rise (the BN moving stats are converging by now)
    assert pck1 > pck_mid + 0.05, (pck_mid, pck1)
    # and well clear of the mid-convergence dip (~0.2-0.31 measured);
    # the endpoint itself is machine-dependent (0.41 vs 0.67, docstring)
    assert pck1 >= 0.35, (pck0, pck_mid, pck1)


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("HPE_RUN_SLOW", "0") in ("", "0", "false"),
    reason="~20 min of CPU training; run with HPE_RUN_SLOW=1 "
    "(full-scale on-chip version: benchmarks/quality_bench.py -> QUALITY.md)",
)
def test_full_hybrid_recipe_learns_pose(closed_loop_dir):
    """Train the COMPLETE recipe (kp + mesh + critic + GP) a few hundred
    steps on rendered ground truth; PCK@0.5 must improve substantially
    and the keypoint loss must drop."""
    out_dir, _ = closed_loop_dir
    cfg = Config(
        smpl_model_path=os.path.join(out_dir, "model.npz"),
        data_dir=out_dir,
        logs=os.path.join(out_dir, "logs"),
        model_dir=os.path.join(out_dir, "logs", "run"),
        checkpoint_dir=os.path.join(out_dir, "ckpt"),
        datasets=["synth_train"],
        val_datasets=["synth_val"],
        mocap_datasets=["CMU"],
        num_examples_override=N_TRAIN,
        img_size=IMG,
        batch_size=8,
        epoch=1000,  # bounded by max_steps below
        generator_lr=3e-4,
        use_mesh_repro_loss=True,
        use_kpr_loss=True,
        use_gradient_penalty=True,
        max_silhouette_points=1024,
        encoder_dtype="float32",
        use_validation=False,
        log_img_step=0,
        checkpoint_every_epochs=10**6,
        scalar_log_step=10,
    )
    files = [os.path.join(out_dir, "synth_train.tfrecords")]
    val_files = [os.path.join(out_dir, "synth_val.tfrecords")]
    train_pipe = ImagePipeline(cfg, files=files, mode="train", canvas=IMG)
    trainer = Trainer(
        cfg,
        dataset=train_pipe,
        val_dataset=ImagePipeline(
            cfg, files=val_files, mode="val", augment=False, canvas=IMG
        ),
        encoder_stage_sizes=(1, 1, 1, 1),
    )
    trainer.mocap_dataset = MocapPipeline(cfg, trainer.smpl, shuffle=False)

    def val_pck():
        res = trainer.validate_checkpoint(restore=False)
        return res["pck@0.5"], res["mean_kpr_loss"]

    pck0, kpr0 = val_pck()
    history = trainer.train(max_steps=300)
    pck1, kpr1 = val_pck()

    print(f"closed loop: PCK {pck0:.3f} -> {pck1:.3f}, kpr {kpr0:.2f} -> {kpr1:.2f}")
    assert kpr1 < 0.7 * kpr0, (kpr0, kpr1)
    assert pck1 > pck0 + 0.15, (pck0, pck1)
    assert np.isfinite(history["kpr"]).all()
    # the adversarial game actually ran
    assert len(history["critic"]) > 0 and np.isfinite(history["critic"]).all()
