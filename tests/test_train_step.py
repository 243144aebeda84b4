"""Integration tests: fused train step (generator + critic + GP) on a tiny
model, data-parallel over the 8-device virtual CPU mesh, plus an
overfit-decreases-loss smoke test (SURVEY.md §4: the reference's
tiny-dataset overfit configs become real tests)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from human_pose_estimation_tpu.config import Config
from human_pose_estimation_tpu.models.critic import Critic
from human_pose_estimation_tpu.models.hmr import HMR
from human_pose_estimation_tpu.parallel import mesh as pmesh
from human_pose_estimation_tpu.train.state import create_train_state
from human_pose_estimation_tpu.train.step import (
    GenBatch,
    MocapBatch,
    make_train_step,
    make_val_step,
)
from human_pose_estimation_tpu.utils.assets import synthetic_mean_params


IMG = 56
BATCH = 8
NSIL = 32


@pytest.fixture(scope="module")
def setup(request):
    from human_pose_estimation_tpu.utils.assets import synthetic_model

    smpl = synthetic_model(num_verts=120, seed=0)
    cfg = Config(
        img_size=IMG,
        batch_size=BATCH,
        use_mesh_repro_loss=True,
        use_kpr_loss=True,
        encoder_only=False,
        use_gradient_penalty=True,
        encoder_dtype="float32",
    )
    hmr = HMR(smpl, num_stage=3, joint_type="lsp", encoder_stage_sizes=(1, 1, 1, 1))
    critic = Critic()
    state = create_train_state(
        jax.random.PRNGKey(0),
        hmr,
        critic,
        synthetic_mean_params()[None, :],
        cfg.generator_lr,
        cfg.critic_lr,
        img_size=IMG,
    )
    return smpl, cfg, hmr, critic, state


def _batches(rng, n=BATCH):
    images = rng.rand(n, IMG, IMG, 3).astype(np.float32) * 2 - 1
    seg_points = (rng.rand(n, NSIL, 2) * IMG).astype(np.float32)
    seg_mask = (rng.rand(n, NSIL) > 0.25).astype(np.float32)
    kp2d = rng.rand(n, 14, 3).astype(np.float32) * 2 - 1
    kp2d[..., 2] = (rng.rand(n, 14) > 0.2).astype(np.float32)
    gen = GenBatch(
        images=jnp.asarray(images),
        seg_points=jnp.asarray(seg_points),
        seg_mask=jnp.asarray(seg_mask),
        kp2d=jnp.asarray(kp2d),
    )
    m = n * 3
    mocap = MocapBatch(
        joints=jnp.asarray(rng.randn(m, 14, 3).astype(np.float32)),
        shapes=jnp.asarray(rng.randn(m, 10).astype(np.float32) * 0.3),
        rotations=jnp.asarray(
            np.tile(np.eye(3, dtype=np.float32), (m, 23, 1, 1))
        ),
    )
    return gen, mocap


def test_train_step_runs_and_updates(setup, rng):
    smpl, cfg, hmr, critic, state = setup
    step_fn = jax.jit(make_train_step(hmr, critic, cfg))
    gen, mocap = _batches(rng)
    new_state, metrics = step_fn(state, gen, mocap, jax.random.PRNGKey(1))

    assert int(new_state.step) == 1
    for name in (
        "kpr_losses",
        "mr_losses",
        "gen_critic_losses",
        "generator_loss",
        "critic_loss",
        "critic_penalty",
        "bone_length_pred",
        "bone_length_gt",
    ):
        v = np.asarray(getattr(metrics, name))
        assert np.isfinite(v).all(), name
    assert metrics.kpr_losses.shape == (3,)

    # Params actually moved (encoder, regressor, mean theta, critic).
    def moved(a, b):
        return np.abs(np.asarray(a) - np.asarray(b)).max() > 0

    assert moved(
        state.gen_params["mean_theta"], new_state.gen_params["mean_theta"]
    )
    old_leaf = jax.tree.leaves(state.gen_params["regressor"])[0]
    new_leaf = jax.tree.leaves(new_state.gen_params["regressor"])[0]
    assert moved(old_leaf, new_leaf)
    # (a head bias has exactly zero WGAN gradient — it cancels in
    # mean(fake) - mean(real) — so check a kernel)
    assert moved(
        state.critic_params["kcs_dense"]["kernel"],
        new_state.critic_params["kcs_dense"]["kernel"],
    )
    # BN stats updated.
    assert moved(
        jax.tree.leaves(state.batch_stats)[0],
        jax.tree.leaves(new_state.batch_stats)[0],
    )


def test_train_step_data_parallel_matches_single_device(setup, rng):
    """The same step under a sharded batch must produce (numerically) the
    same new state as unsharded execution — DP is a layout, not a model
    change."""
    smpl, cfg, hmr, critic, state = setup
    step_fn = make_train_step(hmr, critic, cfg)
    gen, mocap = _batches(rng)
    key = jax.random.PRNGKey(7)

    ref_state, ref_metrics = jax.jit(step_fn)(state, gen, mocap, key)

    mesh = pmesh.make_mesh()
    gen_sharded = pmesh.shard_batch(gen, mesh)
    mocap_sharded = pmesh.shard_batch(mocap, mesh)
    state_rep = pmesh.replicate(state, mesh)
    dp_state, dp_metrics = jax.jit(step_fn)(state_rep, gen_sharded, mocap_sharded, key)

    np.testing.assert_allclose(
        np.asarray(ref_metrics.generator_loss),
        np.asarray(dp_metrics.generator_loss),
        rtol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ref_state.gen_params["mean_theta"]),
        np.asarray(dp_state.gen_params["mean_theta"]),
        atol=1e-5,
    )


def test_overfit_decreases_loss(setup, rng):
    """A few steps on one fixed batch must reduce the generator loss
    (the reference's lsp_16-style overfit smoke, SURVEY.md §4)."""
    smpl, cfg, hmr, critic, state = setup
    cfg2 = cfg.replace(use_mesh_repro_loss=False, encoder_only=True,
                       generator_lr=5e-5)
    step_fn = jax.jit(make_train_step(hmr, critic, cfg2))
    gen, _ = _batches(rng)
    # Target = the model's own initial prediction shifted by a constant:
    # a smoothly reachable optimum for the IEF head.
    val_fn = jax.jit(make_val_step(hmr, critic, cfg2))
    pred0 = np.asarray(val_fn(state, gen)["pred_keypoints"])
    kp_gt = np.concatenate([pred0 + 0.2, np.ones((BATCH, 14, 1), np.float32)], -1)
    gen = gen._replace(kp2d=jnp.asarray(kp_gt))
    losses = []
    for i in range(20):
        state, metrics = step_fn(state, gen, None, jax.random.PRNGKey(2))
        losses.append(float(metrics.kpr_losses[-1]))
    assert np.mean(losses[-3:]) < 0.8 * np.mean(losses[:3]), losses


def test_mr_metric_stages_last_identical_update(setup, rng):
    """mr_metric_stages='last' drops only metric-stage chamfer evals: the
    parameter update is bit-identical (early-stage mesh losses never enter
    the generator objective) and the last-stage mr metric matches."""
    smpl, cfg, hmr, critic, state = setup
    gen, mocap = _batches(rng)
    step_all = jax.jit(make_train_step(hmr, critic, cfg))
    step_last = jax.jit(
        make_train_step(hmr, critic, cfg.replace(mr_metric_stages="last"))
    )
    sa, ma = step_all(state, gen, mocap, jax.random.PRNGKey(3))
    sl, ml = step_last(state, gen, mocap, jax.random.PRNGKey(3))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        sa.gen_params,
        sl.gen_params,
    )
    np.testing.assert_array_equal(
        np.asarray(ma.mr_losses[-1]), np.asarray(ml.mr_losses[-1])
    )
    assert np.asarray(ml.mr_losses[:-1]).max() == 0.0
    assert np.asarray(ma.mr_losses[:-1]).min() > 0.0


def test_val_step(setup, rng):
    smpl, cfg, hmr, critic, state = setup
    val_fn = jax.jit(make_val_step(hmr, critic, cfg))
    gen, _ = _batches(rng)
    out = val_fn(state, gen)
    assert np.isfinite(np.asarray(out["kpr_losses"])).all()
    assert out["verts"].shape == (BATCH, 120, 3)
    assert out["pred_keypoints"].shape == (BATCH, 14, 2)


def test_fused_step_matches_unfused(setup, rng):
    """The one-dispatch fused step (deterministic preprocessing) must equal
    preprocessing + SMPL-forward + step as separate programs."""
    from human_pose_estimation_tpu.core.smpl import smpl_forward
    from human_pose_estimation_tpu.data.augment import (
        AugmentConfig,
        augment_batch,
        extract_silhouette,
    )
    from human_pose_estimation_tpu.train.step import (
        HostBatch,
        make_fused_train_step,
    )

    smpl, cfg, hmr, critic, state = setup
    cfg2 = cfg.replace(max_silhouette_points=NSIL)
    canvas = 96
    n = BATCH
    images = (rng.rand(n, canvas, canvas, 3) * 255).astype(np.uint8)
    segs = ((rng.rand(n, canvas, canvas, 1) > 0.6) * 255).astype(np.uint8)
    hw = np.tile(np.asarray([[80, 72]], np.int32), (n, 1))
    centers = np.tile(np.asarray([[36, 40]], np.int32), (n, 1))
    labels = rng.rand(n, 3, 19).astype(np.float32) * 60
    labels[:, 2] = 1.0
    host = HostBatch(
        image=jnp.asarray(images),
        seg=jnp.asarray(segs),
        hw=jnp.asarray(hw),
        center=jnp.asarray(centers),
        label=jnp.asarray(labels),
    )
    pose = jnp.asarray(rng.randn(n * 3, 72).astype(np.float32) * 0.2)
    shape = jnp.asarray(rng.randn(n * 3, 10).astype(np.float32) * 0.4)
    key = jax.random.PRNGKey(3)

    fused = jax.jit(make_fused_train_step(hmr, critic, cfg2, smpl, augment=False))
    f_state, f_metrics = fused(state, host, (pose, shape), key)

    # manual composition
    aug_cfg = AugmentConfig(out_size=cfg2.img_size, augment=False)
    crops, crop_segs, label = augment_batch(
        host.image, host.seg, host.hw, host.center, host.label, None, aug_cfg
    )
    pts, mask = extract_silhouette(crop_segs, cfg2.max_silhouette_points)
    batch = GenBatch(images=crops, seg_points=pts, seg_mask=mask, kp2d=label)
    out = smpl_forward(smpl, shape, pose, joint_type="cocoplus")
    mocap = MocapBatch(joints=out.joints, shapes=shape,
                       rotations=out.rotations[:, 1:])
    step = jax.jit(make_train_step(hmr, critic, cfg2))
    u_state, u_metrics = step(state, batch, mocap, key)

    np.testing.assert_allclose(
        np.asarray(f_metrics.generator_loss),
        np.asarray(u_metrics.generator_loss),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(f_metrics.critic_loss),
        np.asarray(u_metrics.critic_loss),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(f_state.gen_params["mean_theta"]),
        np.asarray(u_state.gen_params["mean_theta"]),
        atol=1e-6,
    )


def test_multi_step_matches_sequential(setup, rng):
    """make_multi_step(k): one scanned dispatch == k sequential step
    calls (same data, same PRNG-per-step via the state.step fold-in),
    with stacked per-step metrics. Agreement is to float32 rounding:
    XLA fuses the scanned body differently than the standalone jit."""
    from human_pose_estimation_tpu.train.step import make_multi_step

    smpl, cfg, hmr, critic, state = setup
    step_fn = make_train_step(hmr, critic, cfg)
    k = 3
    data = [_batches(rng) for _ in range(k)]
    key = jax.random.PRNGKey(7)

    seq_state = state
    seq_metrics = []
    single = jax.jit(step_fn)
    for gen, mocap in data:
        seq_state, m = single(seq_state, gen, mocap, key)
        seq_metrics.append(m)

    multi = jax.jit(make_multi_step(step_fn, k))
    multi_state, multi_metrics = multi(
        state,
        tuple(d[0] for d in data),
        tuple(d[1] for d in data),
        key,
    )

    assert int(multi_state.step) == int(seq_state.step)
    # Params cannot discriminate here: Adam renormalizes, so float32
    # fusion-order noise amplifies to ~lr-scale param drift either way.
    # Per-step LOSSES are the discriminating signal — a wrong batch
    # order / wrong per-step PRNG shifts them by O(1), while legitimate
    # rounding drift stays ~1e-4 relative.
    for j, m in enumerate(seq_metrics):
        rtol = 1e-5 if j == 0 else 5e-3  # first step: identical inputs
        np.testing.assert_allclose(
            np.asarray(multi_metrics.kpr_losses[j]),
            np.asarray(m.kpr_losses),
            rtol=rtol,
        )
        np.testing.assert_allclose(
            np.asarray(multi_metrics.critic_loss[j]),
            np.asarray(m.critic_loss),
            rtol=rtol,
            atol=1e-4,
        )
    drift = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
            multi_state.gen_params,
            seq_state.gen_params,
        )
    )
    assert max(drift) < 5e-3  # bounded by a few Adam steps of rounding


def test_cam_scale_hinge_wiring(setup, rng):
    """Gauge fix (Config.cam_scale_hinge): the hinge penalty on the
    weak-perspective camera scale must (a) be EXACTLY inactive — loss and
    update untouched — whenever every predicted s clears the margin, and
    (b) raise the generator loss when s falls below it. Nothing in the
    reference forbids s<0 (ref src/tf_smpl/projection.py:23-33); the
    penalty exists to keep training out of the mirrored s<0 gauge
    (QUALITY.md "Model-space recovery and the monocular gauge")."""
    smpl, cfg, hmr, critic, state = setup
    gen, mocap = _batches(rng)
    key = jax.random.PRNGKey(3)

    # Predicted last-stage scales at this init (val-mode; train-mode
    # values differ only by dropout noise, which +-5 dwarfs).
    val = jax.jit(make_val_step(hmr, critic, cfg))
    s = np.asarray(val(state, gen)["cams"])[:, 0]
    lo = float(s.min()) - 5.0  # margin below every s: hinge exactly 0
    hi = float(s.max()) + 5.0  # margin above every s: hinge active

    def run(hinge, margin):
        fn = jax.jit(
            make_train_step(
                hmr,
                critic,
                cfg.replace(cam_scale_hinge=hinge, cam_scale_margin=margin),
            )
        )
        return fn(state, gen, mocap, key)

    st_off, m_off = run(0.0, lo)
    st_on, m_on = run(10.0, lo)
    # Inactive hinge: generator loss and the resulting params identical.
    np.testing.assert_allclose(
        float(m_on.generator_loss), float(m_off.generator_loss), rtol=1e-6
    )
    leaves_off = jax.tree.leaves(st_off.gen_params)
    leaves_on = jax.tree.leaves(st_on.gen_params)
    for a, b in zip(leaves_off, leaves_on):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # Active hinge: loss strictly higher, params pushed differently.
    _, m_hi = run(10.0, hi)
    assert float(m_hi.generator_loss) > float(m_off.generator_loss) + 1.0


def test_cosine_lr_schedule(setup, rng):
    """lr_schedule='cosine' (a TPU-native extension; default 'constant'
    is the reference's plain Adam, ref src/trainer.py:183-184): the
    schedule must wire through state creation AND the step (their
    optimizer-state structures must agree), decay the applied update
    over time, and validate its decay_steps requirement."""
    from human_pose_estimation_tpu.train.state import make_optimizers

    smpl, cfg, hmr, critic, state = setup
    gen, mocap = _batches(rng)
    key = jax.random.PRNGKey(7)
    ccfg = cfg.replace(lr_schedule="cosine", lr_decay_steps=4)

    # State and step built with the SAME schedule: runs and updates.
    cstate = create_train_state(
        jax.random.PRNGKey(0),
        hmr,
        critic,
        synthetic_mean_params()[None, :],
        ccfg.generator_lr,
        ccfg.critic_lr,
        img_size=IMG,
        lr_schedule="cosine",
        lr_decay_steps=4,
    )
    fn = jax.jit(make_train_step(hmr, critic, ccfg))
    s1, _ = fn(cstate, gen, mocap, key)
    assert int(s1.step) == 1

    # Past decay_steps the cosine rate is 0: parameters freeze.
    s = s1
    for i in range(5):
        s, _ = fn(s, gen, mocap, jax.random.fold_in(key, i))
    frozen, _ = fn(s, gen, mocap, jax.random.fold_in(key, 99))
    for a, b in zip(
        jax.tree.leaves(s.gen_params), jax.tree.leaves(frozen.gen_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Config validation: cosine requires decay steps.
    with pytest.raises(ValueError):
        cfg.replace(lr_schedule="cosine", lr_decay_steps=0)
    with pytest.raises(ValueError):
        make_optimizers(1e-4, 5e-4, "cosine", 0)
