"""Serving-restore robustness: restore_for_inference must not depend on
the training run's optimizer structure (ADVICE r3: a cosine-trained
checkpoint has a ScaleByScheduleState where the constant default has
EmptyState, so a template built with the default schedule cannot
StandardRestore it)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from human_pose_estimation_tpu.config import Config
from human_pose_estimation_tpu.core.smpl import save_model_npz
from human_pose_estimation_tpu.models.critic import Critic
from human_pose_estimation_tpu.models.hmr import HMR
from human_pose_estimation_tpu.train.state import create_train_state
from human_pose_estimation_tpu.utils import checkpoint as ckpt
from human_pose_estimation_tpu.utils.assets import synthetic_mean_params

IMG = 56


def _tree_allclose(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


@pytest.mark.parametrize("schedule,decay", [("constant", 0), ("cosine", 10)])
def test_restore_for_inference_is_schedule_agnostic(
    tmp_path, tiny_model, schedule, decay
):
    hmr = HMR(
        tiny_model,
        num_stage=3,
        joint_type="lsp",
        encoder_stage_sizes=(1, 1, 1, 1),
        encoder_dtype=jnp.float32,
    )
    state = create_train_state(
        jax.random.PRNGKey(0),
        hmr,
        Critic(),
        synthetic_mean_params()[None, :],
        1e-4,
        5e-4,
        img_size=IMG,
        lr_schedule=schedule,
        lr_decay_steps=decay,
    )
    ckpt_dir = str(tmp_path / "ck")
    ckpt.save_train_state(ckpt_dir, state, step=3)

    model_path = str(tmp_path / "model.npz")
    save_model_npz(tiny_model, model_path)
    # Config deliberately does NOT carry the training schedule: the
    # serving path must restore regardless.
    cfg = Config(
        smpl_model_path=model_path,
        checkpoint_dir=ckpt_dir,
        img_size=IMG,
    )
    variables, mean_theta = ckpt.restore_for_inference(ckpt_dir, hmr, cfg)
    _tree_allclose(variables["params"]["encoder"], state.gen_params["encoder"])
    _tree_allclose(
        variables["params"]["regressor"], state.gen_params["regressor"]
    )
    _tree_allclose(variables["batch_stats"], state.batch_stats)
    np.testing.assert_allclose(
        mean_theta, np.asarray(state.gen_params["mean_theta"]), atol=1e-6
    )


def test_restore_for_inference_rejects_foreign_checkpoint(tmp_path, tiny_model):
    ckpt_dir = str(tmp_path / "ck")
    ckpt.save_train_state(
        ckpt_dir, {"not_a": np.zeros(3), "train_state": np.ones(2)}, step=0
    )
    model_path = str(tmp_path / "model.npz")
    save_model_npz(tiny_model, model_path)
    cfg = Config(
        smpl_model_path=model_path, checkpoint_dir=ckpt_dir, img_size=IMG
    )
    hmr = HMR(
        tiny_model,
        encoder_stage_sizes=(1, 1, 1, 1),
        encoder_dtype=jnp.float32,
    )
    with pytest.raises(ValueError, match="no generator subtree"):
        ckpt.restore_for_inference(ckpt_dir, hmr, cfg)
