"""Checkpoint / resume via Orbax.

Capability parity with the reference's tf.train.Checkpoint bundle
(ref src/trainer.py:192-198: both optimizers + all three networks + mean
theta; save every 5 epochs, src/trainer.py:835-836; latest-checkpoint
restore, src/trainer.py:719-721, :885) with the fixes SURVEY.md §5 calls
for: step-indexed checkpoints that capture the FULL train state — including
the step counter and the *trained* mean theta, both of which the reference
loses on resume (SURVEY.md §8 quirk 5).
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _manager(directory: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_train_state(
    directory: str,
    state,
    step: Optional[int] = None,
    input_state: Optional[dict] = None,
) -> None:
    """Save the full TrainState at the given step (default: state.step).

    ``input_state`` (a JSON-serializable dict, e.g. from
    data.grain_pipeline.GrainImagePipeline.get_state) is stored beside
    the step's checkpoint so training resume can replay the input stream
    from the exact sample it stopped at — a capability the reference
    lacks entirely (its tf.data iterator position is never saved,
    ref src/trainer.py:719-721 restores weights only).
    """
    step = int(state.step) if step is None else int(step)
    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()
    if input_state is not None:
        path = _input_state_path(directory, step)
        with open(path, "w") as f:
            json.dump(input_state, f, default=_json_np)


def _json_np(obj):
    if isinstance(obj, np.integer):
        return int(obj)
    if isinstance(obj, np.floating):
        return float(obj)
    raise TypeError(f"input_state value not JSON-serializable: {type(obj)}")


def _input_state_path(directory: str, step: int) -> str:
    return os.path.join(os.path.abspath(directory), str(step), "input_state.json")


def restore_input_state(directory: str, step: Optional[int] = None) -> Optional[dict]:
    """Input-stream state saved at ``step`` (default latest); None if absent."""
    step = latest_step(directory) if step is None else step
    if step is None:
        return None
    path = _input_state_path(directory, step)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_train_state(directory: str, template_state) -> Tuple[Any, Optional[int]]:
    """Restore the latest checkpoint into the template's pytree structure.

    Returns (state, step) — (template, None) when no checkpoint exists
    (mirroring the reference's silent fresh start on restore of nothing).
    """
    step = latest_step(directory)
    if step is None:
        return template_state, None
    mgr = _manager(directory)
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template_state)
    state = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    mgr.close()
    return state, step


def restore_raw(directory: str, step: Optional[int] = None) -> Tuple[Any, int]:
    """Restore a checkpoint WITHOUT a structural template.

    Returns the saved pytree as plain nested containers plus the step.
    Used for cross-run weight grafting (``Config.init_encoder_from``),
    where the donor run's optimizer/schedule structure need not match the
    current one. Raises FileNotFoundError when no checkpoint exists.
    """
    step = latest_step(directory) if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {directory!r}")
    mgr = _manager(directory)
    raw = mgr.restore(step)
    mgr.close()
    return raw, step


def restore_for_inference(directory: str, hmr, config) -> Tuple[dict, np.ndarray]:
    """Restore only what serving needs: model variables + mean theta.

    Restores WITHOUT a structural template (``restore_raw``) and extracts
    just params/batch_stats/mean_theta, so serving never depends on the
    training run's optimizer-state structure — a checkpoint trained with
    any ``Config.lr_schedule`` (constant, cosine, ...) or a future
    optimizer serves identically.

    Falls back to fresh init (like the reference's ``expect_partial``
    restore of a missing checkpoint) when the directory has no checkpoints.
    """
    from ..utils.mean_params import load_mean_theta

    step = latest_step(directory)
    if step is None:
        variables = hmr.init(
            jax.random.PRNGKey(config.seed), img_size=config.img_size
        )
        mean = load_mean_theta(config.mean_params_path)
        fresh = {
            "params": {
                "encoder": variables["params"]["encoder"],
                "regressor": variables["params"]["regressor"],
            },
            "batch_stats": variables["batch_stats"],
        }
        return fresh, np.asarray(mean, np.float32)

    raw, _ = restore_raw(directory, step)
    try:
        restored = {
            "params": {
                "encoder": raw["gen_params"]["encoder"],
                "regressor": raw["gen_params"]["regressor"],
            },
            "batch_stats": raw["batch_stats"],
        }
        mean_theta = np.asarray(raw["gen_params"]["mean_theta"], np.float32)
    except (KeyError, TypeError) as e:
        raise ValueError(
            f"checkpoint under {directory!r} has no generator subtree "
            "(is it a TrainState checkpoint?)"
        ) from e
    return restored, mean_theta
