"""Training state: parameters, optimizer states, BN statistics, step.

Replaces the reference's object soup (two Keras optimizers + three model
objects + a tf.train.Checkpoint, ref src/trainer.py:183-198) with a single
pytree that jit/pjit can thread, donate, shard, and checkpoint atomically.

Note (SURVEY.md §8 quirk 5): the reference keeps TWO mean-theta variables
and checkpoints the untrained one; here the *trained* mean theta is a
first-class member of the generator params and is checkpointed.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

# Keras Adam's default epsilon is 1e-7 (the reference uses default-config
# Adam, ref src/trainer.py:183-184); optax's default is 1e-8.
ADAM_EPS = 1e-7


def _lr(base: float, schedule: str, decay_steps: int):
    if schedule == "constant":
        return base
    if schedule == "cosine":
        if decay_steps <= 0:
            raise ValueError("lr_schedule='cosine' requires lr_decay_steps > 0")
        return optax.cosine_decay_schedule(base, decay_steps)
    raise ValueError(f"unknown lr_schedule {schedule!r}")


def make_optimizers(
    generator_lr: float,
    critic_lr: float,
    lr_schedule: str = "constant",
    lr_decay_steps: int = 0,
):
    """Adam pair for the generator/critic (ref src/trainer.py:183-184).

    ``lr_schedule='cosine'`` decays BOTH rates to zero over
    ``lr_decay_steps`` — an extension past the reference's constant rates
    (default 'constant' = reference behavior). The optimizer-state
    STRUCTURE differs between the two (schedules carry a step count), so
    every constructor of the same TrainState must agree on the schedule.
    """
    gen_tx = optax.adam(
        _lr(generator_lr, lr_schedule, lr_decay_steps), eps=ADAM_EPS
    )
    critic_tx = optax.adam(
        _lr(critic_lr, lr_schedule, lr_decay_steps), eps=ADAM_EPS
    )
    return gen_tx, critic_tx


@struct.dataclass
class TrainState:
    step: jax.Array  # scalar int32
    gen_params: Any  # {'encoder', 'regressor', 'mean_theta' (1, 85)}
    batch_stats: Any  # {'encoder': ...}
    gen_opt: Any
    critic_params: Any
    critic_opt: Any


def create_train_state(
    rng: jax.Array,
    hmr,
    critic_def,
    mean_theta,
    generator_lr: float,
    critic_lr: float,
    img_size: int = 224,
    lr_schedule: str = "constant",
    lr_decay_steps: int = 0,
) -> TrainState:
    """Initialize all parameters and optimizer states."""
    hmr_rng, critic_rng = jax.random.split(rng)
    variables = hmr.init(hmr_rng, img_size=img_size)
    gen_params = dict(variables["params"])
    gen_params["mean_theta"] = jnp.asarray(mean_theta, jnp.float32)
    gen_params = FrozenDict(gen_params)

    critic_vars = critic_def.init(
        critic_rng,
        jnp.zeros((1, 13, 13)),
        jnp.zeros((1, 14, 3)),
        jnp.zeros((1, 10)),
        jnp.zeros((1, 23, 3, 3)),
    )
    gen_tx, critic_tx = make_optimizers(
        generator_lr, critic_lr, lr_schedule, lr_decay_steps
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params,
        batch_stats=variables["batch_stats"],
        gen_opt=gen_tx.init(gen_params),
        critic_params=critic_vars["params"],
        critic_opt=critic_tx.init(critic_vars["params"]),
    )
