"""Build an encoder-donor checkpoint from ImageNet Keras weights.

The reference initializes its encoder with
``keras.applications.ResNet50(weights='imagenet')`` at model build time
(ref src/models.py:35-41). This framework does pretrained
initialization offline instead: port the Keras weights once into a
step-0 Orbax checkpoint, then point any number of training runs at it
with ``--init_encoder_from`` (which grafts encoder params + BN
statistics into a fresh train state; see Config.init_encoder_from).

    # download ImageNet weights (needs TF + network) or use a local .h5
    python -m human_pose_estimation_tpu.cli.import_encoder \\
        --checkpoint_dir runs/imagenet_donor \\
        --smpl_model_path models/model.npz \\
        [--keras_weights imagenet | /path/to/resnet50_notop.h5]

    # then:
    python -m human_pose_estimation_tpu.cli.train ... \\
        --init_encoder_from runs/imagenet_donor

Requires TensorFlow on the host for the port only; nothing TF survives
into the output checkpoint.
"""
from __future__ import annotations

import argparse
import sys

from ..config import parse_config


def main(argv=None) -> None:
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument(
        "--keras_weights",
        default="imagenet",
        help="'imagenet' (downloads via keras) or a local Keras .h5 path",
    )
    args, rest = p.parse_known_args(argv)
    cfg = parse_config(rest)

    import jax
    import jax.numpy as jnp

    from ..core.smpl import load_model
    from ..models.critic import Critic
    from ..models.hmr import HMR
    from ..models.port_keras import load_imagenet_resnet
    from ..train.state import create_train_state
    from ..utils import checkpoint as ckpt
    from ..utils.mean_params import load_mean_theta

    weights = (
        None
        if args.keras_weights.lower() in ("none", "random")
        else args.keras_weights
    )
    enc_params, enc_stats = load_imagenet_resnet(
        depth=cfg.encoder_depth, weights=weights
    )

    smpl = load_model(cfg.smpl_model_path)
    dtype = jnp.bfloat16 if cfg.encoder_dtype == "bfloat16" else jnp.float32
    hmr = HMR(
        smpl,
        num_stage=cfg.num_stage,
        joint_type=cfg.joint_type,
        encoder_dtype=dtype,
        encoder_depth=cfg.encoder_depth,
    )
    state = create_train_state(
        jax.random.PRNGKey(cfg.seed),
        hmr,
        Critic(),
        load_mean_theta(cfg.mean_params_path),
        cfg.generator_lr,
        cfg.critic_lr,
        img_size=cfg.img_size,
    )
    from flax.core import FrozenDict, freeze

    own_enc = state.gen_params["encoder"]
    ported = freeze(enc_params)
    if jax.tree.structure(jax.tree.map(lambda x: 0, ported)) != (
        jax.tree.structure(jax.tree.map(lambda x: 0, own_enc))
    ):
        raise ValueError(
            f"ported Keras ResNet-{cfg.encoder_depth} does not match this "
            "model's encoder structure (check --encoder_depth)"
        )
    cast = lambda ref, x: jnp.asarray(x, ref.dtype)
    new_gen = dict(state.gen_params)
    new_gen["encoder"] = jax.tree.map(cast, own_enc, ported)
    new_bs = dict(state.batch_stats)
    new_bs["encoder"] = jax.tree.map(
        cast, state.batch_stats["encoder"], freeze(enc_stats)
    )
    state = state.replace(
        gen_params=FrozenDict(new_gen), batch_stats=FrozenDict(new_bs)
    )
    ckpt.save_train_state(cfg.checkpoint_dir, state, step=0)
    n = sum(p.size for p in jax.tree.leaves(new_gen["encoder"]))
    print(
        f"wrote ImageNet ResNet-{cfg.encoder_depth} donor checkpoint -> "
        f"{cfg.checkpoint_dir} (step 0, {n:,} encoder params); use with "
        "--init_encoder_from"
    )


if __name__ == "__main__":
    main(sys.argv[1:])
