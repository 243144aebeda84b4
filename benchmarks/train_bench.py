"""Training-step throughput benchmark on the current backend.

Measures the fused one-dispatch hybrid training step (augmentation +
mocap SMPL + generator update + critic/WGAN-GP update in ONE executable)
steady-state with donated state, across batch sizes.

    python benchmarks/train_bench.py --batches 8,64,128 --iters 20

Follows PERF.md "Measurement pitfalls": donate the train state, warm
>= 8 chained steps, one TPU process at a time.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent XLA compile cache (same as bench.py): repeat runs skip the
# multi-minute first compile of the step programs through the relay.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/hpe_jax_cache")
)
# The env var alone is ignored when sitecustomize preloads jax; route
# through jax.config as well (utils/jax_cache.py).
from human_pose_estimation_tpu.utils.jax_cache import ensure_compilation_cache

ensure_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,64,128")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--img_size", type=int, default=224)
    ap.add_argument("--canvas", type=int, default=256)
    ap.add_argument("--sil", type=int, default=2048)
    ap.add_argument("--fused", default="true")
    ap.add_argument("--remat", default="false", help="jax.checkpoint the encoder")
    ap.add_argument("--mr_stages", default="all", choices=["all", "last"])
    ap.add_argument(
        "--true_sil",
        type=int,
        default=0,
        help="unfused mode: mark only the first N silhouette pixels valid "
        "(0 = all of --sil), exercising the count-gated chamfer tiles",
    )
    ap.add_argument("--profile", default="", help="jax.profiler trace dir")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from human_pose_estimation_tpu.config import Config
    from human_pose_estimation_tpu.models.critic import Critic
    from human_pose_estimation_tpu.models.hmr import HMR
    from human_pose_estimation_tpu.train.state import create_train_state
    from human_pose_estimation_tpu.train.step import (
        GenBatch,
        HostBatch,
        MocapBatch,
        make_fused_train_step,
        make_train_step,
    )
    from human_pose_estimation_tpu.utils.assets import (
        synthetic_mean_params,
        synthetic_model,
    )

    fused = args.fused.lower() in ("1", "true", "yes")
    smpl = synthetic_model(num_verts=6890, seed=0)
    for batch in [int(b) for b in args.batches.split(",")]:
        cfg = Config(
            img_size=args.img_size,
            batch_size=batch,
            use_mesh_repro_loss=True,
            use_kpr_loss=True,
            use_gradient_penalty=True,
            max_silhouette_points=args.sil,
            fuse_preprocess=fused,
            mr_metric_stages=args.mr_stages,
        )
        hmr = HMR(
            smpl,
            num_stage=cfg.num_stage,
            joint_type=cfg.joint_type,
            encoder_dtype=jnp.bfloat16,
            remat_encoder=args.remat.lower() in ("1", "true", "yes"),
        )
        critic = Critic()
        state = create_train_state(
            jax.random.PRNGKey(0),
            hmr,
            critic,
            synthetic_mean_params()[None, :],
            cfg.generator_lr,
            cfg.critic_lr,
            img_size=cfg.img_size,
        )
        rng = np.random.RandomState(0)
        m = batch * cfg.num_stage
        if fused:
            step_fn = jax.jit(
                make_fused_train_step(hmr, critic, cfg, smpl), donate_argnums=(0,)
            )
            data = (
                HostBatch(
                    image=jnp.asarray(
                        rng.randint(0, 255, (batch, args.canvas, args.canvas, 3)),
                        jnp.uint8,
                    ),
                    seg=jnp.asarray(
                        (rng.rand(batch, args.canvas, args.canvas, 1) > 0.7) * 255,
                        jnp.uint8,
                    ),
                    hw=jnp.full((batch, 2), args.canvas, jnp.int32),
                    center=jnp.full((batch, 2), args.canvas // 2, jnp.int32),
                    label=jnp.asarray(rng.rand(batch, 3, 19), jnp.float32),
                ),
                (
                    jnp.asarray(rng.randn(m, 72) * 0.2, jnp.float32),
                    jnp.asarray(rng.randn(m, 10) * 0.03, jnp.float32),
                ),
            )
        else:
            step_fn = jax.jit(
                make_train_step(hmr, critic, cfg), donate_argnums=(0,)
            )
            nsil = cfg.max_silhouette_points
            n_true = args.true_sil or nsil
            mask = np.zeros((batch, nsil), np.float32)
            mask[:, :n_true] = 1.0
            data = (
                GenBatch(
                    images=jnp.asarray(
                        rng.rand(batch, args.img_size, args.img_size, 3) * 2 - 1,
                        jnp.float32,
                    ),
                    seg_points=jnp.asarray(
                        rng.rand(batch, nsil, 2) * args.img_size, jnp.float32
                    ),
                    seg_mask=jnp.asarray(mask),
                    kp2d=jnp.asarray(rng.rand(batch, 19, 3), jnp.float32),
                ),
                MocapBatch(
                    joints=jnp.asarray(rng.randn(m, 19, 3), jnp.float32),
                    shapes=jnp.asarray(rng.randn(m, 10) * 0.03, jnp.float32),
                    rotations=jnp.asarray(
                        np.tile(np.eye(3, dtype=np.float32), (m, 23, 1, 1))
                    ),
                ),
            )

        key = jax.random.PRNGKey(1)
        for i in range(10):  # warmup past relay donation warmup
            state, metrics = step_fn(state, *data, jax.random.fold_in(key, i))
        jax.block_until_ready(state)
        if args.profile:
            jax.profiler.start_trace(args.profile)
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, metrics = step_fn(state, *data, jax.random.fold_in(key, 100 + i))
        jax.block_until_ready(state)
        dt = time.perf_counter() - t0
        if args.profile:
            jax.profiler.stop_trace()
        print(
            json.dumps(
                {
                    "mode": "fused" if fused else "unfused",
                    "batch": batch,
                    "remat": args.remat.lower() in ("1", "true", "yes"),
                    "mr_stages": args.mr_stages,
                    "sil": args.sil,
                    "true_sil": args.true_sil or args.sil,
                    "ms_per_step": round(dt / args.iters * 1000, 2),
                    "img_per_sec": round(batch * args.iters / dt, 1),
                }
            )
        )


if __name__ == "__main__":
    main()
