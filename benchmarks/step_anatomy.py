"""Where does the B64 hybrid training step spend its time?

Isolates the pieces of the unfused train step (preprocessed inputs,
mr_metric_stages='last') with on-chip A/B timings plus compiled FLOP
counts (``compiled.cost_analysis``) so the PERF.md roofline argument is
measurement-backed:

  * encoder fwd+bwd alone (the MXU term)
  * 3-stage IEF + SMPL + losses fwd+bwd with a FROZEN feature input
    (everything after the encoder)
  * optax Adam update alone on the full parameter pytree
  * chamfer mesh loss val+grad alone
  * the full hybrid step (reference number, same protocol)

    python benchmarks/step_anatomy.py --batch 64 --iters 30
    python benchmarks/step_anatomy.py --batch 64 --profile /tmp/trace

Protocol per PERF.md "Measurement pitfalls": donated carries, >=10
chained warmup calls, one process on the chip at a time.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from human_pose_estimation_tpu.utils.jax_cache import ensure_compilation_cache

ensure_compilation_cache()


def _timeit(fn, carry, args, iters, warmup=10):
    import jax

    for i in range(warmup):
        carry = fn(carry, *args)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for i in range(iters):
        carry = fn(carry, *args)
    jax.block_until_ready(carry)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--img_size", type=int, default=224)
    ap.add_argument("--sil", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--profile", default="", help="jax.profiler trace dir")
    ap.add_argument(
        "--only", default="", help="comma list: enc,head,adam,chamfer,full"
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from human_pose_estimation_tpu.config import Config
    from human_pose_estimation_tpu.models.critic import Critic
    from human_pose_estimation_tpu.models.hmr import HMR
    from human_pose_estimation_tpu.ops import losses as L
    from human_pose_estimation_tpu.train.state import create_train_state
    from human_pose_estimation_tpu.train.step import (
        GenBatch,
        MocapBatch,
        make_train_step,
    )
    from human_pose_estimation_tpu.utils.assets import (
        synthetic_mean_params,
        synthetic_model,
    )

    batch = args.batch
    cfg = Config(
        img_size=args.img_size,
        batch_size=batch,
        use_mesh_repro_loss=True,
        use_kpr_loss=True,
        use_gradient_penalty=True,
        max_silhouette_points=args.sil,
        mr_metric_stages="last",
    )
    smpl = synthetic_model(num_verts=6890, seed=0)
    hmr = HMR(smpl, num_stage=3, joint_type="lsp", encoder_dtype=jnp.bfloat16)
    critic = Critic()
    state = create_train_state(
        jax.random.PRNGKey(0), hmr, critic, synthetic_mean_params()[None, :],
        cfg.generator_lr, cfg.critic_lr, img_size=args.img_size,
    )
    rng = np.random.RandomState(0)
    m = batch * cfg.num_stage
    images = jnp.asarray(
        rng.rand(batch, args.img_size, args.img_size, 3) * 2 - 1, jnp.float32
    )
    gen = GenBatch(
        images=images,
        seg_points=jnp.asarray(
            rng.rand(batch, args.sil, 2) * args.img_size, jnp.float32
        ),
        seg_mask=jnp.ones((batch, args.sil), jnp.float32),
        kp2d=jnp.asarray(rng.rand(batch, 19, 3), jnp.float32),
    )
    mocap = MocapBatch(
        joints=jnp.asarray(rng.randn(m, 19, 3), jnp.float32),
        shapes=jnp.asarray(rng.randn(m, 10) * 0.03, jnp.float32),
        rotations=jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (m, 23, 1, 1))),
    )
    key = jax.random.PRNGKey(1)
    results = {}
    only = set(x for x in args.only.split(",") if x)

    def want(name):
        return not only or name in only

    # ---------------- full hybrid step (reference point) ----------------
    if want("full"):
        step_fn = jax.jit(make_train_step(hmr, critic, cfg), donate_argnums=(0,))
        # Time on a deep copy: donation deletes the chain's input buffers
        # and the original `state` leaves feed the later sections.
        state_copy = jax.tree.map(jnp.array, state)
        results["full_step_ms"] = _timeit(
            lambda s, g, mo, k: step_fn(s, g, mo, k)[0],
            state_copy, (gen, mocap, key), args.iters,
        )
        lowered = jax.jit(
            make_train_step(hmr, critic, cfg), donate_argnums=(0,)
        ).lower(state, gen, mocap, key)
        comp = lowered.compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        if ca:
            results["full_step_gflops"] = round(ca.get("flops", 0) / 1e9, 1)
            results["full_step_hbm_gb"] = round(
                ca.get("bytes accessed", 0) / 1e9, 2
            )
        if args.profile:
            # Device tracing is NOT supported through the axon relay
            # attachment: start_trace succeeds but the next dispatch
            # fails with "TPU backend error (InvalidArgument)" (measured
            # 2026-08-21). Keep it non-fatal so a failed trace cannot
            # discard the timings above.
            try:
                jax.profiler.start_trace(args.profile)
                s2 = jax.tree.map(jnp.array, state)  # donated copy
                for i in range(3):
                    s2, _ = step_fn(s2, gen, mocap, jax.random.fold_in(key, i))
                jax.block_until_ready(s2)
                jax.profiler.stop_trace()
                results["trace_dir"] = args.profile
            except Exception as e:  # noqa: BLE001 - report and continue
                results["trace_error"] = f"{type(e).__name__}: {e}"
                try:
                    jax.profiler.stop_trace()
                except Exception:
                    pass

    # ---------------- encoder fwd+bwd alone -----------------------------
    if want("enc"):
        enc_vars = {
            "params": state.gen_params["encoder"],
            "batch_stats": state.batch_stats["encoder"],
        }

        def enc_loss(params, bstats, images):
            out, mut = hmr.encoder.apply(
                {"params": params, "batch_stats": bstats},
                images, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

        enc_grad = jax.jit(jax.grad(enc_loss))

        def enc_step(params, bstats, images):
            g = enc_grad(params, bstats, images)
            return jax.tree.map(lambda p, gg: p - 0.0 * gg, params, g)

        enc_step = jax.jit(enc_step, donate_argnums=(0,))
        enc_params = jax.tree.map(jnp.array, enc_vars["params"])  # donated copy
        results["encoder_fwd_bwd_ms"] = _timeit(
            enc_step, enc_params, (enc_vars["batch_stats"], images),
            args.iters,
        )
        comp = jax.jit(jax.grad(enc_loss)).lower(
            enc_vars["params"], enc_vars["batch_stats"], images
        ).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        if ca:
            results["encoder_fwd_bwd_gflops"] = round(ca.get("flops", 0) / 1e9, 1)

    # ---------------- post-encoder head fwd+bwd -------------------------
    if want("head"):
        feat_dim = 2048
        feats = jnp.asarray(rng.rand(batch, feat_dim), jnp.float32)

        def head_loss(reg_params, mean_theta, feats):
            # 3-stage IEF + SMPL + projection + kp/mesh losses, frozen feats
            from human_pose_estimation_tpu.core.projection import (
                orth_project, reproject_to_pixels,
            )
            from human_pose_estimation_tpu.core.smpl import smpl_forward
            from human_pose_estimation_tpu.models.hmr import split_theta

            theta = jnp.tile(mean_theta, (batch, 1))
            loss = jnp.zeros(())
            for stage in range(3):
                delta = hmr.regressor.apply(
                    {"params": reg_params}, feats, theta, train=False
                )
                theta = theta + delta
            cam, pose, shape = split_theta(theta)
            out = smpl_forward(smpl, shape, pose, joint_type="lsp")
            kp2d = orth_project(out.joints, cam)
            loss = loss + L.keypoint_reprojection_loss(
                gen.kp2d[:, : kp2d.shape[1]], kp2d
            )
            sil = reproject_to_pixels(out.verts, cam, float(cfg.img_size))
            loss = loss + L.mesh_reprojection_loss(
                gen.seg_points, gen.seg_mask, sil
            )
            return loss

        head_grad = jax.jit(jax.grad(head_loss, argnums=(0, 1)))

        def head_step(reg_params, mean_theta, feats):
            g, gm = head_grad(reg_params, mean_theta, feats)
            return jax.tree.map(lambda p, gg: p - 0.0 * gg, reg_params, g)

        head_step = jax.jit(head_step, donate_argnums=(0,))
        reg_copy = jax.tree.map(jnp.array, state.gen_params["regressor"])
        results["head_fwd_bwd_ms"] = _timeit(
            head_step, reg_copy,
            (state.gen_params["mean_theta"], feats), args.iters,
        )

    # ---------------- Adam update alone ---------------------------------
    if want("adam"):
        tx = optax.adam(1e-4)
        params = jax.tree.map(jnp.array, state.gen_params)  # donated copy
        opt_state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)

        def adam_step(carry, grads):
            params, opt_state = carry
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state)

        adam_step = jax.jit(adam_step, donate_argnums=(0,))
        results["adam_update_ms"] = _timeit(
            adam_step, (params, opt_state), (grads,), args.iters
        )

    # ---------------- chamfer val+grad alone ----------------------------
    if want("chamfer"):
        sil_pred = jnp.asarray(
            rng.rand(batch, 6890, 2) * args.img_size, jnp.float32
        )

        def cham(sil_pred):
            return L.mesh_reprojection_loss(gen.seg_points, gen.seg_mask, sil_pred)

        cham_vg = jax.jit(jax.value_and_grad(cham))

        def cham_step(sil_pred):
            v, g = cham_vg(sil_pred)
            return sil_pred - 0.0 * g

        cham_step = jax.jit(cham_step, donate_argnums=(0,))
        results["chamfer_val_grad_ms"] = _timeit(
            cham_step, sil_pred, (), args.iters
        )

    results.update(batch=batch, img_size=args.img_size, sil=args.sil)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
