"""Closed-loop training-quality benchmark (full scale, on-chip).

Generates a ground-truth dataset FROM the synthetic rigged human body
model (data/synthetic.py), trains the reference's ablation grid on it
(kp-only / mr-only / combined, with or without the critic — report.pdf
Table 1's axes), and evaluates each run: mean KPR/MR loss, PCK@0.5, and
model-space vertex error against the generating (theta, beta).

    python benchmarks/quality_bench.py --steps 2000 --batch 32 \
        --configs combined,kp_only,mr_only --out_dir /tmp/closed_loop

Writes one JSON line per (config, eval point) and a final summary table
(QUALITY.md is assembled from these numbers). Dataset generation is
host-side (one-time); training runs on whatever backend JAX selects.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/hpe_jax_cache")
)
# The env var alone is ignored when sitecustomize preloads jax; route
# through jax.config as well (utils/jax_cache.py).
from human_pose_estimation_tpu.utils.jax_cache import ensure_compilation_cache

ensure_compilation_cache()

ABLATIONS = {
    # name: (use_kpr, use_mr, encoder_only)
    "combined": (True, True, False),
    "kp_only": (True, False, False),
    "mr_only": (False, True, False),
    "combined_no_critic": (True, True, True),
    "kp_only_no_critic": (True, False, True),
    "mr_only_no_critic": (False, True, True),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="/tmp/closed_loop")
    ap.add_argument("--n_train", type=int, default=512)
    ap.add_argument("--n_val", type=int, default=128)
    ap.add_argument("--img_size", type=int, default=224)
    ap.add_argument("--render_size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--eval_every", type=int, default=500)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--sil", type=int, default=16384)
    ap.add_argument("--configs", default="combined,kp_only,mr_only")
    ap.add_argument(
        "--critic_weight", type=float, default=None,
        help="override critic_loss_weight (sweeps; suffixes the run name)",
    )
    ap.add_argument(
        "--cam_scale_hinge", type=float, default=None,
        help="override the gauge-fix hinge weight (None = Config default)",
    )
    ap.add_argument(
        "--lr_schedule", default="constant", choices=["constant", "cosine"],
        help="cosine decays both Adam rates to 0 over --steps",
    )
    ap.add_argument(
        "--save_checkpoint", action="store_true",
        help="save the final TrainState (for init_encoder_from transfer)",
    )
    ap.add_argument(
        "--init_encoder_from", default="",
        help="checkpoint dir whose encoder initializes each run "
        "(pretrained-encoder transfer; Config.init_encoder_from)",
    )
    ap.add_argument("--encoder_depth", type=int, default=50)
    ap.add_argument(
        "--steps_per_call", type=int, default=1,
        help="k-step multi-dispatch (Config.steps_per_call): amortizes "
        "the relay dispatch latency that dominates this loop on "
        "tunnel-attached chips (PERF.md 'Training-loop host overhead'). "
        "Semantically identical to k=1 (train/step.py make_multi_step); "
        "use one k for every cell of a compared matrix.",
    )
    ap.add_argument(
        "--fuse_preprocess", action="store_true",
        help="one-dispatch training (Config.fuse_preprocess): host ships "
        "raw canvases; augmentation + mocap SMPL forward + both updates "
        "run as ONE program. Without it the k-step gather loop still "
        "pays one device-preprocess dispatch per batch, which caps the "
        "--steps_per_call win on relay-attached chips. Parity: "
        "tests/test_train_step.py::test_fused_step_matches_unfused "
        "(augmentation RNG stream differs from the unfused pipeline, so "
        "compare fused runs only with fused runs).",
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--train_name", default="lsp_train")
    ap.add_argument("--val_name", default="lsp_val")
    ap.add_argument("--regen", action="store_true", help="force dataset regen")
    ap.add_argument(
        "--out", default="quality_results.json",
        help="results filename (written inside --out_dir)",
    )
    args = ap.parse_args()

    import numpy as np

    from human_pose_estimation_tpu.config import Config
    from human_pose_estimation_tpu.core.smpl import save_model_npz, load_model
    from human_pose_estimation_tpu.data.pipeline import ImagePipeline, MocapPipeline
    from human_pose_estimation_tpu.data.synthetic import generate_closed_loop_dataset
    from human_pose_estimation_tpu.train.trainer import Trainer
    from human_pose_estimation_tpu.utils.synthetic_human import synthetic_human_model

    out_dir = args.out_dir
    model_path = os.path.join(out_dir, "model.npz")
    marker = os.path.join(out_dir, "stats.json")
    if args.regen or not os.path.exists(marker):
        os.makedirs(out_dir, exist_ok=True)
        print("generating closed-loop dataset ...")
        model = synthetic_human_model(num_verts=6890)
        t0 = time.time()
        # Pin generation to the host CPU backend: its many small
        # smpl_forward batches are seconds on CPU but minutes (and
        # occasionally wedged RPCs) through a remote-attached chip.
        import jax

        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            stats = generate_closed_loop_dataset(
                out_dir,
                model,
                n_train=args.n_train,
                n_val=args.n_val,
                n_mocap=8192,
                img_size=args.render_size,
                seed=args.seed,
                fmt="tfrecord",
                train_name=args.train_name,
                val_name=args.val_name,
            )
        save_model_npz(model, model_path)
        stats["gen_seconds"] = round(time.time() - t0, 1)
        with open(marker, "w") as f:
            json.dump(stats, f, indent=1)
        print("dataset:", json.dumps(stats))
    else:
        with open(marker) as f:
            stats = json.load(f)
        print("reusing dataset:", json.dumps(stats))

    smpl = load_model(model_path)
    gt = np.load(os.path.join(out_dir, "ground_truth.npz"))

    # GT model-space vertices for the val split (cam-independent metric).
    import jax.numpy as jnp

    from human_pose_estimation_tpu.core.smpl import smpl_forward

    gt_verts = np.asarray(
        smpl_forward(
            smpl,
            jnp.asarray(gt[f"{args.val_name}_beta"]),
            jnp.asarray(gt[f"{args.val_name}_theta"]),
            joint_type="lsp",
        ).verts
    )

    results = []
    for name in [c.strip() for c in args.configs.split(",") if c.strip()]:
        use_kpr, use_mr, encoder_only = ABLATIONS[name]
        overrides = {}
        if args.critic_weight is not None:
            overrides["critic_loss_weight"] = args.critic_weight
            name = f"{name}_cw{args.critic_weight:g}"
        if args.cam_scale_hinge is not None:
            overrides["cam_scale_hinge"] = args.cam_scale_hinge
        if args.lr_schedule != "constant":
            overrides["lr_schedule"] = args.lr_schedule
            overrides["lr_decay_steps"] = args.steps
            name = f"{name}_{args.lr_schedule}"
        if args.init_encoder_from:
            overrides["init_encoder_from"] = args.init_encoder_from
            name = f"{name}_pretrained"
        if args.seed != 0:
            name = f"{name}_s{args.seed}"
        cfg = Config(
            smpl_model_path=model_path,
            data_dir=out_dir,
            logs=os.path.join(out_dir, "logs"),
            model_dir=os.path.join(out_dir, "logs", name),
            checkpoint_dir=os.path.join(out_dir, "ckpt_" + name),
            datasets=[args.train_name],
            val_datasets=[args.val_name],
            mocap_datasets=["CMU"],
            num_examples_override=args.n_train,
            img_size=args.img_size,
            batch_size=args.batch,
            epoch=10**9,
            generator_lr=args.lr,
            use_kpr_loss=use_kpr,
            use_mesh_repro_loss=True,  # MR metric always evaluated
            encoder_only=encoder_only,
            max_silhouette_points=args.sil,
            mr_metric_stages="last",
            encoder_depth=args.encoder_depth,
            use_validation=False,
            log_img_step=0,
            checkpoint_every_epochs=10**9,
            scalar_log_step=50,
            steps_per_call=args.steps_per_call,
            fuse_preprocess=args.fuse_preprocess,
            seed=args.seed,
            **overrides,
        )
        # the generator OBJECTIVE honors the ablation; the MR/KPR metrics
        # stay on for comparable eval numbers
        obj_cfg = cfg.replace(use_mesh_repro_loss=use_mr, use_kpr_loss=use_kpr)

        files = [os.path.join(out_dir, f"{args.train_name}.tfrecords")]
        val_files = [os.path.join(out_dir, f"{args.val_name}.tfrecords")]
        trainer = Trainer(
            obj_cfg,
            dataset=ImagePipeline(
                obj_cfg,
                files=files,
                mode="train",
                device_preprocess=not args.fuse_preprocess,
                cache=True,  # 512-image corpus: decode once, not per epoch
            ),
            # eval path stays on the device-preprocess pipeline (val_step
            # consumes GenBatch; augment=False so it is deterministic)
            val_dataset=ImagePipeline(
                cfg, files=val_files, mode="val", augment=False, cache=True
            ),
        )
        trainer.mocap_dataset = MocapPipeline(
            obj_cfg,
            trainer.smpl,
            shuffle=True,
            device_forward=not args.fuse_preprocess,
        )
        # eval with both metrics on regardless of the training objective
        from human_pose_estimation_tpu.train.step import make_val_step
        import jax

        trainer.val_step = jax.jit(make_val_step(trainer.hmr, trainer.critic, cfg))

        def evaluate(step):
            res = trainer.validate_checkpoint(restore=False)
            # model-space vertex error vs the generating parameters: raw
            # (includes the monocular similarity gauge — camera scale
            # trades against body size, depth is unobserved) and
            # Procrustes-aligned (PVE-PA: recovered pose/shape quality).
            from human_pose_estimation_tpu.ops.metrics import pa_error

            verrs, paerrs, cams, i = [], [], [], 0
            for batch, n_valid in trainer.val_dataset:
                out = jax.device_get(
                    trainer.val_step(trainer.state, trainer._shard(batch))
                )
                pv = out["verts"][:n_valid]
                gv = gt_verts[i : i + n_valid]
                verrs.append(
                    np.linalg.norm(pv - gv, axis=-1).mean(axis=-1)
                )
                paerrs.append(
                    np.asarray(pa_error(jnp.asarray(pv), jnp.asarray(gv)))
                )
                cams.append(out["cams"][:n_valid])
                i += n_valid
            vert_err = float(np.concatenate(verrs).mean())
            pa_vert_err = float(np.concatenate(paerrs).mean())
            # gauge diagnostics: predicted vs generating camera scale
            cam_s = np.concatenate(cams)[:, 0]
            gt_s = gt[f"{args.val_name}_cam"][: len(cam_s), 0]
            scale_ratio = float(np.mean(cam_s / np.maximum(gt_s, 1e-6)))
            import resource

            row = {
                "config": name,
                "seed": args.seed,
                "step": step,
                # peak RSS in GB: one run of three sequential configs was
                # OOM-killed at 123 GB (memory accumulates per config in
                # one process — prefer one config per invocation)
                "rss_gb": round(
                    resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 1
                ),
                "kpr": round(res["mean_kpr_loss"], 4),
                "mr": round(res["mean_mr_loss"], 4),
                "pck@0.5": round(res["pck@0.5"], 4),
                "pck_auc": round(res.get("pck_auc@0.5", float("nan")), 4),
                "vert_err": round(vert_err, 4),
                "pa_vert_err": round(pa_vert_err, 4),
                "cam_scale_ratio": round(scale_ratio, 4),
            }
            print(json.dumps(row))
            results.append(row)
            return row

        evaluate(0)
        done = 0
        t0 = time.time()
        while done < args.steps:
            seg = min(args.eval_every, args.steps - done)
            trainer.train(max_steps=seg)
            done += seg
            evaluate(done)
        dt = time.time() - t0
        print(
            f"[{name}] {args.steps} steps in {dt:.0f}s "
            f"({1e3 * dt / args.steps:.1f} ms/step incl. eval)"
        )
        if args.save_checkpoint:
            trainer.save()
            print(f"[{name}] checkpoint saved to {cfg.checkpoint_dir}")

    print("\n=== summary (final step per config) ===")
    finals = {}
    for r in results:
        finals[r["config"]] = r
    for name, r in finals.items():
        print(json.dumps(r))
    with open(os.path.join(out_dir, args.out), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
