"""Where does the encoder's conv backward lose its MFU? (r3 VERDICT #4)

The B64 hybrid step is 28 ms encoder fwd+bwd at 26% bf16 MFU while the
forward alone runs at ~51% (PERF.md "Step anatomy"). This harness
attacks that number with evidence instead of argument:

  --mode layers   per-conv-shape timing of ResNet-50's convolutions:
                  forward, input-gradient (dgrad) and filter-gradient
                  (wgrad) each timed alone, with TFLOP/s — locates WHICH
                  convs burn the time and WHICH gradient is slow.
  --mode encoder  full encoder fwd+bwd under treatments:
                  --dtype bf16|f32 (compute dtype), --s2d (space-to-
                  depth 4x4 stem transform: 224x224x3 -> 56x56x48 with
                  reshaped stem weights, the MLPerf-ResNet TPU trick).
  --mode flags    subprocess sweep of XLA_FLAGS over the encoder
                  fwd+bwd (flags latch at backend init, so each setting
                  needs a fresh process).

    python benchmarks/conv_backward_attack.py --mode layers --batch 128
    python benchmarks/conv_backward_attack.py --mode encoder --batch 128
    python benchmarks/conv_backward_attack.py --mode flags --batch 128

Protocol per PERF.md "Measurement pitfalls": donated/chained carries,
>=10 warmup calls, device_get fence, one process on the chip.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from human_pose_estimation_tpu.utils.jax_cache import ensure_compilation_cache

ensure_compilation_cache()

# ResNet-50 convolution inventory at 224px input:
# (name, in_hw, kernel, stride, cin, cout, count_in_network)
RESNET50_CONVS = [
    ("stem7x7s2", 224, 7, 2, 3, 64, 1),
    ("s1_b1_proj1x1", 56, 1, 1, 64, 256, 1),
    ("s1_1x1a", 56, 1, 1, 64, 64, 1),
    ("s1_3x3", 56, 3, 1, 64, 64, 3),
    ("s1_1x1b", 56, 1, 1, 64, 256, 3),
    ("s1_1x1a_wide", 56, 1, 1, 256, 64, 2),
    ("s2_proj1x1s2", 56, 1, 2, 256, 512, 1),
    ("s2_1x1a_s2", 56, 1, 2, 256, 128, 1),
    ("s2_3x3", 28, 3, 1, 128, 128, 4),
    ("s2_1x1b", 28, 1, 1, 128, 512, 4),
    ("s2_1x1a", 28, 1, 1, 512, 128, 3),
    ("s3_proj1x1s2", 28, 1, 2, 512, 1024, 1),
    ("s3_1x1a_s2", 28, 1, 2, 512, 256, 1),
    ("s3_3x3", 14, 3, 1, 256, 256, 6),
    ("s3_1x1b", 14, 1, 1, 256, 1024, 6),
    ("s3_1x1a", 14, 1, 1, 1024, 256, 5),
    ("s4_proj1x1s2", 14, 1, 2, 1024, 2048, 1),
    ("s4_1x1a_s2", 14, 1, 2, 1024, 512, 1),
    ("s4_3x3", 7, 3, 1, 512, 512, 3),
    ("s4_1x1b", 7, 1, 1, 512, 2048, 3),
    ("s4_1x1a", 7, 1, 1, 2048, 512, 2),
]

V5E_BF16_PEAK_TFLOPS = 197.0


def timeit_chain(fn, args_list, iters, warmup=10):
    """fn(acc, *args) -> acc ; chained scalar acc serializes dispatches."""
    import jax
    import jax.numpy as jnp

    acc = jnp.zeros((), jnp.float32)
    for _ in range(warmup):
        acc = fn(acc, *args_list)
    jax.device_get(acc)
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = fn(acc, *args_list)
    jax.device_get(acc)
    return (time.perf_counter() - t0) / iters * 1e3


def mode_layers(args):
    """Per-conv timing with a K-deep serialized chain INSIDE one program
    (the relay's per-dispatch latency is ~1 ms, the size of most of
    these convs — isolated one-op programs measure only the floor; see
    PERF.md "Measurement pitfalls"). Each iteration's operand depends on
    the previous result through a single probed element, so XLA can
    neither hoist the conv out of the loop nor overlap iterations."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.RandomState(0)
    K = args.chain
    rows = []

    def time_chain(prog, *operands):
        @jax.jit
        def run(*ops):
            return prog(*ops)

        out = run(*operands)
        jax.device_get(out)  # warm + fence
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = run(*operands)
        jax.device_get(out)
        return (time.perf_counter() - t0) / args.iters / K * 1e3

    for name, hw, k, s, cin, cout, count in RESNET50_CONVS:
        x = jnp.asarray(rng.randn(args.batch, hw, hw, cin), dt)
        w = jnp.asarray(rng.randn(k, k, cin, cout) * 0.05, dt)
        pad = "SAME"

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (s, s), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
            )

        out_hw = (hw + s - 1) // s
        # FLOPs: 2 * N * outH * outW * K * K * Cin * Cout (per direction)
        gflop = 2 * args.batch * out_hw * out_hw * k * k * cin * cout / 1e9

        y = conv(x, w)
        ybar = jnp.ones_like(y)
        tiny = jnp.asarray(1e-12, dt)

        def fwd_prog(x, w):
            def body(i, x):
                y = conv(x, w)
                return x + y[0, 0, 0, 0] * tiny

            return jnp.sum(
                jax.lax.fori_loop(0, K, body, x).astype(jnp.float32)
            )

        # NOTE: dgrad is a function of (ybar, w) only and wgrad of
        # (x, ybar) only — chaining through x/w alone lets XLA hoist the
        # whole gradient conv out of the loop (measured: "300 TFLOP/s").
        # The chain must run through ybar, the one operand both depend on.
        def dgrad_prog(x, w, ybar):
            def body(i, ybar):
                _, vjp = jax.vjp(lambda x_: conv(x_, w), x)
                (dx,) = vjp(ybar)
                return ybar + dx[0, 0, 0, 0] * tiny

            return jnp.sum(
                jax.lax.fori_loop(0, K, body, ybar).astype(jnp.float32)
            )

        def wgrad_prog(x, w, ybar):
            def body(i, ybar):
                _, vjp = jax.vjp(lambda w_: conv(x, w_), w)
                (dw,) = vjp(ybar)
                return ybar + dw[0, 0, 0, 0] * tiny

            return jnp.sum(
                jax.lax.fori_loop(0, K, body, ybar).astype(jnp.float32)
            )

        ms_f = time_chain(fwd_prog, x, w)
        ms_d = time_chain(dgrad_prog, x, w, ybar)
        ms_w = time_chain(wgrad_prog, x, w, ybar)

        def tf(ms):
            return round(gflop / ms, 1) if ms > 0 else 0.0

        rows.append(
            {
                "conv": name,
                "n_in_net": count,
                "gflop": round(gflop, 1),
                "fwd_ms": round(ms_f, 3),
                "fwd_tflops": tf(ms_f),
                "dgrad_ms": round(ms_d, 3),
                "dgrad_tflops": tf(ms_d),
                "wgrad_ms": round(ms_w, 3),
                "wgrad_tflops": tf(ms_w),
                "net_bwd_ms": round((ms_d + ms_w) * count, 2),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    total_bwd = sum(r["net_bwd_ms"] for r in rows)
    total_fwd = sum(r["fwd_ms"] * r["n_in_net"] for r in rows)
    print(
        json.dumps(
            {
                "batch": args.batch,
                "dtype": args.dtype,
                "sum_fwd_ms": round(total_fwd, 1),
                "sum_bwd_ms": round(total_bwd, 1),
            }
        )
    )


def _encoder_fwd_bwd_ms(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from human_pose_estimation_tpu.models.resnet import make_resnet

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    enc = make_resnet(50, compute_dtype=dt, stem=args.stem)
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.rand(args.batch, args.img_size, args.img_size, 3) * 2 - 1,
        jnp.float32,
    )
    variables = enc.init(jax.random.PRNGKey(0), images, train=False)
    params, bstats = variables["params"], variables["batch_stats"]

    def loss(params, bstats, images):
        out, _ = enc.apply(
            {"params": params, "batch_stats": bstats},
            images,
            train=True,
            mutable=["batch_stats"],
        )
        return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

    grad = jax.grad(loss)

    @jax.jit
    def step(params, bstats, images):
        g = grad(params, bstats, images)
        return jax.tree.map(lambda p, gg: p - 0.0 * gg, params, g)

    step_d = jax.jit(
        lambda p, b, i: step(p, b, i), donate_argnums=(0,)
    )
    p = jax.tree.map(jnp.array, params)
    for _ in range(10):
        p = step_d(p, bstats, images)
    jax.device_get(jax.tree.leaves(p)[0])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        p = step_d(p, bstats, images)
    jax.device_get(jax.tree.leaves(p)[0])
    ms = (time.perf_counter() - t0) / args.iters * 1e3

    comp = jax.jit(grad).lower(params, bstats, images).compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    gflop = ca.get("flops", 0) / 1e9 if ca else 0.0
    return ms, gflop


def mode_encoder(args):
    ms, gflop = _encoder_fwd_bwd_ms(args)
    mfu = gflop / ms / V5E_BF16_PEAK_TFLOPS if ms else 0.0
    print(
        json.dumps(
            {
                "mode": "encoder",
                "batch": args.batch,
                "dtype": args.dtype,
                "stem": args.stem,
                "fwd_bwd_ms": round(ms, 2),
                "gflop": round(gflop, 1),
                "tflops": round(gflop / ms, 1),
                "mfu_vs_bf16_peak": round(mfu, 3),
            }
        )
    )


FLAG_SETS = {
    "baseline": "",
    "latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem_96m": "--xla_tpu_scoped_vmem_limit_kib=98304",
    "no_rematerialization": "--xla_disable_hlo_passes=rematerialization",
    "flash_fusion": "--xla_tpu_enable_flash_fusion=true",
}


def mode_flags(args):
    results = {}
    for name, flags in FLAG_SETS.items():
        env = dict(os.environ)
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        # fresh process: XLA flags latch at backend init
        cmd = [
            sys.executable,
            os.path.abspath(__file__),
            "--mode",
            "encoder",
            "--batch",
            str(args.batch),
            "--iters",
            str(args.iters),
            "--dtype",
            args.dtype,
            "--stem",
            args.stem,
        ]
        try:
            out = subprocess.run(
                cmd, env=env, capture_output=True, text=True, timeout=900
            )
            line = [
                l for l in out.stdout.splitlines() if l.startswith("{")
            ]
            if out.returncode != 0 or not line:
                results[name] = {
                    "error": (out.stderr or out.stdout)[-500:],
                }
            else:
                results[name] = json.loads(line[-1])
                results[name]["flags"] = flags
        except subprocess.TimeoutExpired:
            results[name] = {"error": "timeout"}
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"mode": "flags", "results": results}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="layers",
                    choices=["layers", "encoder", "flags"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--img_size", type=int, default=224)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--chain", type=int, default=32,
                    help="serialized conv repetitions per program (layers mode)")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--stem", default="standard", choices=["standard", "s2d"])
    args = ap.parse_args()
    {"layers": mode_layers, "encoder": mode_encoder, "flags": mode_flags}[
        args.mode
    ](args)


if __name__ == "__main__":
    main()
