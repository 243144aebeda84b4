#!/bin/bash
# Round-5 follow-up: multi-seed the critic-axis direction on the mr_only
# column — the reference's most striking Table-1 finding (critic hurts
# mr-only; report.pdf Table 1, ref src/trainer.py:453-471). Seed 0's
# within-pair comparison exists as the step-2000 eval points of the
# unfused constant-lr 6000-step trajectories (quality_results_mronly_*);
# seeds 1/2 run both cells with the fused k-step loop (pair-consistent
# within each seed; fused runs compare only with fused runs — the
# augmentation RNG stream differs, QUALITY.md "Multi-seed noise band").
set -uo pipefail
cd /root/repo
COMMON="--steps 2000 --eval_every 1000 --batch 32 --steps_per_call 50 --fuse_preprocess"
for s in 1 2; do
  for c in mr_only mr_only_no_critic; do
    python benchmarks/quality_bench.py $COMMON --configs "$c" --seed "$s" \
      --out "quality_results_2000_${c}_seed$s.json" \
      > "benchmarks/logs/quality_2000_${c}_seed$s.log" 2>&1
    echo "DONE ${c} seed $s rc=$?"
  done
done
cp /tmp/closed_loop/quality_results_2000_mr_only*_seed*.json /root/repo/ || true
echo "MR CRITIC SEEDS DONE"
