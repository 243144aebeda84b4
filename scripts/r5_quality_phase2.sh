#!/bin/bash
# Round-5 quality phase 2: multi-seed (>=3) re-runs of the compared
# cells behind QUALITY.md's "statistically equal" claims, all in the
# CURRENT code state (round 4's silhouette rewrite changed float
# accumulation order, so older single-seed trajectories are not
# comparable):
#   - combined vs kp_only, constant lr, 6000 steps, seeds 0/1/2
#   - combined + cosine, 6000 steps, seeds 0/1/2
# ONE config per python invocation: a 3-config invocation was OOM-killed
# at 123 GB peak RSS (memory accumulates per config in one process).
# Also re-runs the mr_only_no_critic cell lost to that OOM.
# Shares the /tmp/closed_loop dataset (seed-0 generation); the seed
# varies ONLY training (init, shuffling, augmentation, WGAN noise).
set -uo pipefail
cd /root/repo

python benchmarks/quality_bench.py --steps 6000 --batch 32 \
  --configs mr_only_no_critic \
  --out quality_results_mronly_nocritic_6000.json \
  2>&1 | tee benchmarks/logs/quality_mronly_nocritic_6000.log

for s in 0 1 2; do
  for c in combined kp_only; do
    python benchmarks/quality_bench.py --steps 6000 --eval_every 1000 --batch 32 \
      --configs "$c" --seed "$s" \
      --out "quality_results_6000_${c}_seed$s.json" \
      2>&1 | tee "benchmarks/logs/quality_6000_${c}_seed$s.log"
  done
done

for s in 0 1 2; do
  python benchmarks/quality_bench.py --steps 6000 --eval_every 1000 --batch 32 \
    --configs combined --lr_schedule cosine --seed "$s" \
    --out "quality_results_cosine_seed$s.json" \
    2>&1 | tee "benchmarks/logs/quality_cosine_seed$s.log"
done

cp /tmp/closed_loop/quality_results_mronly_nocritic_6000.json \
   /tmp/closed_loop/quality_results_6000_*_seed*.json \
   /tmp/closed_loop/quality_results_cosine_seed*.json /root/repo/
echo "PHASE2 DONE"
