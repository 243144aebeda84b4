#!/bin/bash
# Round-5 quality phase 2: multi-seed (>=3) re-runs of the compared
# cells behind QUALITY.md's "statistically equal" claims, all in the
# CURRENT code state (round 4's silhouette rewrite changed float
# accumulation order, so older single-seed trajectories are not
# comparable):
#   - combined vs kp_only, constant lr, 6000 steps, seeds 0/1/2
#   - combined + cosine, 6000 steps, seeds 0/1/2
# Shares the /tmp/closed_loop dataset (seed-0 generation); the seed
# varies ONLY training (init, shuffling, augmentation, WGAN noise).
set -uo pipefail
cd /root/repo

for s in 0 1 2; do
  python benchmarks/quality_bench.py --steps 6000 --eval_every 1000 --batch 32 \
    --configs combined,kp_only --seed "$s" \
    --out "quality_results_6000_seed$s.json" \
    2>&1 | tee "benchmarks/logs/quality_6000_seed$s.log"
done

for s in 0 1 2; do
  python benchmarks/quality_bench.py --steps 6000 --eval_every 1000 --batch 32 \
    --configs combined --lr_schedule cosine --seed "$s" \
    --out "quality_results_cosine_seed$s.json" \
    2>&1 | tee "benchmarks/logs/quality_cosine_seed$s.log"
done

cp /tmp/closed_loop/quality_results_6000_seed*.json \
   /tmp/closed_loop/quality_results_cosine_seed*.json /root/repo/
echo "PHASE2 DONE"
