#!/bin/bash
# Round-5 block D (optional, after r5_multiseed.sh): multi-seed the
# CONSTANT-lr pretrained-transfer comparison at 2000 steps — the cell
# behind QUALITY.md's "by 2000 steps the two runs are statistically
# indistinguishable" claim. Reuses block C's seed-100 kp-only donor.
set -uo pipefail
cd /root/repo
K=50
CKPT=/tmp/closed_loop_donor/ckpt_kp_only_s100
test -d "$CKPT" || { echo "donor checkpoint missing: $CKPT"; exit 1; }

for s in 0 1 2; do
  python benchmarks/quality_bench.py --steps 2000 --eval_every 1000 \
    --batch 32 --steps_per_call $K --configs combined --seed "$s" \
    --init_encoder_from "$CKPT" \
    --out "quality_results_transfer_const_seed$s.json" \
    > "benchmarks/logs/quality_transfer_const_seed$s.log" 2>&1
  echo "DONE transfer-const seed $s rc=$?"
done
# scratch side at 2000: the step-2000 eval points of block A's
# combined seeds are the matched comparison (same constant lr, same k).
cp /tmp/closed_loop/quality_results_transfer_const_seed*.json /root/repo/ || true
echo "BLOCK D DONE"
