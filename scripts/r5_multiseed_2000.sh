#!/bin/bash
# Round-5 multi-seed, re-scoped after on-box pacing (PERF.md "Closed-loop
# pacing"): 2000-step depth (the reference's Table-1/2 schedule shape),
# fused one-dispatch training + k=50 + cached decode, uniform across all
# cells. Covers: (A) combined vs kp_only x seeds 0/1/2; (D) kp-only donor
# + constant-lr pretrained transfer x seeds 0/1/2.
set -uo pipefail
cd /root/repo
COMMON="--steps 2000 --eval_every 1000 --batch 32 --steps_per_call 50 --fuse_preprocess"
for s in 0 1 2; do
  for c in combined kp_only; do
    python benchmarks/quality_bench.py $COMMON --configs "$c" --seed "$s" \
      --out "quality_results_2000_${c}_seed$s.json" \
      > "benchmarks/logs/quality_2000_${c}_seed$s.log" 2>&1
    echo "DONE ${c} seed $s rc=$?"
  done
done
cp /tmp/closed_loop/quality_results_2000_*_seed*.json /root/repo/ || true
echo "BLOCK A2000 DONE"

DONOR_DIR=/tmp/closed_loop_donor
python benchmarks/quality_bench.py --out_dir "$DONOR_DIR" --seed 100 \
  $COMMON --configs kp_only --save_checkpoint --out donor_results.json \
  > benchmarks/logs/quality_donor_s100.log 2>&1
echo "DONE donor rc=$?"
CKPT="$DONOR_DIR/ckpt_kp_only_s100"
if [ -d "$CKPT" ]; then
  cp "$DONOR_DIR/donor_results.json" /root/repo/quality_results_donor_s100.json
  for s in 0 1 2; do
    python benchmarks/quality_bench.py $COMMON --configs combined \
      --seed "$s" --init_encoder_from "$CKPT" \
      --out "quality_results_transfer_const_seed$s.json" \
      > "benchmarks/logs/quality_transfer_const_seed$s.log" 2>&1
    echo "DONE transfer-const seed $s rc=$?"
  done
  cp /tmp/closed_loop/quality_results_transfer_const_seed*.json /root/repo/ || true
else
  echo "donor checkpoint missing: $CKPT"
fi
echo "ALL DONE"
