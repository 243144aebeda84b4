#!/bin/bash
# Round-5 multi-seed quality matrix (VERDICT r4 item 3): >=3 seeds for
# every pair behind a QUALITY.md "statistically equal" claim, all in
# the current code state, all with the SAME k-step dispatch
# (--steps_per_call 50; make_multi_step is semantically identical to
# k=1 — the k only amortizes relay dispatch latency, which dominated
# the k=1 runs at ~445 ms/step).
#
# Order matters: each block completes a claim, so a wall-clock cutoff
# still leaves whole claims multi-seeded.
#   A. combined vs kp_only, constant lr, 6000 steps, seeds 0/1/2
#   B. combined + cosine, 6000 steps, seeds 0/1/2
#   C. donor (kp-only pretrain, disjoint seed-100 dataset) +
#      combined + cosine + pretrained encoder, seeds 0/1/2
# One config per invocation (a 3-config run was OOM-killed at 123 GB).
set -uo pipefail
cd /root/repo
mkdir -p benchmarks/logs
K=50

for s in 0 1 2; do
  for c in combined kp_only; do
    python benchmarks/quality_bench.py --steps 6000 --eval_every 1000 \
      --batch 32 --steps_per_call $K --configs "$c" --seed "$s" \
      --out "quality_results_6000_${c}_seed$s.json" \
      > "benchmarks/logs/quality_6000_${c}_seed$s.log" 2>&1
    echo "DONE ${c} seed $s rc=$?"
  done
done
cp /tmp/closed_loop/quality_results_6000_*_seed*.json /root/repo/ || true
echo "BLOCK A DONE"

for s in 0 1 2; do
  python benchmarks/quality_bench.py --steps 6000 --eval_every 1000 \
    --batch 32 --steps_per_call $K --configs combined \
    --lr_schedule cosine --seed "$s" \
    --out "quality_results_cosine_seed$s.json" \
    > "benchmarks/logs/quality_cosine_seed$s.log" 2>&1
  echo "DONE cosine seed $s rc=$?"
done
cp /tmp/closed_loop/quality_results_cosine_seed*.json /root/repo/ || true
echo "BLOCK B DONE"

DONOR_DIR=/tmp/closed_loop_donor
python benchmarks/quality_bench.py --out_dir "$DONOR_DIR" --seed 100 \
  --steps 2000 --eval_every 1000 --batch 32 --steps_per_call $K \
  --configs kp_only --save_checkpoint --out donor_results.json \
  > benchmarks/logs/quality_donor_s100.log 2>&1
echo "DONE donor rc=$?"
CKPT="$DONOR_DIR/ckpt_kp_only_s100"
if [ -d "$CKPT" ]; then
  cp "$DONOR_DIR/donor_results.json" /root/repo/quality_results_donor_s100.json
  for s in 0 1 2; do
    python benchmarks/quality_bench.py --steps 6000 --eval_every 1000 \
      --batch 32 --steps_per_call $K --configs combined \
      --lr_schedule cosine --seed "$s" --init_encoder_from "$CKPT" \
      --out "quality_results_transfer_cosine_seed$s.json" \
      > "benchmarks/logs/quality_transfer_cosine_seed$s.log" 2>&1
    echo "DONE transfer seed $s rc=$?"
  done
  cp /tmp/closed_loop/quality_results_transfer_cosine_seed*.json /root/repo/ || true
else
  echo "donor checkpoint missing: $CKPT — skipping block C"
fi
echo "BLOCK C DONE"
echo "ALL PHASES DONE"
