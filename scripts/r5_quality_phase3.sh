#!/bin/bash
# Round-5 quality phase 3: multi-seed pretrained-encoder transfer on the
# cosine schedule (the round-4 "cosine scratch vs cosine pretrained"
# comparison, n=1 -> n=3). One fixed donor (kp-only pretrain on the
# DISJOINT seed-100 dataset — the ImageNet-init analog, QUALITY.md
# "Pretrained-encoder transfer"), three target seeds.
set -uo pipefail
cd /root/repo

DONOR_DIR=/tmp/closed_loop_donor
python benchmarks/quality_bench.py --out_dir "$DONOR_DIR" --seed 100 \
  --steps 2000 --batch 32 --configs kp_only --save_checkpoint \
  --out donor_results.json \
  2>&1 | tee benchmarks/logs/quality_donor_s100.log

CKPT="$DONOR_DIR/ckpt_kp_only_s100"
test -d "$CKPT" || { echo "donor checkpoint missing: $CKPT"; exit 1; }

for s in 0 1 2; do
  python benchmarks/quality_bench.py --steps 6000 --eval_every 1000 --batch 32 \
    --configs combined --lr_schedule cosine --seed "$s" \
    --init_encoder_from "$CKPT" \
    --out "quality_results_transfer_cosine_seed$s.json" \
    2>&1 | tee "benchmarks/logs/quality_transfer_cosine_seed$s.log"
done

cp /tmp/closed_loop/quality_results_transfer_cosine_seed*.json /root/repo/
cp "$DONOR_DIR/donor_results.json" /root/repo/quality_results_donor_s100.json
echo "PHASE3 DONE"
