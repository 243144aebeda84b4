#!/bin/bash
# Round-5 quality phase 1: the no-critic cells of the closed-loop matrix
# (report.pdf Table 1's missing axis) at both schedule depths, plus the
# with-critic mr_only cell at 6000 steps so the 2x3 table is complete at
# both depths. Shares /tmp/closed_loop (generated on first run).
set -uo pipefail
cd /root/repo
mkdir -p benchmarks/logs

python benchmarks/quality_bench.py --steps 2000 --batch 32 \
  --configs combined_no_critic,kp_only_no_critic,mr_only_no_critic \
  --out quality_results_nocritic_2000.json \
  2>&1 | tee benchmarks/logs/quality_nocritic_2000.log

python benchmarks/quality_bench.py --steps 6000 --batch 32 \
  --configs combined_no_critic,kp_only_no_critic,mr_only_no_critic \
  --out quality_results_nocritic_6000.json \
  2>&1 | tee benchmarks/logs/quality_nocritic_6000.log

python benchmarks/quality_bench.py --steps 6000 --batch 32 \
  --configs mr_only \
  --out quality_results_mronly_6000.json \
  2>&1 | tee benchmarks/logs/quality_mronly_6000.log

cp /tmp/closed_loop/quality_results_nocritic_2000.json \
   /tmp/closed_loop/quality_results_nocritic_6000.json \
   /tmp/closed_loop/quality_results_mronly_6000.json /root/repo/
echo "PHASE1 DONE"
