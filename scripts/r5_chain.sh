#!/bin/bash
cd /root/repo
python benchmarks/quality_bench.py --steps 50 --eval_every 50 --batch 32 --steps_per_call 50 --configs kp_only --out smoke_kp.json > benchmarks/logs/precompile_kp.log 2>&1
echo "PRECOMPILE kp_only rc=$?"
python benchmarks/quality_bench.py --steps 50 --eval_every 50 --batch 32 --steps_per_call 50 --configs combined --lr_schedule cosine --out smoke_cos.json > benchmarks/logs/precompile_cos.log 2>&1
echo "PRECOMPILE cosine rc=$?"
bash scripts/r5_multiseed.sh
