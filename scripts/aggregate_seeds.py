"""Aggregate multi-seed quality_results JSONs into mean +- spread rows.

    python scripts/aggregate_seeds.py quality_results_6000_seed*.json [--step 6000]

Groups rows by (base config, step) where the base config strips the
`_s<seed>` suffix, and prints per-metric mean, min..max spread, and the
per-seed values — the numbers QUALITY.md's multi-seed tables quote.
"""
from __future__ import annotations

import argparse
import json
import re
from collections import defaultdict

METRICS = ["kpr", "mr", "pck@0.5", "pck_auc", "vert_err", "pa_vert_err"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("--step", type=int, default=None,
                    help="only this eval step (default: all steps)")
    args = ap.parse_args()

    groups = defaultdict(list)
    for path in args.files:
        with open(path) as f:
            for row in json.load(f):
                if args.step is not None and row["step"] != args.step:
                    continue
                base = re.sub(r"_s\d+$", "", row["config"])
                groups[(base, row["step"])].append(row)

    for (base, step), rows in sorted(groups.items()):
        print(f"\n== {base} @ step {step}  (n={len(rows)} seeds: "
              f"{sorted(r.get('seed', 0) for r in rows)})")
        for m in METRICS:
            vals = [r[m] for r in rows if m in r]
            if not vals:
                continue
            mean = sum(vals) / len(vals)
            lo, hi = min(vals), max(vals)
            spread = (hi - lo) / 2
            print(f"  {m:12s} mean {mean:8.4f}  +-{spread:7.4f} "
                  f"[{lo:.4f}, {hi:.4f}]  seeds={[round(v, 4) for v in vals]}")


if __name__ == "__main__":
    main()
