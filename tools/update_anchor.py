#!/usr/bin/env python3
"""Refresh BENCH_ANCHOR.json from a CLEAN run's BENCH_DETAIL.json.

The anchor is the bench's cross-run disturbance guard (see Bench.scala):
a row whose best rep exceeds 2x its committed clean median is flagged
env_inflated. Only refresh the anchor from a run you trust to be clean —
the run itself reports that (n_flagged low, no env_inflated rows vs the
previous anchor, spark_vs_duck_ratio near the known-good band).

Usage: tools/update_anchor.py [BENCH_DETAIL.json] [BENCH_ANCHOR.json]
"""
import json
import sys

detail_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL.json"
anchor_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_ANCHOR.json"

with open(detail_path) as f:
    detail = json.load(f)

medians = {k: v for k, v in sorted(detail["medians"].items()) if v >= 0}
anchor = {
    "sf": detail["sf"],
    "note": "committed clean-run medians; Bench.scala flags env_inflated when a row's best rep exceeds 2x its entry here",
    "source_ratio": detail.get("spark_vs_duck_ratio"),
    "source_n_flagged": detail.get("n_flagged"),
    "medians": medians,
}
with open(anchor_path, "w") as f:
    json.dump(anchor, f, indent=1, sort_keys=False)
    f.write("\n")
print(f"wrote {anchor_path}: {len(medians)} medians at sf={detail['sf']}")
