#!/usr/bin/env python3
"""Dtype parity sweep: for every query with an oracle, fetch BOTH the
Spark result parquet and the DuckDB oracle result as pandas frames (the
driver's render path) and report any column whose dtype differs. A dtype
mismatch (int64 vs float64, object vs int64, ...) renders differently
("5" vs "5.0") and therefore hash-mismatches in the driver even when the
values are numerically identical.

Usage: python3 tools/dtype_diff.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path) or name not in oracle:
            continue
        if only and name not in only:
            continue
        try:
            mine = con.execute(f"SELECT * FROM '{path}/*.parquet'").fetchdf()
            theirs = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"{name}: FETCH FAIL {e}")
            bad += 1
            continue
        md = {c: str(t) for c, t in mine.dtypes.items()}
        od = {c: str(t) for c, t in theirs.dtypes.items()}
        if set(md) != set(od):
            print(f"{name}: COLUMN SET differs {sorted(md)} vs {sorted(od)}")
            bad += 1
            continue
        diffs = {c: (md[c], od[c]) for c in md if md[c] != od[c]}
        if diffs:
            print(f"{name}: {diffs}")
            bad += 1
    print(f"== {bad} queries with dtype mismatches ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
