#!/usr/bin/env python3
"""Per-query DuckDB wall-times — the oracle-side half of the "within 2x of
baseline" gate BASELINE.md promises. Runs every oracleSql query (the JSON
graft.Verify dumps) in DuckDB over the same parquet tables the Spark bench
reads, times `reps` executions each, and writes the MEDIAN seconds per
query. Bench.scala merges these into BENCH_DETAIL.json as `duck_sec` next
to each query's Spark median so the ratio is computable per query.

DuckDB runs with its default thread count (all cores) — the same machine
and parallelism budget the local[32] Spark session gets, so the ratio
compares engines, not machine shares.

Usage: python3 tools/oracle_times.py <sfDir> <oracle_sql.json> <out.json> [reps]
"""
import json
import statistics
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_json, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    with open(oracle_json) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    times, errors = {}, {}
    for name in sorted(oracles):
        sql = oracles[name]
        samples = []
        try:
            for _ in range(reps):
                t0 = time.perf_counter()
                con.sql(sql).fetchall()
                samples.append(time.perf_counter() - t0)
            times[name] = round(statistics.median(samples), 4)
        except Exception as e:  # a broken oracle is the verify gate's job
            errors[name] = str(e).splitlines()[0][:200]
    out = {"sf": sf_dir, "reps": reps,
           "duck_total": round(sum(times.values()), 3),
           "times": times}
    if errors:
        out["errors"] = errors
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"timed {len(times)} oracles, total {out['duck_total']}s, "
          f"{len(errors)} errors -> {out_path}")


if __name__ == "__main__":
    main()
