#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query result
parquet dumped by graft.Verify, run the oracle SQL in DuckDB over the same
source tables, sort columns by name + rows by all columns, and compare.

Beyond value equality, this replica also enforces RENDER parity — the
driver hashes rendered output, so a column that is numerically equal but
typed differently on the two sides ("5" vs "5.0", Decimal('1.40') vs 1.4)
is red in the driver even though a value compare passes. Two extra gates:
  1. pandas dtype equality between the two fetchdf frames;
  2. no DECIMAL / HUGEINT output columns on either side (their rendering
     depends on the consumer's read path: pyarrow yields decimal.Decimal
     objects where DuckDB's fetchdf yields float64). Portable outputs are
     BIGINT / DOUBLE / VARCHAR / DATE / TIMESTAMP / BOOLEAN only.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

UNSAFE_DUCK_TYPES = ("DECIMAL", "HUGEINT", "UHUGEINT")


def canon(con, rel_sql):
    # duckdb type names surface on the relation before fetchdf melts them
    # into pandas dtypes
    rel = con.sql(rel_sql)
    types = {c: str(t) for c, t in zip(rel.columns, rel.types)}
    df = rel.fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df, types


def compare(a, b, name, atypes, btypes):
    if list(a.columns) != list(b.columns):
        return f"SCHEMA mismatch: {list(a.columns)} vs {list(b.columns)}"
    for col in a.columns:
        for side, t in (("spark", atypes.get(col, "")), ("oracle", btypes.get(col, ""))):
            if any(u in t.upper() for u in UNSAFE_DUCK_TYPES):
                return (f"PORTABILITY: col={col} is {t} on the {side} side — "
                        "render-ambiguous across the driver's read paths; "
                        "cast to BIGINT/DOUBLE/VARCHAR")
        # int32 vs int64 renders the same ("5"); int vs float does not
        # ("5" vs "5.0") — compare render CLASSES, not exact widths
        ka = getattr(a[col].dtype, "kind", "O")
        kb = getattr(b[col].dtype, "kind", "O")
        cls = lambda k: {"i": "int", "u": "int", "f": "float", "b": "bool",
                         "M": "datetime", "m": "timedelta"}.get(k, "object")
        if cls(ka) != cls(kb):
            return (f"DTYPE class mismatch col={col}: {a[col].dtype} vs "
                    f"{b[col].dtype} — renders differently in the driver's hash")
    if len(a) != len(b):
        return f"ROWS mismatch: {len(a)} vs {len(b)}"
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            xna = x is None or (isinstance(x, float) and math.isnan(x))
            yna = y is None or (isinstance(y, float) and math.isnan(y))
            if xna and yna:
                continue
            if xna != yna:
                return f"NULL mismatch col={col} row={i}: {x!r} vs {y!r}"
            if isinstance(x, float) or isinstance(y, float):
                if x != y:
                    return f"FLOAT mismatch col={col} row={i}: {x!r} vs {y!r} (diff={abs(float(x)-float(y))})"
            elif str(x) != str(y):
                return f"VALUE mismatch col={col} row={i}: {x!r} vs {y!r}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok, bad, noracle = [], [], []
    import os
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        if name not in oracle:
            try:
                n = con.execute(f"SELECT count(*) FROM '{path}/*.parquet'").fetchone()[0]
                noracle.append((name, n))
            except Exception as e:
                bad.append((name, f"READ FAIL: {e}"))
            continue
        try:
            mine, mtypes = canon(con, f"SELECT * FROM '{path}/*.parquet'")
        except Exception as e:
            bad.append((name, f"READ FAIL: {e}"))
            continue
        try:
            theirs, otypes = canon(con, oracle[name])
        except Exception as e:
            bad.append((name, f"ORACLE FAIL: {e}"))
            continue
        err = compare(mine, theirs, name, mtypes, otypes)
        if err:
            bad.append((name, err))
        else:
            ok.append((name, len(mine)))
    print(f"== OK ({len(ok)}) ==")
    for n, r in ok:
        print(f"  {n}: {r} rows")
    print(f"== NO ORACLE / rows-only ({len(noracle)}) ==")
    for n, r in noracle:
        print(f"  {n}: {r} rows")
    print(f"== FAIL ({len(bad)}) ==")
    for n, e in bad:
        print(f"  {n}: {e}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
