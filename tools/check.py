#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir]

Loads each SparkEntry.queries parquet dump from outdir, runs the
corresponding oracle SQL in DuckDB over the sfdir tables, and compares
(after sorting columns by name and rows by value, like the driver).
"""
import sys, json, glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    df = df.reindex(cols, axis=1)
    if cols:
        df = df.sort_values(by=cols, kind="mergesort")
    return df.reset_index(drop=True)


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_ok = n_bad = 0
    for name in sorted(oracles):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"{name:28s} NO OUTPUT")
            n_bad += 1
            continue
        mine = normalize(con.sql(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df())
        try:
            ref = normalize(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"{name:28s} ORACLE ERROR: {e}")
            n_bad += 1
            continue
        schema_eq = list(mine.columns) == list(ref.columns)
        dtypes_eq = schema_eq and list(mine.dtypes) == list(ref.dtypes)
        eq = schema_eq and len(mine) == len(ref) and mine.equals(ref)
        status = "OK" if eq else "MISMATCH"
        if eq and not dtypes_eq:
            status = "OK(dtype-diff)"
        print(f"{name:28s} {status}  rows={len(mine)}/{len(ref)}")
        if not eq:
            n_bad += 1
            if not schema_eq:
                print(f"   cols mine={list(mine.columns)} ref={list(ref.columns)}")
            elif len(mine) == len(ref):
                neq = ~(mine == ref).all(axis=1) if len(mine) else []
                diff = mine[neq] if len(mine) else mine
                print("   first diffs (mine | ref):")
                print(pd.concat([diff.head(3), ref[neq].head(3)], axis=1))
        else:
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad, "
          f"{len(oracles)} with oracle")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
