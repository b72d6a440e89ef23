#!/usr/bin/env python3
"""Local pre-check of oracle parity, mimicking the driver's DuckDB compare.

Replicates the driver harness faithfully: both sides loaded as pandas
DataFrames (DuckDB `.df()` for the oracle — so HUGEINT->float64 conversions
surface here exactly as they do driver-side), columns sorted by name, rows
sorted with `sort_values` over all columns (so unhashable cells crash here
too), then compared cell-exact including dtype kind (int vs float).

Usage: python3 tools/check_oracle.py [sf_dir] [verify_out]
Not part of the Scala library — developer tooling only.
"""
import json
import sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            odf = con.execute(sql).df()
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: exec error {e}")
            continue
        if sorted(odf.columns) != sorted(sdf.columns):
            print(f"FAIL {name}: columns oracle={sorted(odf.columns)} "
                  f"spark={sorted(sdf.columns)}")
            continue
        try:
            odf, sdf = canon(odf), canon(sdf)
        except Exception as e:
            print(f"FAIL {name}: sort error {type(e).__name__} {e}")
            continue
        if len(odf) != len(sdf):
            print(f"FAIL {name}: rows oracle={len(odf)} spark={len(sdf)}")
            continue
        bad = [c for c in odf.columns if odf[c].dtype.kind != sdf[c].dtype.kind]
        if bad:
            print(f"FAIL {name}: dtype kind mismatch "
                  f"{[(c, str(odf[c].dtype), str(sdf[c].dtype)) for c in bad]}")
            continue
        diff_cols = []
        for c in odf.columns:
            a, b = odf[c], sdf[c]
            if a.dtype.kind == "O":
                eq = a.astype(str).eq(b.astype(str))
            else:
                eq = a.eq(b) | (a.isna() & b.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                diff_cols.append((c, i, a.iloc[i], b.iloc[i]))
        if diff_cols:
            print(f"FAIL {name}: value diffs {diff_cols[:3]}")
        else:
            n_ok += 1
            print(f"OK   {name} ({len(sdf)} rows)")
    print(f"== {n_ok}/{len(oracle)} match")


if __name__ == "__main__":
    main()
