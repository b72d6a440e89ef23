#!/usr/bin/env python3
"""Local pre-check of oracle parity, mimicking the driver's DuckDB compare.

Usage: python3 tools/check_oracle.py [sf_dir] [verify_out]
Not part of the Scala library — developer tooling only.
"""
import json
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    return sorted(out), [cols[i] for i in order]


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            ocur = con.execute(sql)
            ocols = [d[0] for d in ocur.description]
            orows = ocur.fetchall()
            scur = con.execute(
                f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')")
            scols = [d[0] for d in scur.description]
            srows = scur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error {e}")
            continue
        on, oc = norm(orows, ocols)
        sn, sc = norm(srows, scols)
        if oc != sc:
            print(f"FAIL {name}: columns oracle={oc} spark={sc}")
        elif on != sn:
            diffs = [i for i, (a, b) in enumerate(zip(on, sn)) if a != b]
            print(f"FAIL {name}: rows oracle={len(on)} spark={len(sn)} "
                  f"first_diffs={[(on[i], sn[i]) for i in diffs[:2]]}"
                  if diffs else
                  f"FAIL {name}: row count oracle={len(on)} spark={len(sn)} "
                  f"tail o={on[-2:] if on else None} s={sn[-2:] if sn else None}")
        else:
            n_ok += 1
            print(f"OK   {name} ({len(sn)} rows)")
    print(f"== {n_ok}/{len(oracle)} match")


if __name__ == "__main__":
    main()
