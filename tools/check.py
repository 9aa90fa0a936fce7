#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the Verify output dir (per-query parquet + oracle_sql.json), runs each
oracle SQL in DuckDB against the same sf parquet tables, and compares:
  - schema: sorted column names must match
  - rows:   row count must match
  - hash:   values compared exactly after sorting columns by name and rows
            by their full value tuple (mirrors a sort-then-hash compare)

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize arrow/duckdb dtype differences for compare
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    # floats compared by bit pattern (the driver hash-compares values, so a
    # one-ulp divergence must FAIL here too, not slip through a tolerance)
    import struct

    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].map(
                lambda v: None if pd.isna(v) else struct.pack("<d", float(v)).hex()
            )
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pq.read_table(f"{out_dir}/{name}").to_pandas()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            failures += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
        except AssertionError as e:
            print(f"FAIL {name}: values differ: {str(e)[:500]}")
            failures += 1
            continue
        print(f"OK   {name} ({len(g)} rows)")
    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'} / {len(oracle)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
