#!/usr/bin/env python3
"""Local self-check mirroring the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [queryName...]

Reads each Spark result dumped by graft.Verify (<out>/<name>/*.parquet),
runs the matching oracle SQL from <out>/oracle_sql.json in DuckDB over the
same sf parquet tables, sorts columns by name and rows by all values, and
reports row/schema/value match per query. This is a dev convenience only —
the driver's compare is authoritative.
"""
import sys, json, glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df) and len(df.columns):
        key = df.astype(str)
        df = df.iloc[key.sort_values(by=list(df.columns)).index]
    return df.reset_index(drop=True)


def main() -> int:
    sf, out = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    failures = 0
    for n in names or sorted(oracles):
        files = sorted(glob.glob(f"{out}/{n}/*.parquet"))
        if not files:
            print(f"{n}: NO SPARK DUMP")
            failures += 1
            continue
        if n not in oracles:
            print(f"{n}: no oracle (rows-only); spark rows="
                  f"{len(con.execute(f'SELECT * FROM read_parquet({files!r})').fetchdf())}")
            continue
        spark = canon(con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf())
        try:
            oracle = canon(con.execute(oracles[n]).fetchdf())
        except Exception as e:
            print(f"{n}: ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        rows_ok = len(spark) == len(oracle)
        cols_ok = list(spark.columns) == list(oracle.columns)
        vals_ok = False
        if rows_ok and cols_ok:
            vals_ok = spark.astype(str).equals(oracle.astype(str))
        status = "OK" if (rows_ok and cols_ok and vals_ok) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(f"{n}: {status} rows {len(spark)}/{len(oracle)} "
                  f"cols_ok={cols_ok} vals_ok={vals_ok}")
            if not cols_ok:
                print(f"  spark cols:  {list(spark.columns)}")
                print(f"  oracle cols: {list(oracle.columns)}")
            elif rows_ok:
                diff = spark.astype(str) != oracle.astype(str)
                bad = diff.any(axis=1)
                print("  first diffs (spark vs oracle):")
                print(pd.concat([spark[bad].head(3), oracle[bad].head(3)],
                                keys=["spark", "oracle"]))
        else:
            print(f"{n}: OK ({len(spark)} rows)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
