#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/diff.py <sfDir> <verifyOutDir>

For each <name>.parquet dir written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (with one view per fixture
table) and compares: row count, column names, and cell values with
columns sorted by name (mirroring the driver's compare).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return repr(v)


def table_key(rel):
    # Mirror the driver: go through pandas (so DuckDB HUGEINT -> float64 and
    # unhashable array cells surface locally exactly as they do in the gate),
    # sort columns by name, then compare normalized cell values.
    df = rel.df()
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns))  # raises on unhashable cells
    return sorted(
        tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)
    ), list(df.columns), len(df)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            sk, s_cols, s_n = table_key(
                con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable/uncomparable: {e}")
            n_fail += 1
            continue
        try:
            dk, d_cols, d_n = table_key(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error/uncomparable: {e}")
            n_fail += 1
            continue
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        if s_n != d_n:
            print(f"FAIL {name}: rows spark={s_n} duck={d_n}")
            n_fail += 1
            continue
        if sk != dk:
            bad = [(a, b) for a, b in zip(sk, dk) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1
            continue
        print(f"PASS {name} ({s_n} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
