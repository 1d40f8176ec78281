#!/usr/bin/env python3
"""Local replica of the round driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Loads each <name>/ parquet result written by `graft.Verify`, runs the
matching oracle_sql.json entry in DuckDB over the same sf directory's
parquet tables, and compares row count, column names, and values
(columns sorted by name, rows sorted by all columns).
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _cell(v) -> str:
    """Canonical string for one value, dtype-faithful like the driver's hash.

    An int64 8761 renders '8761'; a float64 8761.0 renders '8761.0' — so
    DuckDB HUGEINT→float widening FAILS here exactly as it does at the
    driver (r11's q_events_json blindspot: check_dtype=False hid it).
    """
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    try:
        if pd.isna(v):
            return "∅"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (np.floating, float)):
        return repr(float(v))
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = pd.DataFrame({c: [_cell(v) for v in df[c]] for c in df.columns})
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob, os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            marker = os.path.join(out_dir, name, "_FAILED")
            if os.path.exists(marker):
                msg = open(marker).read().strip().splitlines()[0]
                print(f"FAIL  {name}: query FAILED: {msg[:160]}")
            else:
                print(f"FAIL  {name}: no parquet output")
            n_fail += 1
            continue
        got = pd.read_parquet(files[0])
        if name not in oracle:
            print(f"ROWS  {name}: {len(got)} rows (no oracle)")
            n_rows_only += 1
            continue
        want = con.execute(oracle[name]).df()
        if len(got) != len(want):
            print(f"FAIL  {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL  {name}: cols {sorted(got.columns)} != {sorted(want.columns)}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if g.equals(w):
            print(f"PASS  {name}: {len(got)} rows")
            n_pass += 1
        else:
            neq = (g != w).any(axis=1)
            i = int(neq.idxmax())
            diff_cols = [c for c in g.columns if g.at[i, c] != w.at[i, c]]
            print(f"FAIL  {name}: value mismatch at sorted row {i}, "
                  f"cols {diff_cols}: "
                  f"spark={[g.at[i, c] for c in diff_cols]} "
                  f"oracle={[w.at[i, c] for c in diff_cols]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
