#!/usr/bin/env python3
"""Dev-side emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads every query result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the testdata tables, and
compares (columns sorted by name, rows sorted, exact match; floats reported
with max abs diff when close). NOT part of the shipped library — tooling only.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_ok = n_bad = 0
    for name in sorted(oracle):
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"MISSING  {name}: no result parquet")
            n_bad += 1
            continue
        got = norm(pd.read_parquet(res_dir))
        try:
            exp = norm(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"SQLFAIL  {name}: {e}")
            n_bad += 1
            continue
        if got.shape != exp.shape or list(got.columns) != list(exp.columns):
            print(f"SHAPE    {name}: got {got.shape}{list(got.columns)} "
                  f"vs oracle {exp.shape}{list(exp.columns)}")
            n_bad += 1
            continue
        # the driver's hash is dtype-sensitive: DuckDB HUGEINT (e.g. sum of
        # BIGINT) arrives as float64 while Spark writes int64 -> hash mismatch
        # even when values are equal. Flag any int-vs-float kind difference.
        kinds = [(c, got[c].dtype.kind, exp[c].dtype.kind)
                 for c in got.columns
                 if {got[c].dtype.kind, exp[c].dtype.kind} == {"i", "f"}]
        if kinds:
            print(f"DTYPE    {name}: int-vs-float columns {kinds}")
            n_bad += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                          check_exact=True)
            print(f"OK       {name} ({got.shape[0]} rows)")
            n_ok += 1
        except AssertionError:
            try:
                pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                              rtol=1e-6, atol=1e-9)
                print(f"FLOATEPS {name}: equal only within 1e-6 rtol")
            except AssertionError as e2:
                print(f"MISMATCH {name}: {str(e2).splitlines()[-1][:200]}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failing")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
