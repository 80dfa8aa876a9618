#!/usr/bin/env python3
"""Dev-side emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads every query result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the testdata tables, and
compares (columns sorted by name, rows sorted, exact match; floats reported
with max abs diff when close). NOT part of the shipped library — tooling only.

OOM hygiene (round-12 verdict finding 1): two artifact rows per round have
historically been zeroed by DuckDB "Failed to allocate block" errors when the
gate ran while the Verify JVM still held most of RAM. Three defenses:
  * an explicit DuckDB memory_limit (default 8 GiB, override via
    GRAFT_ORACLE_MEM) so DuckDB budgets/spills instead of racing the JVM
    for everything the OS reports as free;
  * a spill temp_directory so the heavy oracles (banded self-joins,
    recursive-CTE closures) can go out-of-core under that budget;
  * ONE retry of any query whose FAILURE was an allocation error, on a
    fresh connection — a transient co-resident-JVM window clears by the
    time the retry runs (the observed recovery mode: the judge's idle-
    machine rerun of q131/q139 passed exactly).
"""
import json
import sys
import tempfile
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

ORACLE_MEM = None  # set in main() from GRAFT_ORACLE_MEM (default "8GB")


def connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    con.execute(f"SET memory_limit = '{ORACLE_MEM}'")
    con.execute(f"SET temp_directory = '{tempfile.gettempdir()}/graft_oracle_spill'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def is_alloc_error(e: Exception) -> bool:
    s = str(e)
    return ("OutOfMemory" in type(e).__name__ or "Failed to allocate" in s
            or "could not allocate" in s or "bad allocation" in s)


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> None:
    global ORACLE_MEM
    import os
    ORACLE_MEM = os.environ.get("GRAFT_ORACLE_MEM", "8GB")
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = connect(sf_dir)
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
            try:
                exp = norm(con.execute(oracle[name]).fetchdf())
            except Exception as e1:
                if not is_alloc_error(e1):
                    raise
                # allocation failure: retry ONCE on a fresh connection (the
                # co-resident-JVM window has usually closed by now)
                print(f"RETRY    {name}: allocation failure, retrying once")
                con.close()
                con = connect(sf_dir)
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
