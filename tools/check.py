#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool, not shipped).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Runs each oracle_sql.json entry in DuckDB over the testdata parquet, loads the
Spark-written result parquet, sorts columns by name, and compares values
exactly (the driver hashes, so exact equality is the bar).
"""
import sys, json, glob, math

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    try:
        import numpy as np
        if isinstance(v, np.ndarray):
            return tuple(norm_cell(x) for x in v.tolist())
        if isinstance(v, np.generic):
            return norm_cell(v.item())
    except ImportError:
        pass
    return v


def frame(df):
    df = df[sorted(df.columns)]
    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return list(df.columns), rows


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            exp_cols, exp = frame(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no Spark output parquet")
            n_fail += 1
            continue
        try:
            got_cols, got = frame(con.execute(
                f"SELECT * FROM read_parquet({files!r})").df())
        except Exception as e:
            print(f"FAIL {name}: cannot read Spark output: {e}")
            n_fail += 1
            continue
        if exp_cols != got_cols:
            print(f"FAIL {name}: columns differ: oracle={exp_cols} spark={got_cols}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: row counts differ: oracle={len(exp)} spark={len(got)}")
            n_fail += 1
            continue
        bad = [(i, e, g) for i, (e, g) in enumerate(zip(exp, got)) if e != g]
        if bad:
            i, e, g = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(exp)} rows differ; first at {i}:")
            print(f"  cols:   {exp_cols}")
            print(f"  oracle: {e}")
            print(f"  spark:  {g}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
