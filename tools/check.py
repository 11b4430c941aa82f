#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool, not shipped).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Mimics the driver faithfully (r07 lesson — reading BOTH sides through DuckDB
collapses type differences and masks hash-fails):
  - the Spark result parquet is read via pyarrow -> pandas (DECIMAL columns
    surface as Python Decimal objects, BIGINT as int64);
  - the oracle SQL runs in DuckDB -> Arrow -> pandas (DECIMAL and HUGEINT
    surface as Python Decimal, DATE as datetime.date — matching the pyarrow
    path; verified empirically: the r07 driver PASSES date-typed outputs and
    FAILS Spark-BIGINT-vs-oracle-HUGEINT, which is exactly the Arrow
    mapping, not the .df() one where DATE becomes datetime64);
  - rows are sorted with pandas sort_values over all columns (array-typed
    cells raise the same "unhashable type" the driver hits — reported as a
    HARNESS-ERR, which is a failure);
  - cells compare TYPE-SENSITIVELY: Decimal vs float, int vs float are
    mismatches even when numerically equal, because the driver's hash
    diverges on representation alone.
"""
import functools
import os
import sys, json, glob, math

# Progress must survive a pipe: the sf1 gate runs ~40+ min and a
# block-buffered stdout hides which oracle query is the slow one.
print = functools.partial(print, flush=True)
import datetime
from decimal import Decimal

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    """Type-tagged normalization: two cells agree only if repr class AND
    value agree (int64 vs float64 vs Decimal are distinct classes)."""
    if v is None:
        return None
    try:
        import numpy as np
        if isinstance(v, np.ndarray):
            return ("arr", tuple(norm_cell(x) for x in v.tolist()))
        if isinstance(v, np.bool_):
            return ("bool", bool(v))
        if isinstance(v, np.integer):
            return ("int", int(v))
        if isinstance(v, np.floating):
            v = float(v)
    except ImportError:
        pass
    if v is pd.NaT:
        return None
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        return ("float", v)
    if isinstance(v, Decimal):
        return ("decimal", str(v))
    if isinstance(v, pd.Timestamp):
        return ("ts", v.isoformat())
    if isinstance(v, datetime.datetime):
        return ("ts", v.isoformat())
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(norm_cell(x) for x in v))
    if isinstance(v, bytes):
        return ("bytes", v)
    return ("str", str(v))


def frame(df, side, name):
    """Sort like the driver (sort_values over every column) then normalize.
    Raises TypeError on unhashable/array cells — the driver's crash."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    rows = [tuple(norm_cell(v) for v in row)
            for row in df.itertuples(index=False, name=None)]
    rows.sort(key=repr)
    return list(df.columns), rows


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # Fail fast instead of taking down the box: a pathological oracle plan
    # (e.g. the DuckDB-1.0.0 dim×dim NESTED_LOOP theta join, FIXTURES.md C3)
    # otherwise spills ~80 GB of temp then gets the process OOM-killed at
    # 130 GB RSS (observed on the first sf1 gate run). No temp_directory =
    # no spill: the offending query errors loudly at the cap and the gate
    # reports it as a FAIL and keeps going. The cap is min(48 GB, ~70% of
    # physical RAM) — a fixed 48 GB above physical memory would still be
    # OOM-killed on a smaller host, defeating the fail-fast intent —
    # overridable via GRAFT_DUCKDB_MEM.
    cap = os.environ.get("GRAFT_DUCKDB_MEM")
    if not cap:
        try:
            phys_gb = (os.sysconf("SC_PAGE_SIZE")
                       * os.sysconf("SC_PHYS_PAGES")) / 2**30
            cap = f"{min(48, max(1, int(phys_gb * 0.7)))}GB"
        except (ValueError, OSError):
            cap = "48GB"
    con.execute(f"SET memory_limit='{cap}'")
    con.execute("SET temp_directory=''")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            exp_cols, exp = frame(con.execute(sql).arrow().to_pandas(),
                                  "oracle", name)
        except TypeError as e:
            print(f"FAIL {name}: HARNESS-ERR sorting oracle frame "
                  f"(array column?): {e}")
            n_fail += 1
            continue
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no Spark output parquet")
            n_fail += 1
            continue
        try:
            got_df = pq.ParquetDataset(files).read().to_pandas()
            got_cols, got = frame(got_df, "spark", name)
        except TypeError as e:
            print(f"FAIL {name}: HARNESS-ERR sorting Spark frame "
                  f"(array column?): {e}")
            n_fail += 1
            continue
        except Exception as e:
            print(f"FAIL {name}: cannot read Spark output: {e}")
            n_fail += 1
            continue
        if exp_cols != got_cols:
            print(f"FAIL {name}: columns differ: oracle={exp_cols} "
                  f"spark={got_cols}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: row counts differ: oracle={len(exp)} "
                  f"spark={len(got)}")
            n_fail += 1
            continue
        bad = [(i, e, g) for i, (e, g) in enumerate(zip(exp, got)) if e != g]
        if bad:
            i, e, g = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(exp)} rows differ; "
                  f"first at {i}:")
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
