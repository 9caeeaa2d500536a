"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, column-name set, and order-insensitive values
(columns sorted by name, rows sorted by all columns, cell-normalized).

Usage:
    python tests/oracle_harness.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from blackroad_feature_store_spark.session import get_spark  # noqa: E402
from blackroad_feature_store_spark.sources.testdata import TABLES  # noqa: E402


def _norm_cell(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, int):
        return float(v) if not isinstance(v, bool) else v
    return v


def _sorted_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in idx) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def compare(name, spark_df, con, sql):
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
    if not problems:
        a = _sorted_rows(s_cols, s_rows)
        b = _sorted_rows(d_cols, d_rows)
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y]
        if bad:
            i, x, y = bad[0]
            problems.append(
                f"{len(bad)}/{len(a)} rows differ; first at {i}:\n"
                f"      spark={x}\n      duck ={y}"
            )
    return problems


def main():
    ap = argparse.ArgumentParser()
    from blackroad_feature_store_spark.sources.testdata import sf_dir

    ap.add_argument("--sf", default=sf_dir("sf0.01"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(queries)
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        t0 = time.time()
        try:
            df = queries[name](spark, args.sf)
            if name not in oracles:
                n = df.count()
                print(f"ROWS-ONLY {name}: {n} rows ({time.time()-t0:.1f}s)")
                n_rowsonly += 1
                continue
            problems = compare(name, df, con, oracles[name])
        except Exception as e:  # noqa: BLE001 — harness reports, not raises
            problems = [f"EXCEPTION {type(e).__name__}: {e}"]
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"    {p}")
        else:
            n_pass += 1
            print(f"PASS {name} ({time.time()-t0:.1f}s)")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
