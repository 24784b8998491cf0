"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs every `queries()` entry from __spark_entry__ at a given sf dir and
compares row count, column names, and (order-insensitively) values
against the matching `oracle_sql()` run on DuckDB over the same parquet
files. Stricter than the driver on values (near-exact compare after the
queries' own rounding) so driver-side hash mismatches are caught here
first.

Usage:
    python scripts/verify_local.py [--sf /root/testdata/sf0.01] [--only name ...]
"""

from __future__ import annotations

import argparse
import datetime
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from flink_1_20_spark import get_spark
from flink_1_20_spark.catalog import TABLE_NAMES

REL_TOL = 1e-7
ABS_TOL = 1e-7


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, datetime.timedelta):
        return v.total_seconds()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    return v


def _sort_key(row):
    return tuple((x is None, str(x)) for x in row)


def _values_close(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=REL_TOL, abs_tol=ABS_TOL)
        except (TypeError, ValueError):
            return False
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_close(x, y) for x, y in zip(a, b))
    return a == b


def compare(spark_rows, spark_cols, duck_rows, duck_cols):
    """Returns (ok, message). Columns sorted by name, rows sorted, values
    compared with float tolerance — mirrors the driver's order-insensitive
    value hash but reports what differs."""
    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"schema mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_sorted = sorted(
        (tuple(_norm(r[i]) for i in s_idx) for r in spark_rows), key=_sort_key
    )
    d_sorted = sorted(
        (tuple(_norm(r[i]) for i in d_idx) for r in duck_rows), key=_sort_key
    )
    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        for c, (sv, dv) in zip(sorted(spark_cols), zip(sr, dr)):
            if not _values_close(sv, dv):
                return False, f"value mismatch row {i} col {c}: spark={sv!r} duck={dv!r}"
    return True, f"{len(spark_rows)} rows"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--prefix", default=None, help="only queries whose name starts with this")
    ap.add_argument(
        "--bare",
        action="store_true",
        help="use a bare SparkSession (UTC only, no engine configs) — "
        "mirrors the driver, catches engine-session config dependence",
    )
    ap.add_argument(
        "--perturb",
        action="store_true",
        help="odd parallelism + shuffle-partition count (local[5], 7 "
        "partitions): a second pass that flips partial-agg/accumulation "
        "order, catching outputs that only matched under the default "
        "partitioning (the order-dependence class the driver hits "
        "run-to-run)",
    )
    args = ap.parse_args()

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    names = args.only or sorted(qs)
    if args.prefix:
        names = [n for n in names if n.startswith(args.prefix)]

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )
    if args.bare or args.perturb:
        from pyspark.sql import SparkSession

        builder = (
            SparkSession.builder.master(
                "local[5]" if args.perturb else "local[8]"
            )
            .appName("verify-perturb" if args.perturb else "verify-bare")
            .config("spark.sql.session.timeZone", "UTC")
        )
        if args.perturb:
            builder = builder.config("spark.sql.shuffle.partitions", "7")
        spark = builder.getOrCreate()
    else:
        spark = get_spark("verify-local")

    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, args.sf)
            spark_cols = df.columns
            spark_rows = df.collect()
        except Exception:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            continue
        if name not in oracles:
            n_rows_only += 1
            print(f"rows  {name}: {len(spark_rows)} rows (no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = rel.columns
            duck_rows = rel.fetchall()
        except Exception:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: duckdb error\n{traceback.format_exc()}")
            continue
        ok, msg = compare(spark_rows, spark_cols, duck_rows, duck_cols)
        status = "PASS" if ok else "FAIL"
        if ok:
            n_pass += 1
        else:
            n_fail += 1
            failures.append(name)
        print(f"{status}  {name}: {msg}  ({time.time() - t0:.1f}s)")

    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only "
        f"of {len(names)} queries at {args.sf}"
    )
    if failures:
        print("failures:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
