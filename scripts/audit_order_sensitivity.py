"""Empirical order-sensitivity audit for the oracle battery.

The driver hash-compares Spark vs DuckDB output EXACTLY, so any output
cell whose value depends on floating-point accumulation order is a
latent hash-red: the engines (and even two runs of one engine) may sum
in different orders. tpch_q9 and tpcds_q89 both failed this way — their
rounded money values sat on a half-cent boundary.

This audit runs every registered oracle in DuckDB twice — single-
threaded and multi-threaded (different partial-aggregation orders) —
and exact-compares the sorted results. A mismatch means the query's
output is not a deterministic function of the data, and its rounding
must be converted to the exact integer-units idiom (queries/_util.py
money_sum docstring).

Usage: python scripts/audit_order_sensitivity.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from flink_1_20_spark.catalog import TABLE_NAMES
from flink_1_20_spark.registry import get_oracles


def run_all(sf: str, threads: int) -> dict[str, list]:
    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    out = {}
    for name, sql in get_oracles().items():
        try:
            rows = con.sql(sql).fetchall()
        except Exception as ex:  # pragma: no cover
            out[name] = [("ERROR", repr(ex)[:120])]
            continue
        out[name] = sorted(
            rows, key=lambda r: tuple((x is None, str(x)) for x in r)
        )
    con.close()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    a = run_all(args.sf, threads=1)
    b = run_all(args.sf, threads=8)
    bad = 0
    for name in a:
        if a[name] != b[name]:
            bad += 1
            # show the first differing cell
            for ra, rb in zip(a[name], b[name]):
                if ra != rb:
                    diff = [
                        (i, x, y) for i, (x, y) in enumerate(zip(ra, rb)) if x != y
                    ]
                    print(f"ORDER-SENSITIVE  {name}: first diff {diff[:3]}")
                    break
            else:
                print(f"ORDER-SENSITIVE  {name}: row-count/shape differs")
    print(f"\n{len(a) - bad} stable, {bad} order-sensitive of {len(a)} oracles")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
