"""Driver-contract smoke tests: entry(), queries(), oracle_sql()."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e


def test_entry_runs(spark):
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["n_name", "revenue"]


def test_queries_and_oracles_consistent():
    qs = e.queries()
    oracles = e.oracle_sql()
    assert qs, "no queries registered"
    # every oracle key must have a matching query
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name


def test_driver_priority_window():
    """The driver checks the first 50 registered queries; the curated
    prefix must be exactly 50 names, all registered, all oracle-backed,
    and must lead iteration order of queries() AND oracle_sql()."""
    from flink_1_20_spark.registry import DRIVER_PRIORITY

    qs, oracles = e.queries(), e.oracle_sql()
    assert len(DRIVER_PRIORITY) == 50
    assert len(set(DRIVER_PRIORITY)) == 50
    missing = [n for n in DRIVER_PRIORITY if n not in qs]
    assert not missing, f"priority names not registered: {missing}"
    no_oracle = [n for n in DRIVER_PRIORITY if n not in oracles]
    assert not no_oracle, f"priority names without oracle: {no_oracle}"
    assert tuple(list(qs)[:50]) == DRIVER_PRIORITY
    assert tuple(list(oracles)[:50]) == DRIVER_PRIORITY


def test_all_queries_run_at_smoke_sf(spark, sf_dir):
    qs = e.queries()
    for name, fn in sorted(qs.items()):
        df = fn(spark, sf_dir)
        assert df.columns, f"{name}: no columns"
        df.limit(5).collect()  # executes the plan end-to-end
