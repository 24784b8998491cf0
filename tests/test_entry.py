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


def test_all_queries_run_at_smoke_sf(spark, sf_dir):
    qs = e.queries()
    for name, fn in sorted(qs.items()):
        df = fn(spark, sf_dir)
        assert df.columns, f"{name}: no columns"
        df.limit(5).collect()  # executes the plan end-to-end
