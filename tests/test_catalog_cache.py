"""Catalog handle/view state (r13): resolved tables are registered once
per (session, sf_dir, table) under private temp views and served as
fresh relation references — repeat resolutions skip the file-listing +
footer-read rebuild, any repoint (new sf_dir) re-resolves, and
self-joins get distinct expression ids per reference.  No rows are
ever cached: the view holds a lazy plan over the parquet files.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_1_20_spark.catalog import (
    _HANDLES,
    read_table,
    register_view,
    register_views,
)

SF_A = "/root/testdata/sf0.001"
SF_B = "/root/testdata/sf0.01"


def test_read_table_resolves_once_per_sf(spark):
    a1 = read_table(spark, SF_A, "nation")
    n_before = len(_HANDLES)
    a2 = read_table(spark, SF_A, "nation")
    # second resolution is served from the catalog: same handle, no new
    # entry, no rebuild; a different sf_dir resolves separately
    assert a1 is a2
    assert len(_HANDLES) == n_before
    assert "sf0.001" in a1.inputFiles()[0]
    b = read_table(spark, SF_B, "nation")
    assert "sf0.01" in b.inputFiles()[0]


def test_read_table_fresh_self_join_disambiguates(spark):
    """fresh=True must behave like a separate read (fresh expression
    ids): a self-join through the one shared object trips Spark's
    ambiguous-self-join analysis (test_plans caught this on q30/q81)."""
    c1 = read_table(spark, SF_A, "customer")
    c2 = read_table(spark, SF_A, "customer", fresh=True)
    out = c1.join(
        c2.select(F.col("c_custkey").alias("k2"), "c_nationkey"),
        c1.c_custkey == F.col("k2"),
    )
    assert out.count() == c1.count()


def test_view_repoints_across_sf_switch(spark):
    """The stale-skip hazard: V/register_view must never skip a repoint.
    Register at SF_A, bulk-re-register at SF_B (register_views), then
    request SF_A again — the view must serve SF_A rows, not SF_B's."""
    register_view(spark, SF_A, "customer")
    n_a = spark.table("customer").count()
    register_views(spark, SF_B)
    n_b = spark.table("customer").count()
    assert n_a != n_b  # scale factors differ by construction
    register_view(spark, SF_A, "customer")
    assert spark.table("customer").count() == n_a
    # and the skip path: re-registering the same key is a no-op that
    # still serves the right data
    register_view(spark, SF_A, "customer")
    assert spark.table("customer").count() == n_a
