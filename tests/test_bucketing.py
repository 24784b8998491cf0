"""Bucketed tables: pre-shuffled layouts that make repeated joins/aggs
on the bucket key exchange-free.

Reference parity: Flink exposes the same idea as partitioned/bucketed
catalog tables + `SupportsBucketing` on sinks; at the execution level it
is Spark's bucketBy — data pre-hash-partitioned on disk so the join
reads co-located buckets instead of shuffling (SURVEY.md §4.2).
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def warehouse_tables(spark, sf_dir, tmp_path):
    names = ["b_orders", "b_lineitem"]
    yield names
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_bucketed_join_has_no_exchange(spark, sf_dir, warehouse_tables):
    from flink_1_20_spark.catalog import read_table

    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    (orders.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .saveAsTable("b_orders"))
    (lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .saveAsTable("b_lineitem"))

    joined = (
        spark.table("b_orders")
        .join(spark.table("b_lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the join itself must not shuffle either side (buckets are co-located);
    # only the final small aggregation exchanges
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    # correctness: equals the plain join
    expected = (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority").agg(F.count("*").alias("n"))
    )
    got = {r["o_orderpriority"]: r["n"] for r in joined.collect()}
    exp = {r["o_orderpriority"]: r["n"] for r in expected.collect()}
    assert got == exp
