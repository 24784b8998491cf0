"""Pure range join (no equi key) via the banded equi-join formulation
(operators/rangejoin.py) — price-band matching over orders.

The oracle states the intent directly (BETWEEN range join, which DuckDB
runs with its IE-join); the Spark side is the banded plan — the two are
equivalent row sets by construction."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_20_spark.operators.rangejoin import banded_range_join
from flink_1_20_spark.registry import register

from ._util import T


@register(
    "join_range_banded",
    oracle="""
    SELECT i.o_orderkey AS interval_key,
           count(*) AS n_in_band,
           sum(CAST(p.o_totalprice AS DECIMAL(18,2))) AS sum_price
    FROM (SELECT o_orderkey, o_totalprice - 500 AS lo, o_totalprice + 500 AS hi
          FROM orders WHERE o_orderkey % 100 = 0) i
    JOIN orders p ON p.o_totalprice BETWEEN i.lo AND i.hi
    GROUP BY i.o_orderkey
    """,
)
def join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total price falls within ±500 of each sampled
    anchor order — a keyless range join. Plan: band quantization (width
    1000 ≈ interval width → ~2 bands/interval) turns it into a hash
    equi-join; NO nested-loop, no O(n·m) compare."""
    o = T(spark, sf_dir, "orders")
    intervals = o.filter(F.col("o_orderkey") % 100 == 0).select(
        F.col("o_orderkey").alias("interval_key"),
        (F.col("o_totalprice") - 500).alias("lo"),
        (F.col("o_totalprice") + 500).alias("hi"),
    )
    points = o.select(F.col("o_totalprice"))
    j = banded_range_join(points, intervals, "o_totalprice", "lo", "hi", band=1000.0)
    # DECIMAL sum: exact on both engines — avg-of-double rounds
    # divergently at half-cent boundaries (see queries/_util.money)
    return j.groupBy("interval_key").agg(
        F.count("*").alias("n_in_band"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("sum_price"),
    )
