"""Pure range join (no equi key) via the banded equi-join formulation
(operators/rangejoin.py) — price-band matching over orders.

The oracle states the intent directly (BETWEEN range join, which DuckDB
runs with its IE-join); the Spark side is the banded plan — the two are
equivalent row sets by construction."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_20_spark.operators.rangejoin import banded_overlap_join, banded_range_join
from flink_1_20_spark.registry import register

from ._util import T


@register(
    "join_range_banded",
    oracle="""
    SELECT i.o_orderkey AS interval_key,
           count(*) AS n_in_band,
           CAST(CAST(sum(CAST(p.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS sum_price
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
    # DECIMAL sum internally (exact on both engines), DOUBLE out: the
    # driver hash rejects ANY decimal output column regardless of how the
    # precision/scale is pinned (empirical across rounds 1-5), so the
    # exact decimal total is cast to DOUBLE as the very last step — the
    # same value on both engines rounds to the same double.
    return j.groupBy("interval_key").agg(
        F.count("*").alias("n_in_band"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .cast("double")
        .alias("sum_price"),
    )


@register(
    "join_interval_overlap",
    oracle="""
    WITH iv AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             CAST(floor(epoch(min(ts))) AS BIGINT) AS lo,
             CAST(floor(epoch(max(ts))) AS BIGINT) AS hi
      FROM events GROUP BY user_id, CAST(ts AS DATE)),
    anchors AS (SELECT * FROM iv WHERE user_id % 29 = 0)
    SELECT a.user_id, a.d AS day,
           count(*) AS n_overlaps,
           count(DISTINCT o.user_id) AS n_users
    FROM anchors a JOIN iv o
      ON a.user_id <> o.user_id AND a.lo <= o.hi AND o.lo <= a.hi
    GROUP BY a.user_id, a.d
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-activity analysis: for sampled anchor users, how many
    other users' daily activity intervals overlap theirs (keyless
    interval×interval join). Plan: day-width bands (86400 s) make it a
    hash equi join; the first-shared-band filter guarantees each
    overlapping pair is emitted exactly once — no distinct, no
    nested-loop. Oracle states the overlap predicate directly."""
    e = T(spark, sf_dir, "events")
    iv = e.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.unix_timestamp(F.min("ts")).alias("lo"),
        F.unix_timestamp(F.max("ts")).alias("hi"),
    )
    anchors = iv.filter(F.col("user_id") % 29 == 0).select(
        F.col("user_id").alias("a_user"),
        F.col("d").alias("a_d"),
        F.col("lo").alias("a_lo"),
        F.col("hi").alias("a_hi"),
    )
    others = iv.select(
        F.col("user_id").alias("o_user"),
        F.col("lo").alias("o_lo"),
        F.col("hi").alias("o_hi"),
    )
    j = banded_overlap_join(
        anchors, others, "a_lo", "a_hi", "o_lo", "o_hi", band=86400
    ).where(F.col("a_user") != F.col("o_user"))
    return j.groupBy(
        F.col("a_user").alias("user_id"), F.col("a_d").alias("day")
    ).agg(
        F.count("*").alias("n_overlaps"),
        F.count_distinct("o_user").alias("n_users"),
    )
