"""Changelog/CDC materialization + count windows (SURVEY.md §2.9).

Reference parity:
- RowKind changelog            RowKind.java:31-52
- upsert materialization       SinkUpsertMaterializer.java
- retract aggregates           GroupAggFunction retract path
- count windows                KeyedStream.countWindow:745
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_1_20_spark.operators.changelog import changelog_agg, materialize_changelog
from flink_1_20_spark.registry import register

from ._util import T

# Synthesize a deterministic changelog from events: per user, ordered by
# ts — signup=+I, click/view/purchase=+U, error=-D. Both engines derive
# it identically.
_CDC_OP = (
    "CASE event_type WHEN 'signup' THEN '+I' WHEN 'error' THEN '-D' ELSE '+U' END"
)


@register(
    "cdc_upsert_materialize",
    oracle=f"""
    WITH log AS (
        SELECT user_id, ts, round(value, 4) AS value, {_CDC_OP} AS op
        FROM events
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) AS rn
        FROM log
    )
    SELECT user_id, ts, value, op FROM ranked WHERE rn = 1 AND op <> '-D'
    """,
)
def cdc_upsert_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert materialization of a changelog: latest image per key,
    deleted keys dropped (SinkUpsertMaterializer.java). One shuffle on
    the key; at scale this is the same rank pattern Flink's
    materializer keeps in state."""
    e = T(spark, sf_dir, "events")
    log = e.select(
        "user_id", "ts", F.round("value", 4).alias("value"), F.expr(_CDC_OP).alias("op")
    )
    return materialize_changelog(log, keys=["user_id"], seq_col="ts", op_col="op")


@register(
    "cdc_retract_agg",
    oracle=f"""
    WITH log AS (
        SELECT user_id, value, {_CDC_OP} AS op FROM events
    )
    SELECT user_id,
           round(sum(value * CASE WHEN op IN ('+I', '+U') THEN 1 ELSE -1 END), 4) AS net_value,
           CAST(sum(CASE WHEN op IN ('+I', '+U') THEN 1 ELSE -1 END) AS BIGINT) AS live_rows
    FROM log GROUP BY user_id
    """,
)
def cdc_retract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retract-aware aggregate over the changelog: -D/-U contribute
    negatively (GroupAggFunction retract path) — expressed as a signed
    sum so map-side partial aggregation still applies."""
    e = T(spark, sf_dir, "events")
    log = e.select("user_id", "value", F.expr(_CDC_OP).alias("op"))
    out = changelog_agg(log, keys=["user_id"], value_col="value", op_col="op")
    return out.select("user_id", F.round("net_value", 4).alias("net_value"), "live_rows")


@register(
    "count_window_tumble",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    )
    SELECT user_id, (rn - 1) // 10 AS win_id,
           count(*) AS n, round(sum(value), 4) AS total,
           min(ts) AS first_ts, max(ts) AS last_ts
    FROM seq GROUP BY user_id, (rn - 1) // 10
    """,
)
def count_window_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling COUNT window (10 rows per key, event-time ordered) —
    KeyedStream.countWindow:745. Batch = row_number div N then hash agg;
    the row_number sort and the agg share the user_id shuffle."""
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .withColumn("win_id", ((F.col("rn") - 1) / 10).cast("bigint"))
        .groupBy("user_id", "win_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )


@register(
    "count_window_slide",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
               count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS n,
               round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 4) AS total
        FROM events
    )
    SELECT user_id, rn AS fire_at, n, total
    FROM seq WHERE rn % 5 = 0
    """,
)
def count_window_slide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding COUNT window (size 10, slide 5 — KeyedStream.countWindow
    (size, slide):745): fire every 5th row per key with the aggregate of
    the last 10 rows. Batch = a ROWS frame + a fire-row filter; both the
    frame and the filter ride one user_id shuffle. (Streaming form:
    streaming/process.py streaming_over_rows emits per row; the slide
    filter is the same modulo predicate.)"""
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(-9, 0)
    return (
        e.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(frame))
        .withColumn("total", F.round(F.sum("value").over(frame), 4))
        .filter(F.col("rn") % 5 == 0)
        .select("user_id", F.col("rn").alias("fire_at"), "n", "total")
    )


@register(
    "changelog_join_incremental",
    oracle="""
    SELECT o_orderkey, c_custkey AS k, round(o_totalprice, 2) AS price,
           c_name, '+I' AS op
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus <> 'F'
    """,
)
def changelog_join_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog equi-join (StreamingJoinOperator.java:36) driven in one
    batch: orders arrive as +I, status-'F' orders are then retracted
    (-D), customers are all +I. The incremental join's net output must
    equal the plain join of the net inputs — which is exactly what the
    oracle computes. Exercises the ΔL⋈R ∪ L⋈ΔR multiset path end-to-end."""
    from flink_1_20_spark.operators.changelog_join import (
        ChangelogJoin,
        changelog_to_counts,
        counts_to_changelog,
    )

    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    left_ins = o.select(
        "o_orderkey",
        F.col("o_custkey").alias("k"),
        F.round("o_totalprice", 2).alias("price"),
        F.lit("+I").alias("op"),
    )
    left_del = (
        o.filter(F.col("o_orderstatus") == "F")
        .select(
            "o_orderkey",
            F.col("o_custkey").alias("k"),
            F.round("o_totalprice", 2).alias("price"),
            F.lit("-D").alias("op"),
        )
    )
    right_ins = c.select(
        F.col("c_custkey").alias("k"), "c_name", F.lit("+I").alias("op")
    )
    j = ChangelogJoin(on=["k"])
    delta = j.process(
        changelog_to_counts(left_ins.unionByName(left_del)),
        changelog_to_counts(right_ins),
    )
    return counts_to_changelog(delta).select("o_orderkey", "k", "price", "c_name", "op")


def _changelog_semi_anti(spark: SparkSession, sf_dir: str, how: str) -> DataFrame:
    """Drive ChangelogJoin(how=semi|anti) in TWO process() steps so the
    existence-transition path runs (right keys appear in step 1, some
    vanish in step 2): step 1 = all inserts, step 2 = retractions of 'F'
    orders (left) and BUILDING-segment customers (right). The
    accumulated delta must equal the semi/anti join of the net inputs —
    which is what the oracle computes (StreamingSemiAntiJoinOperator.java:34)."""
    from flink_1_20_spark.operators.changelog_join import (
        ChangelogJoin,
        _consolidate,
        changelog_to_counts,
        counts_to_changelog,
    )

    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")

    def left(df, op):
        return df.select(
            "o_orderkey",
            F.col("o_custkey").alias("k"),
            F.round("o_totalprice", 2).alias("price"),
            F.lit(op).alias("op"),
        )

    def right(df, op):
        return df.select(F.col("c_custkey").alias("k"), "c_name", F.lit(op).alias("op"))

    j = ChangelogJoin(on=["k"], how=how)
    d1 = j.process(
        changelog_to_counts(left(o, "+I")), changelog_to_counts(right(c, "+I"))
    )
    d2 = j.process(
        changelog_to_counts(left(o.filter(F.col("o_orderstatus") == "F"), "-D")),
        changelog_to_counts(
            right(c.filter(F.col("c_mktsegment") == "BUILDING"), "-D")
        ),
    )
    acc = _consolidate(d1.unionByName(d2))
    return counts_to_changelog(acc).select("o_orderkey", "k", "price", "op")


@register(
    "changelog_join_semi",
    oracle="""
    SELECT o_orderkey, o_custkey AS k, round(o_totalprice, 2) AS price, '+I' AS op
    FROM orders
    WHERE o_orderstatus <> 'F'
      AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment <> 'BUILDING')
    """,
)
def changelog_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming semi join (IN over changelogs): left rows whose key is
    live on the right; right-count 0→>0 / >0→0 transitions emit/retract
    the retained left rows. Net delta == semi join of net inputs."""
    return _changelog_semi_anti(spark, sf_dir, "semi")


@register(
    "changelog_join_anti",
    oracle="""
    SELECT o_orderkey, o_custkey AS k, round(o_totalprice, 2) AS price, '+I' AS op
    FROM orders
    WHERE o_orderstatus <> 'F'
      AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_mktsegment <> 'BUILDING')
    """,
)
def changelog_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming anti join (NOT EXISTS over changelogs): the complement —
    a right key appearing retracts its left rows, vanishing re-emits
    them. Net delta == anti join of net inputs."""
    return _changelog_semi_anti(spark, sf_dir, "anti")
