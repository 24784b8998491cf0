"""Window TVFs — TUMBLE / HOP / CUMULATE / SESSION (batch semantics).

Reference parity (SURVEY.md §2.5):
- TVF definitions      FlinkSqlOperatorTable.java:1296-1299
- exec nodes           stream/StreamExecWindowTableFunction.java:73,
                       StreamExecWindowAggregate.java:90
- aligned slicing      RT/window/tvf/slicing/SliceAssigners.java:46
  (TUMBLE / HOP / CUMULATE share slices between overlapping windows)
- session (unaligned)  RT/window/tvf/unslicing/UnsliceAssigners.java

Spark-first mapping:
- TUMBLE / HOP → built-in `F.window(ts, size[, slide])` — Catalyst expands
  HOP rows into their size/slide windows JVM-side; the aggregation is a
  plain hash agg with map-side partials (the batch analogue of Flink's
  slice sharing: each input row is expanded once, partials combine).
- CUMULATE → no Spark built-in. Expand each row to its cumulative window
  ends with `sequence()` + `explode()` (pure JVM generators, no Python),
  then a plain tumble-style hash agg. Semantics mirror
  CumulativeSliceAssigner: windows [bucket, bucket + k*step), k=1..max/step.
- SESSION → built-in `F.session_window(ts, gap)` (works in batch; merge
  semantics match MergingWindowSet.java:255 — half-open [start, last+gap)).

All four are oracle-checked against DuckDB reformulations (time_bucket /
generate_series / gaps-and-islands).

Scale notes (100 TB): the expansions multiply rows by size/slide (HOP) or
max/step (CUMULATE) *before* the shuffle — partial aggregation collapses
them map-side, so shuffled bytes are bounded by (#groups × #windows), not
input rows. Window aggs shuffle on (window, keys) which is exactly the
grouping key — one shuffle, no re-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_20_spark.registry import register

from ._util import T


@register(
    "wtvf_tumble",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts)                     AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           count(*)             AS n_events,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def wtvf_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR) + group agg
    (SliceAssigners.java:46 `TumblingSliceAssigner`)."""
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "wtvf_hop",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) - k.k * INTERVAL '15 minutes' AS window_start,
           time_bucket(INTERVAL '15 minutes', ts) - k.k * INTERVAL '15 minutes'
               + INTERVAL '1 hour'                                              AS window_end,
           count(*)             AS n_events,
           round(sum(value), 4) AS total_value
    FROM events, generate_series(0, 3) k(k)
    GROUP BY 1, 2
    """,
)
def wtvf_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOP(..., slide 15 min, size 1 hour) — each row lands in 4 windows
    (HoppingSliceAssigner, SliceAssigners.java:46). Spark's window(ts,
    size, slide) does the expansion JVM-side."""
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "wtvf_cumulate",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts)                                AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + k.k * INTERVAL '15 minutes'  AS window_end,
           count(*)             AS n_events,
           round(sum(value), 4) AS total_value
    FROM events, generate_series(1, 4) k(k)
    WHERE ts < time_bucket(INTERVAL '1 hour', ts) + k.k * INTERVAL '15 minutes'
    GROUP BY 1, 2
    """,
)
def wtvf_cumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUMULATE(..., step 15 min, max 1 hour): expanding windows
    [bucket, bucket + k*step), k = 1..4 — a row belongs to every window
    that ends after it (CumulativeSliceAssigner, SliceAssigners.java:46).

    No Spark built-in: generate the candidate ends with sequence() +
    explode() (JVM generators, stays in whole-stage codegen), filter to
    ends after ts, then hash-agg. Row expansion ≤ max/step = 4× before
    map-side partial aggregation collapses it.
    """
    e = T(spark, sf_dir, "events")
    bucket = F.date_trunc("hour", F.col("ts"))
    step = F.expr("INTERVAL 15 minutes")
    return (
        e.withColumn("window_start", bucket)
        .withColumn(
            "window_end",
            F.explode(
                F.sequence(
                    F.col("window_start") + step,
                    F.col("window_start") + F.expr("INTERVAL 1 hour"),
                    step,
                )
            ),
        )
        .filter(F.col("ts") < F.col("window_end"))
        .groupBy("window_start", "window_end")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
    )


@register(
    "wtvf_session",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL '10 minutes'
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
        SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           min(ts)                           AS session_start,
           max(ts) + INTERVAL '10 minutes'   AS session_end,
           count(*)                          AS n_events,
           round(sum(value), 4)              AS total_value
    FROM sess
    GROUP BY user_id, sid
    """,
)
def wtvf_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION(TABLE events PARTITION BY user_id, DESCRIPTOR(ts), gap 10 min)
    (UnsliceAssigners.java / MergingWindowSet.java:255). Spark's built-in
    session_window merges per-key; windows are half-open [first, last+gap).
    Oracle reformulates as gaps-and-islands."""
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "wtvf_window_rank",
    oracle="""
    WITH agg AS (
        SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
               event_type,
               round(sum(value), 4) AS total_value
        FROM events GROUP BY 1, 2
    ), ranked AS (
        SELECT *, rank() OVER (PARTITION BY window_start
                               ORDER BY total_value DESC, event_type) AS rnk
        FROM agg
    )
    SELECT window_start, event_type, total_value, rnk
    FROM ranked WHERE rnk <= 2
    """,
)
def wtvf_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window TopN: rank within each window after a window agg
    (StreamExecWindowRank.java:77 → WindowRankProcessor.java). Batch =
    window-agg then rank partitioned by the window column."""
    from pyspark.sql import Window

    e = T(spark, sf_dir, "events")
    agg = (
        e.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "total_value")
    )
    w = Window.partitionBy("window_start").orderBy(F.desc("total_value"), F.asc("event_type"))
    return agg.withColumn("rnk", F.rank().over(w)).filter(F.col("rnk") <= 2)


@register(
    "wtvf_session_dynamic_gap",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, value,
               CASE WHEN event_type = 'purchase'
                    THEN INTERVAL '30 minutes' ELSE INTERVAL '10 minutes'
               END AS gap
        FROM events
    ), flagged AS (
        SELECT *, CASE WHEN max(ts + gap) OVER (
                            PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                          ) IS NULL
                       OR ts > max(ts + gap) OVER (
                            PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                          )
                  THEN 1 ELSE 0 END AS new_s
        FROM g
    ), sess AS (
        SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           min(ts)              AS session_start,
           max(ts + gap)        AS session_end,
           count(*)             AS n_events,
           round(sum(value), 4) AS total_value
    FROM sess
    GROUP BY user_id, sid
    """,
)
def wtvf_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap session windows (DataStream DynamicSessionWindows /
    SessionWindowTimeGapExtractor): per-event gap — purchases keep the
    session alive 30 min, everything else 10. Spark's session_window
    accepts a gap *expression*; merged window end = max(ts+gap) over the
    session. Oracle = gaps-and-islands with a running max end (a plain
    lag is wrong once gaps vary). Single shuffle on user_id either way."""
    e = T(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "purchase", F.lit("30 minutes")).otherwise(
        F.lit("10 minutes")
    )
    return (
        e.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
