"""Event-time window aggregations (streaming + batch unified).

Reference parity: Flink window TVFs TUMBLE/HOP/CUMULATE/SESSION
(FlinkSqlOperatorTable.java:1296-1299, SliceAssigners.java:46,
UnsliceAssigners.java; exec StreamExecWindowAggregate.java:90).

Each helper accepts a DataFrame that may be batch or streaming. For
streaming input, pass `watermark=` (e.g. "10 minutes") — windows then
finalize in append mode once the watermark passes their end, which is
Flink's EventTimeTrigger.onEventTime firing (EventTimeTriggers.java:344);
rows later than the watermark are dropped (Flink default: no side output,
SURVEY.md §2.9).

Scale: window aggs shuffle once on the grouping key (window [, keys]);
HOP/CUMULATE expand rows (size/slide resp. max/step ×) *before* map-side
partial aggregation, so shuffled bytes stay proportional to #groups.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _with_watermark(df: DataFrame, ts: str, watermark: str | None) -> DataFrame:
    if watermark is not None and df.isStreaming:
        return df.withWatermark(ts, watermark)
    return df


def _agg_windowed(
    df: DataFrame, window_col: Column, keys: list[str], aggs: Mapping[str, Column]
) -> DataFrame:
    grouped = df.groupBy(window_col.alias("w"), *keys)
    out = grouped.agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *keys,
        *aggs.keys(),
    )


def tumble_window_agg(
    df: DataFrame,
    ts: str,
    size: str,
    keys: list[str] | None = None,
    aggs: Mapping[str, Column] | None = None,
    watermark: str | None = None,
    offset: str | None = None,
) -> DataFrame:
    """TUMBLE: fixed, non-overlapping windows of `size` over event time.
    `offset` shifts window alignment (Flink's window offset parameter,
    TumblingEventTimeWindows.of(size, offset) → Spark's startTime)."""
    df = _with_watermark(df, ts, watermark)
    win = F.window(ts, size, size, offset) if offset is not None else F.window(ts, size)
    return _agg_windowed(df, win, keys or [], aggs or {"n": F.count("*")})


def hop_window_agg(
    df: DataFrame,
    ts: str,
    size: str,
    slide: str,
    keys: list[str] | None = None,
    aggs: Mapping[str, Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """HOP (sliding): windows of `size` starting every `slide`."""
    df = _with_watermark(df, ts, watermark)
    return _agg_windowed(df, F.window(ts, size, slide), keys or [], aggs or {"n": F.count("*")})


def session_window_agg(
    df: DataFrame,
    ts: str,
    gap: str,
    keys: list[str] | None = None,
    aggs: Mapping[str, Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """SESSION: per-key merged windows closed by `gap` of inactivity.
    Half-open [first_event, last_event + gap) — MergingWindowSet.java:255."""
    df = _with_watermark(df, ts, watermark)
    return _agg_windowed(df, F.session_window(ts, gap), keys or [], aggs or {"n": F.count("*")})


def cumulate_window_agg(
    df: DataFrame,
    ts: str,
    step: str,
    max_size: str,
    keys: list[str] | None = None,
    aggs: Mapping[str, Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """CUMULATE: expanding windows [bucket, bucket + k*step), k = 1..max/step
    (CumulativeSliceAssigner, SliceAssigners.java:46). No Spark built-in —
    each row is expanded to the window-ends that contain it via
    `sequence()`/`explode()` (JVM generators), then tumble-style hash agg.

    `step` and `max_size` are interval strings, e.g. "15 minutes"/"1 hour";
    max_size must be a multiple of step (Flink validates the same,
    CumulativeSliceAssigner precondition).
    """
    df = _with_watermark(df, ts, watermark)
    keys = keys or []
    aggs = aggs or {"n": F.count("*")}
    step_i = F.expr(f"INTERVAL {step}")
    max_i = F.expr(f"INTERVAL {max_size}")
    # Bucket start: align ts down to max_size. window() struct gives the
    # aligned start for arbitrary intervals (not just calendar units).
    bucket = F.window(ts, max_size).getField("start")
    expanded = (
        df.withColumn("window_start", bucket)
        .withColumn(
            "window_end",
            F.explode(
                F.sequence(F.col("window_start") + step_i, F.col("window_start") + max_i, step_i)
            ),
        )
        .filter(F.col(ts) < F.col("window_end"))
    )
    # Streaming note: window_start/window_end are derived columns, so Spark
    # does not track event time through them — run streaming cumulate in
    # `update`/`complete` output mode (each micro-batch re-emits updated
    # windows, Flink's early-fire equivalent). Batch mode is exact.
    out = expanded.groupBy("window_start", "window_end", *keys).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    return out.select("window_start", "window_end", *keys, *aggs.keys())
