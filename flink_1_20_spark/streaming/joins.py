"""Stream-stream interval join.

Reference parity: StreamExecIntervalJoin.java:101 →
RT/join/interval/RowTimeIntervalJoin.java (each side buffers rows in
keyed state until the other side's watermark passes the join bound).

Spark mapping: watermark both sides + a range condition on the two event
times — Structured Streaming derives the state-cleanup horizon from the
interval bounds exactly like Flink's relative watermark
(SURVEY.md §2.3). Works unchanged on batch inputs (bounds become a plain
non-equi predicate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join where right_ts ∈ [left_ts - lower, left_ts + upper].

    `lower`/`upper` are interval strings (e.g. "5 minutes"). For
    streaming inputs both sides get `watermark` (required for state
    cleanup; outer interval joins additionally require it in Spark).
    """
    if watermark is not None:
        if left.isStreaming:
            left = left.withWatermark(left_ts, watermark)
        if right.isStreaming:
            right = right.withWatermark(right_ts, watermark)
    cond = (
        on
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lower}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return left.join(right, cond, how)


def window_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    size: str,
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Window join (StreamExecWindowJoin.java:69 → WindowJoinOperator):
    rows join iff they share the key AND fall in the same tumbling
    window. Spark-native: equi-join on the `window(ts, size)` struct —
    bounded state (one window per side), cleaned up as the watermark
    passes each window end. Output carries window_start/window_end.
    Works unchanged on batch inputs."""
    if watermark is not None:
        if left.isStreaming:
            left = left.withWatermark(left_ts, watermark)
        if right.isStreaming:
            right = right.withWatermark(right_ts, watermark)
    l = left.withColumn("__w", F.window(left_ts, size))
    r = right.withColumn("__w", F.window(right_ts, size))
    joined = l.join(r, [*keys, "__w"], how)
    return joined.withColumn("window_start", F.col("__w.start")).withColumn(
        "window_end", F.col("__w.end")
    ).drop("__w")
