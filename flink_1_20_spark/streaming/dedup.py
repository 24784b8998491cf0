"""Deduplication — keep first/last row per key.

Reference parity: StreamExecDeduplicate.java:89 ("keeps only first row or
last row" per key — an optimized special case of Rank),
RowTimeDeduplicateFunction.java:31 / ProcTimeDeduplicateKeepLastRowFunction.java:32.

Spark mapping (SURVEY.md §2.6):
- streaming keep-first → `dropDuplicatesWithinWatermark` (state expires
  with the watermark — bounded state, Flink's state TTL equivalent)
- batch keep-first/keep-last → row_number() over (key ORDER BY time) = 1
  (same rewrite Flink's planner applies to the rank pattern)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def deduplicate(
    df: DataFrame,
    keys: list[str],
    ts: str,
    keep: str = "first",
    watermark: str | None = None,
) -> DataFrame:
    """Keep the first/last row per `keys`, ordered by event-time `ts`.

    Streaming input: only keep="first" is supported (matching what an
    append-only stream can produce without retraction — Flink emits
    updates for keep-last, which maps to update-mode sinks; see
    StreamExecDeduplicate.java:89 javadoc). State is bounded by
    `watermark`.
    """
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be 'first' or 'last', got {keep!r}")
    if df.isStreaming:
        if keep != "first":
            raise NotImplementedError(
                "streaming keep-last needs retraction (update-mode sink); "
                "use foreachBatch + upsert_foreach_batch instead"
            )
        if watermark is not None:
            return df.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(keys)
        return df.dropDuplicates(keys)
    order = F.col(ts).asc() if keep == "first" else F.col(ts).desc()
    w = Window.partitionBy(*keys).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
