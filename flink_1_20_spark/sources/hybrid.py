"""Hybrid source: bounded backfill then switch to the live stream.

Reference parity: HybridSource.java (flink-connector-base) — reads a
bounded source (historical files) to its end, then switches to an
unbounded source (e.g. Kafka) at the handoff position.

Spark mapping: batch and streaming DataFrames can't union directly;
the idiomatic equivalent is two legs sharing one sink —
1. bounded leg: `spark.read` over history, written with `write_file`
2. live leg: `readStream` filtered to rows AFTER the handoff position
The `cutoff` predicate is the handoff: rows ≤ cutoff belong to the
bounded leg, rows > cutoff to the stream — no gap, no double count
(HybridSource's switched-source start position).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def hybrid_source(
    spark: SparkSession,
    history_path: str,
    live_path: str,
    schema: StructType | str,
    cutoff_col: str,
    cutoff,
    fmt: str = "json",
) -> tuple[DataFrame, DataFrame]:
    """Return (bounded_history, live_stream) split exactly at `cutoff`.

    Drive both into the same sink: history via a one-shot batch write,
    the stream via writeStream — together they form the continuous
    timeline HybridSource provides."""
    history = (
        spark.read.format(fmt).schema(schema).load(history_path).filter(F.col(cutoff_col) <= cutoff)
    )
    live = (
        spark.readStream.format(fmt)
        .schema(schema)
        .load(live_path)
        .filter(F.col(cutoff_col) > cutoff)
    )
    return history, live
