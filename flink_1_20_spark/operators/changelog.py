"""Changelog (CDC) stream model — RowKind + upsert materialization.

Reference parity: Flink models every stream as a changelog of
INSERT/UPDATE_BEFORE/UPDATE_AFTER/DELETE rows (RowKind.java:31-52,
shortStrings +I/-U/+U/-D); upsert sinks materialize the latest image per
key (SinkUpsertMaterializer.java), and CDC sources (debezium/canal
formats) emit these ops.

Spark-first mapping: RowKind is data, not engine metadata — an `op`
column. Materialization = last-image-per-key, a rank pattern in batch
and a foreachBatch keyed merge in streaming (streaming/sinks.py
`upsert_foreach_batch`). Retraction (-U) rows only matter for
aggregations over the changelog, where they contribute negatively —
`changelog_agg` shows the sum/count case (Flink's retract-aggregate
functions, e.g. RetractableAggregateFunction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

INSERT = "+I"
UPDATE_BEFORE = "-U"
UPDATE_AFTER = "+U"
DELETE = "-D"


def materialize_changelog(
    df: DataFrame, keys: list[str], seq_col: str, op_col: str = "op"
) -> DataFrame:
    """Latest image per key: last row by `seq_col` wins; keys whose last
    op is DELETE disappear (upsert-sink semantics,
    SinkUpsertMaterializer.java). -U rows are ignored for the image (they
    carry the pre-update picture)."""
    effective = df.filter(F.col(op_col) != UPDATE_BEFORE)
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    return (
        effective.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(op_col) != DELETE))
        .drop("__rn")
    )


def changelog_agg(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Retract-aware sum/count over a changelog: +I/+U add, -U/-D
    subtract — the classic retraction aggregate
    (GroupAggFunction.java retract path). A plain groupBy-sum over the
    signed value, so Catalyst still gets map-side partials."""
    sign = F.when(F.col(op_col).isin(INSERT, UPDATE_AFTER), F.lit(1)).otherwise(F.lit(-1))
    signed = df.withColumn("__sign", sign)
    return signed.groupBy(*keys).agg(
        F.sum(F.col(value_col) * F.col("__sign")).alias("net_value"),
        F.sum("__sign").alias("live_rows"),
    )


def drop_update_before(df: DataFrame, op_col: str = "op") -> DataFrame:
    """DropUpdateBefore (StreamExecDropUpdateBefore.java:55): strip -U
    rows for sinks that key on the primary key and only need the after
    image (upsert sinks). A plain filter — kept as a named operator so
    pipelines read like the reference's plans."""
    return df.filter(F.col(op_col) != UPDATE_BEFORE)
