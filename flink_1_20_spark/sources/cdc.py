"""CDC-JSON formats: Debezium envelope → RowKind changelog rows.

Reference parity: flink-formats/flink-json CDC factories
(debezium-json / canal-json / maxwell-json) — each decodes a change
envelope into RowKind-tagged rows (RowKind.java:31-52):
Debezium op 'c'/'r' → +I, 'u' → -U (before) and +U (after), 'd' → -D.

Spark mapping: `from_json` over the envelope (JVM-side JSON parsing),
then explode the per-op row images. Output plugs straight into
operators/changelog.py (materialize_changelog / changelog_agg).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_1_20_spark.operators.changelog import DELETE, INSERT, UPDATE_AFTER, UPDATE_BEFORE


def debezium_envelope_schema(payload_ddl: str) -> str:
    """Envelope schema for a given payload row type (DDL string),
    e.g. payload_ddl='id bigint, name string'."""
    return (
        f"before struct<{payload_ddl}>, after struct<{payload_ddl}>, "
        "op string, ts_ms bigint"
    )


def parse_debezium(
    df: DataFrame, value_col: str, payload_ddl: str
) -> DataFrame:
    """Decode Debezium-JSON change events into a RowKind changelog.

    Each update produces TWO rows (-U with the before image, +U with the
    after image) — the full changelog DebeziumJsonDeserializationSchema
    emits. Output columns: op, ts_ms, then the payload fields."""
    env = F.from_json(F.col(value_col), debezium_envelope_schema(payload_ddl))
    base = df.withColumn("__env", env).select("__env.*")
    inserts = base.filter(F.col("op").isin("c", "r")).select(
        F.lit(INSERT).alias("row_kind"), "ts_ms", "after.*"
    )
    upd_before = base.filter(F.col("op") == "u").select(
        F.lit(UPDATE_BEFORE).alias("row_kind"), "ts_ms", "before.*"
    )
    upd_after = base.filter(F.col("op") == "u").select(
        F.lit(UPDATE_AFTER).alias("row_kind"), "ts_ms", "after.*"
    )
    deletes = base.filter(F.col("op") == "d").select(
        F.lit(DELETE).alias("row_kind"), "ts_ms", "before.*"
    )
    return inserts.unionByName(upd_before).unionByName(upd_after).unionByName(deletes)
