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


def parse_ogg(df: DataFrame, value_col: str, payload_ddl: str) -> DataFrame:
    """Decode Oracle GoldenGate (Ogg) JSON change events into a RowKind
    changelog (flink-formats/flink-json ogg/OggJsonFormatFactory.java:58,
    OggJsonDeserializationSchema.java:169-189).

    Envelope: {"before": {...}, "after": {...}, "op_type": "I|U|D",
    "op_ts": "...", ...}. op_type I → +I (after image); U → -U (before)
    and +U (after); D → -D (before image). The reference raises on
    U/D with a null before image (REPLICA_IDENTITY_EXCEPTION) — here
    such rows surface with null payload fields, visible downstream.
    Output columns: row_kind, op_ts, then the payload fields."""
    env_ddl = (
        f"before struct<{payload_ddl}>, after struct<{payload_ddl}>, "
        "op_type string, op_ts string"
    )
    base = df.withColumn("__env", F.from_json(F.col(value_col), env_ddl)).select("__env.*")
    inserts = base.filter(F.col("op_type") == "I").select(
        F.lit(INSERT).alias("row_kind"), "op_ts", "after.*"
    )
    upd_before = base.filter(F.col("op_type") == "U").select(
        F.lit(UPDATE_BEFORE).alias("row_kind"), "op_ts", "before.*"
    )
    upd_after = base.filter(F.col("op_type") == "U").select(
        F.lit(UPDATE_AFTER).alias("row_kind"), "op_ts", "after.*"
    )
    deletes = base.filter(F.col("op_type") == "D").select(
        F.lit(DELETE).alias("row_kind"), "op_ts", "before.*"
    )
    return inserts.unionByName(upd_before).unionByName(upd_after).unionByName(deletes)


def _merged_old(fields: list[str], old_struct: str, new_struct: str) -> list[Column]:
    """Per-field before-image: Canal/Maxwell `old` carries only the
    CHANGED columns — unchanged ones are taken from the after image
    (same fill-in CanalJsonDeserializationSchema applies)."""
    return [
        F.coalesce(F.col(f"{old_struct}.{f}"), F.col(f"{new_struct}.{f}")).alias(f)
        for f in fields
    ]


def parse_canal(df: DataFrame, value_col: str, payload_ddl: str) -> DataFrame:
    """Decode Canal-JSON change events into a RowKind changelog.

    Canal batches rows: `data` is an ARRAY of row images; for UPDATE,
    `old[i]` holds row i's changed columns. Envelope:
    {"data":[...], "old":[...]|null, "type":"INSERT|UPDATE|DELETE", "ts":...}.
    Output columns: row_kind, ts_ms, then the payload fields.
    (flink-formats/flink-json canal-json factory parity.)"""
    from pyspark.sql.types import StructType

    fields = StructType.fromDDL(payload_ddl).fieldNames()
    env_ddl = (
        f"data array<struct<{payload_ddl}>>, old array<struct<{payload_ddl}>>, "
        "type string, ts bigint"
    )
    base = (
        df.withColumn("__env", F.from_json(F.col(value_col), env_ddl))
        .select("__env.*")
        .select(
            "type",
            F.col("ts").alias("ts_ms"),
            F.posexplode("data").alias("__i", "__row"),
            F.col("old").alias("__olds"),
        )
        .withColumn("__old", F.col("__olds").getItem(F.col("__i")))
    )
    inserts = base.filter(F.col("type") == "INSERT").select(
        F.lit(INSERT).alias("row_kind"), "ts_ms", "__row.*"
    )
    deletes = base.filter(F.col("type") == "DELETE").select(
        F.lit(DELETE).alias("row_kind"), "ts_ms", "__row.*"
    )
    upd = base.filter(F.col("type") == "UPDATE")
    upd_before = upd.select(
        F.lit(UPDATE_BEFORE).alias("row_kind"),
        "ts_ms",
        *_merged_old(fields, "__old", "__row"),
    )
    upd_after = upd.select(F.lit(UPDATE_AFTER).alias("row_kind"), "ts_ms", "__row.*")
    return inserts.unionByName(upd_before).unionByName(upd_after).unionByName(deletes)


def parse_maxwell(df: DataFrame, value_col: str, payload_ddl: str) -> DataFrame:
    """Decode Maxwell-JSON change events into a RowKind changelog.

    One row image per message: {"data":{...}, "old":{...changed cols...},
    "type":"insert|update|delete", "ts":...}. Output columns: row_kind,
    ts_ms, then the payload fields.
    (flink-formats/flink-json maxwell-json factory parity.)"""
    from pyspark.sql.types import StructType

    fields = StructType.fromDDL(payload_ddl).fieldNames()
    env_ddl = (
        f"data struct<{payload_ddl}>, old struct<{payload_ddl}>, type string, ts bigint"
    )
    base = df.withColumn("__env", F.from_json(F.col(value_col), env_ddl)).select("__env.*")
    base = base.withColumn("ts_ms", F.col("ts"))
    inserts = base.filter(F.col("type") == "insert").select(
        F.lit(INSERT).alias("row_kind"), "ts_ms", "data.*"
    )
    deletes = base.filter(F.col("type") == "delete").select(
        F.lit(DELETE).alias("row_kind"), "ts_ms", "data.*"
    )
    upd = base.filter(F.col("type") == "update")
    upd_before = upd.select(
        F.lit(UPDATE_BEFORE).alias("row_kind"), "ts_ms", *_merged_old(fields, "old", "data")
    )
    upd_after = upd.select(F.lit(UPDATE_AFTER).alias("row_kind"), "ts_ms", "data.*")
    return inserts.unionByName(upd_before).unionByName(upd_after).unionByName(deletes)
