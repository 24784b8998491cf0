"""Tests: file connectors (csv/json/parquet, partitioned writes with
pruning) and the KeyedProcessFunction-equivalent stateful operator.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from flink_1_20_spark.sources import read_file, write_file, write_partitioned
from flink_1_20_spark.streaming import file_source, running_aggregate, run_to_memory


def test_csv_json_parquet_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id bigint, name string, v double"
    )
    for fmt in ("parquet", "json", "csv"):
        path = str(tmp_path / fmt)
        write_file(df, path, fmt=fmt, num_files=1)
        back = read_file(spark, path, fmt=fmt, schema="id bigint, name string, v double")
        got = sorted((r["id"], r["name"], r["v"]) for r in back.collect())
        assert got == [(1, "a", 1.5), (2, "b", 2.5)], fmt


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    from flink_1_20_spark.catalog import read_table

    path = str(tmp_path / "events_by_type")
    e = read_table(spark, sf_dir, "events")
    write_partitioned(e, path, ["event_type"])
    # partition dirs exist
    assert any(d.startswith("event_type=") for d in os.listdir(path))
    back = read_file(spark, path).filter(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan or "event_type" in plan.split(
        "PartitionFilters"
    )[1][:120], "partition filter not pushed to directory pruning"
    n_click = e.filter(F.col("event_type") == "click").count()
    assert back.count() == n_click


def test_running_aggregate_state_across_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)

    def drop(batch_no, rows):
        with open(os.path.join(src, f"b{batch_no}.json"), "w") as f:
            for uid, v in rows:
                f.write(json.dumps({"user_id": uid, "value": v}) + "\n")

    drop(0, [(1, 10.0), (1, 5.0), (2, 1.0)])
    stream = file_source(
        spark, src, schema="user_id bigint, value double", fmt="json"
    )
    out = running_aggregate(stream, keys=["user_id"], value_col="value")
    q = run_to_memory(out, "running_out", output_mode="update")
    try:
        q.processAllAvailable()
        drop(1, [(1, 2.0)])  # state must carry: user 1 → n=3, total=17
        q.processAllAvailable()
        rows = spark.table("running_out").collect()
    finally:
        q.stop()
    # update-mode memory sink appends each emission (collect order is not
    # chronological) — take the emission with the highest running count
    latest = {}
    for r in rows:
        if r["user_id"] not in latest or r["n"] > latest[r["user_id"]][0]:
            latest[r["user_id"]] = (r["n"], r["total"])
    assert latest[1] == (3, 17.0)
    assert latest[2] == (1, 1.0)


def test_avro_protobuf_gated(spark, tmp_path):
    """Avro/protobuf are external Spark modules — absent here, the
    helpers must fail loudly with the deployment instruction, never
    silently mis-read."""
    import pytest

    from flink_1_20_spark.sources.connectors import (
        avro_available,
        decode_protobuf,
        read_avro,
    )

    if avro_available(spark):
        pytest.skip("spark-avro present — gating not exercised")
    with pytest.raises(NotImplementedError, match="spark-avro"):
        read_avro(spark, str(tmp_path / "x.avro"))
    raw = spark.createDataFrame([(bytearray(b"\x00"),)], "value binary")
    with pytest.raises(NotImplementedError):
        decode_protobuf(raw, "value", "M", str(tmp_path / "d.desc")).collect()
