"""Streaming over-aggregate (ROWS BETWEEN n PRECEDING) and async I/O."""

from __future__ import annotations

import json
import os

from flink_1_20_spark.operators.async_io import async_enrich
from flink_1_20_spark.streaming import file_source, run_to_memory
from flink_1_20_spark.streaming.process import streaming_over_rows


def _drop(src, n, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, f"b{n}.json"), "w") as f:
        for uid, t, v in rows:
            f.write(json.dumps({"user_id": uid, "ts": t, "value": v}) + "\n")


def test_streaming_over_rows_window_spans_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    _drop(src, 0, [(1, "2024-01-01T10:00:00", 1.0), (1, "2024-01-01T10:01:00", 2.0)])
    stream = file_source(spark, src, "user_id bigint, ts timestamp, value double", fmt="json")
    out = streaming_over_rows(
        stream, keys=["user_id"], ts="ts", value_col="value", n_preceding=2,
        output_schema="user_id bigint, ts timestamp, value double,"
                      " win_sum double, win_cnt bigint, win_avg double",
    )
    q = run_to_memory(out, "over_out", output_mode="update")
    try:
        q.processAllAvailable()
        # rows 3 and 4 arrive later: window of 3 rows must span batches
        _drop(src, 1, [(1, "2024-01-01T10:02:00", 4.0), (1, "2024-01-01T10:03:00", 8.0)])
        q.processAllAvailable()
        rows = {r["ts"].isoformat(): (r["win_sum"], r["win_cnt"]) for r in
                spark.table("over_out").collect()}
    finally:
        q.stop()
    assert rows == {
        "2024-01-01T10:00:00": (1.0, 1),
        "2024-01-01T10:01:00": (3.0, 2),
        "2024-01-01T10:02:00": (7.0, 3),   # 1+2+4
        "2024-01-01T10:03:00": (14.0, 3),  # 2+4+8 — row 1 evicted
    }


def test_async_enrich_ordered(spark):
    df = spark.createDataFrame([(i,) for i in range(20)], "id bigint")

    async def fake_service(row):
        import asyncio

        await asyncio.sleep(0.001 * (row["id"] % 3))  # out-of-order completion
        return {"doubled": row["id"] * 2}

    out = async_enrich(df, fake_service, "id bigint, doubled bigint", max_in_flight=8)
    got = {r["id"]: r["doubled"] for r in out.collect()}
    assert got == {i: i * 2 for i in range(20)}


def test_streaming_over_range_time_interval_spans_batches(spark, tmp_path):
    """Event-time RANGE frame (RowTimeRangeBoundedPrecedingFunction):
    trailing 1-hour window — old rows age OUT by time (not row count),
    the retained interval spans micro-batches, and equal-ts rows are
    frame peers that see each other."""
    from flink_1_20_spark.streaming.process import streaming_over_range

    src = str(tmp_path / "in_rng")
    _drop(src, 0, [(1, "2024-01-01T10:00:00", 1.0), (1, "2024-01-01T10:30:00", 2.0)])
    stream = file_source(spark, src, "user_id bigint, ts timestamp, value double", fmt="json")
    out = streaming_over_range(
        stream, keys=["user_id"], ts="ts", value_col="value", range_seconds=3600,
        output_schema="user_id bigint, ts timestamp, value double,"
                      " win_sum double, win_cnt bigint, win_avg double",
    )
    q = run_to_memory(out, "over_rng_out", output_mode="update")
    try:
        q.processAllAvailable()
        # batch 1: 10:45 sees all three (state spans batches); the two
        # 11:31 peers drop 10:00/10:30 (aged out) and include each other
        _drop(src, 1, [
            (1, "2024-01-01T10:45:00", 4.0),
            (1, "2024-01-01T11:31:00", 8.0),
            (1, "2024-01-01T11:31:00", 16.0),
        ])
        q.processAllAvailable()
        rows = [(r["ts"].isoformat(), r["value"], r["win_sum"], r["win_cnt"])
                for r in spark.table("over_rng_out").collect()]
    finally:
        q.stop()
    assert sorted(rows) == [
        ("2024-01-01T10:00:00", 1.0, 1.0, 1),
        ("2024-01-01T10:30:00", 2.0, 3.0, 2),
        ("2024-01-01T10:45:00", 4.0, 7.0, 3),
        ("2024-01-01T11:31:00", 8.0, 28.0, 3),
        ("2024-01-01T11:31:00", 16.0, 28.0, 3),
    ]
