"""KeyedProcessFunction v2 (transformWithStateInPandas): named state +
real timers with on_timer callbacks — SURVEY.md §2.9 keyed state/timers
at full Flink fidelity (KeyedProcessFunction.java:53 processElement:71
onTimer:85)."""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

# the transformWithState python worker speaks protobuf-RPC to the JVM
# state server; without the google.protobuf runtime the query fails at
# StreamingPythonRunner init (see process_v2 module docstring)
pytestmark = pytest.mark.skipif(
    importlib.util.find_spec("google") is None
    or importlib.util.find_spec("google.protobuf") is None,
    reason="google.protobuf runtime not installed (PERMANENTLY "
    "environment-blocked: probed 2026-08-14, re-confirmed 2026-08-15 "
    "r9/r10 AND again 2026-08-15 r11 (import fails AND pip download "
    "cannot resolve any index — DNS-level) — no protobuf wheel/source "
    "on disk, no network to install or vendor; see README process_v2 "
    "note)",
)
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from flink_1_20_spark.streaming import file_source, run_to_memory
from flink_1_20_spark.streaming.process_v2 import (
    KeyedProcessFunction,
    keyed_process_v2,
)

SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _write_batch(path: str, rows: list[tuple], batch_no: int) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, f"batch{batch_no}.json"), "w") as f:
        for ts, uid, et, val in rows:
            f.write(
                json.dumps(
                    {"ts": ts, "user_id": uid, "event_type": et, "value": val}
                )
                + "\n"
            )


@pytest.fixture()
def rocksdb_state(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    yield
    if old is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, old)


def test_value_state_survives_batches(spark, tmp_path, rocksdb_state):
    # defined in-function so cloudpickle ships it by VALUE — the
    # streaming python runner cannot import the tests/ directory
    class CountAndSum(KeyedProcessFunction):
        def open(self, ctx):
            self.acc = ctx.value_state("acc", "n bigint, total double")

        def process_element(self, row, ctx):
            n, total = self.acc.value() or (0, 0.0)
            n, total = n + 1, total + float(row.value)
            self.acc.update((n, total))
            yield {"user_id": ctx.key, "n": n, "total": total}

    src = str(tmp_path / "src")
    _write_batch(src, [("2024-01-01T10:00:10", 1, "a", 1.0),
                       ("2024-01-01T10:01:00", 1, "a", 2.0),
                       ("2024-01-01T10:02:00", 2, "b", 5.0)], 0)
    stream = file_source(spark, src, SCHEMA)
    out = keyed_process_v2(
        stream,
        ["user_id"],
        CountAndSum,
        "user_id bigint, n bigint, total double",
        output_mode="Update",
        time_mode="None",
    )
    q = run_to_memory(out, "pv2_counts", output_mode="update")
    try:
        q.processAllAvailable()
        _write_batch(src, [("2024-01-01T10:05:00", 1, "a", 4.0)], 1)
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT user_id, max(n) AS n, max(total) AS total "
            "FROM pv2_counts GROUP BY user_id"
        ).collect()
        got = {r.user_id: (r.n, r.total) for r in rows}
        # state crossed the micro-batch boundary: user 1 reached n=3
        assert got == {1: (3, 7.0), 2: (1, 5.0)}
    finally:
        q.stop()


def test_event_time_timer_fires_on_watermark(spark, tmp_path, rocksdb_state):
    class IdleFlush(KeyedProcessFunction):
        """Buffer values in ListState; an event-time timer at
        last_ts+5min (re-registered per element — Flink's classic
        idle-session flush) emits the buffered sum when the watermark
        passes it."""

        GAP_MS = 5 * 60 * 1000

        def open(self, ctx):
            self.buf = ctx.list_state("buf", "v double")
            self.deadline = ctx.value_state("deadline", "t bigint")

        def process_element(self, row, ctx):
            self.buf.add(float(row.value))
            old = self.deadline.value()
            if old is not None:
                ctx.timer_service.delete_timer(old)
            ts_ms = int(row.ts.timestamp() * 1000)
            new_deadline = ts_ms + self.GAP_MS
            ctx.timer_service.register_timer(new_deadline)
            self.deadline.update(new_deadline)
            return ()

        def on_timer(self, timestamp_ms, ctx):
            vals = self.buf.get()
            self.buf.clear()
            self.deadline.clear()
            yield {
                "user_id": ctx.key,
                "n": len(vals),
                "total": float(sum(vals)),
            }

    src = str(tmp_path / "src")
    _write_batch(src, [("2024-01-01T10:00:00", 1, "a", 1.0),
                       ("2024-01-01T10:02:00", 1, "a", 2.0),
                       ("2024-01-01T10:00:30", 2, "b", 7.0)], 0)
    stream = file_source(spark, src, SCHEMA).withWatermark("ts", "0 seconds")
    out = keyed_process_v2(
        stream,
        ["user_id"],
        IdleFlush,
        "user_id bigint, n bigint, total double",
        output_mode="Update",
        time_mode="EventTime",
        event_time_col="ts",
    )
    q = run_to_memory(out, "pv2_timers", output_mode="update")
    try:
        q.processAllAvailable()
        # nothing fires until the watermark passes last_ts + 5 min
        assert spark.table("pv2_timers").count() == 0
        _write_batch(src, [("2024-01-01T12:00:00", 9, "flush", 0.0)], 1)
        q.processAllAvailable()
        _write_batch(src, [("2024-01-01T12:00:01", 9, "flush2", 0.0)], 2)
        q.processAllAvailable()
        rows = spark.table("pv2_timers").filter(F.col("user_id") != 9).collect()
        got = {r.user_id: (r.n, r.total) for r in rows}
        assert got[1] == (2, 3.0)  # one flush, both buffered rows
        assert got[2] == (1, 7.0)
    finally:
        q.stop()
