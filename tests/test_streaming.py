"""Streaming surface tests — file sources driven through memory sinks.

Strategy mirrors the reference's harness tests (SURVEY.md §5:
TestValuesTableFactory + collect): feed JSON files into a monitored
directory, run each operator, `processAllAvailable()`, assert against
the batch-computed expectation. A second late file advances the
watermark so append-mode windows finalize (Flink's
EventTimeTrigger.onEventTime, EventTimeTriggers.java:344).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from flink_1_20_spark.streaming import (
    deduplicate,
    file_source,
    interval_join,
    rate_source,
    run_to_memory,
    tumble_window_agg,
    upsert_foreach_batch,
)

SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

ROWS = [
    # window [10:00, 10:05)
    ("2024-01-01T10:00:10", 1, "click", 1.0),
    ("2024-01-01T10:01:00", 1, "click", 2.0),
    ("2024-01-01T10:03:30", 2, "view", 3.0),
    # window [10:05, 10:10)
    ("2024-01-01T10:05:05", 1, "click", 4.0),
    ("2024-01-01T10:07:00", 2, "view", 5.0),
]
LATE_SENTINEL = [("2024-01-01T12:00:00", 9, "flush", 0.0)]  # pushes watermark past all windows


def _write_batch(path: str, rows: list[tuple], batch_no: int) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, f"batch{batch_no}.json"), "w") as f:
        for ts, uid, et, val in rows:
            f.write(
                json.dumps({"ts": ts, "user_id": uid, "event_type": et, "value": val}) + "\n"
            )


def test_tumble_window_agg_append_finalizes(spark, tmp_path):
    src = str(tmp_path / "in")
    _write_batch(src, ROWS, 0)
    stream = file_source(spark, src, SCHEMA, fmt="json")
    assert stream.isStreaming
    out = tumble_window_agg(
        stream,
        ts="ts",
        size="5 minutes",
        keys=["event_type"],
        aggs={"n": F.count("*"), "total": F.sum("value")},
        watermark="1 minute",
    )
    q = run_to_memory(out, "tumble_out", output_mode="append")
    try:
        q.processAllAvailable()
        _write_batch(src, LATE_SENTINEL, 1)  # advance watermark → finalize windows
        q.processAllAvailable()
        got = {
            (r["window_start"].isoformat(), r["event_type"]): (r["n"], r["total"])
            for r in spark.table("tumble_out").collect()
        }
    finally:
        q.stop()
    assert got[("2024-01-01T10:00:00", "click")] == (2, 3.0)
    assert got[("2024-01-01T10:00:00", "view")] == (1, 3.0)
    assert got[("2024-01-01T10:05:00", "click")] == (1, 4.0)
    assert got[("2024-01-01T10:05:00", "view")] == (1, 5.0)


def test_streaming_dedup_keep_first(spark, tmp_path):
    src = str(tmp_path / "in")
    dupes = ROWS + [
        ("2024-01-01T10:02:00", 1, "click", 99.0),  # dup key (1, click) — dropped
        ("2024-01-01T10:08:00", 2, "view", 98.0),  # dup key (2, view) — dropped
    ]
    _write_batch(src, dupes, 0)
    stream = file_source(spark, src, SCHEMA, fmt="json")
    out = deduplicate(
        stream, keys=["user_id", "event_type"], ts="ts", keep="first", watermark="10 minutes"
    )
    q = run_to_memory(out, "dedup_out", output_mode="append")
    try:
        q.processAllAvailable()
        rows = spark.table("dedup_out").collect()
    finally:
        q.stop()
    got = {(r["user_id"], r["event_type"]): r["ts"].isoformat() for r in rows}
    # first row per key survives, all later duplicates dropped
    assert got == {
        (1, "click"): "2024-01-01T10:00:10",
        (2, "view"): "2024-01-01T10:03:30",
    }


def test_streaming_interval_join(spark, tmp_path):
    left_dir, right_dir = str(tmp_path / "l"), str(tmp_path / "r")
    _write_batch(left_dir, [("2024-01-01T10:00:00", 1, "order", 10.0)], 0)
    _write_batch(
        right_dir,
        [
            ("2024-01-01T10:02:00", 1, "ship", 0.0),  # within [t, t+5m] → joins
            ("2024-01-01T10:20:00", 1, "ship", 0.0),  # outside → dropped
        ],
        0,
    )
    left = file_source(spark, left_dir, SCHEMA, fmt="json").withColumnRenamed("ts", "lts")
    right = (
        file_source(spark, right_dir, SCHEMA, fmt="json")
        .withColumnRenamed("ts", "rts")
        .withColumnRenamed("user_id", "r_user")
        .withColumnRenamed("event_type", "r_type")
        .withColumnRenamed("value", "r_value")
    )
    joined = interval_join(
        left,
        right,
        on=F.col("user_id") == F.col("r_user"),
        left_ts="lts",
        right_ts="rts",
        lower="0 seconds",
        upper="5 minutes",
        watermark="1 minute",
    )
    q = run_to_memory(joined, "ij_out", output_mode="append")
    try:
        q.processAllAvailable()
        rows = spark.table("ij_out").collect()
    finally:
        q.stop()
    assert len(rows) == 1
    assert rows[0]["rts"].isoformat() == "2024-01-01T10:02:00"


def test_upsert_foreach_batch(spark, tmp_path):
    src = str(tmp_path / "in")
    table = str(tmp_path / "tbl")
    _write_batch(src, ROWS, 0)
    stream = file_source(spark, src, SCHEMA, fmt="json")
    q = upsert_foreach_batch(stream, keys=["user_id"], path=table, order_col="ts")
    try:
        q.processAllAvailable()
        # second batch updates user 1, inserts user 3
        _write_batch(
            src,
            [
                ("2024-01-01T11:00:00", 1, "click", 42.0),
                ("2024-01-01T11:00:00", 3, "signup", 7.0),
            ],
            1,
        )
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["user_id"]: r["value"] for r in spark.read.parquet(table).collect()}
    assert got == {1: 42.0, 2: 5.0, 3: 7.0}


def test_rate_source_shape(spark):
    df = rate_source(spark, rows_per_second=5)
    assert df.isStreaming
    assert set(df.columns) == {"timestamp", "value"}


def test_session_window_streaming(spark, tmp_path):
    from flink_1_20_spark.streaming import session_window_agg

    src = str(tmp_path / "in")
    # user 1: two sessions separated by > 5 min gap
    rows = [
        ("2024-01-01T10:00:00", 1, "click", 1.0),
        ("2024-01-01T10:02:00", 1, "click", 1.0),
        ("2024-01-01T10:30:00", 1, "click", 1.0),
    ]
    _write_batch(src, rows, 0)
    stream = file_source(spark, src, SCHEMA, fmt="json")
    out = session_window_agg(
        stream, ts="ts", gap="5 minutes", keys=["user_id"],
        aggs={"n": F.count("*")}, watermark="1 minute",
    )
    q = run_to_memory(out, "sess_out", output_mode="append")
    try:
        q.processAllAvailable()
        _write_batch(src, LATE_SENTINEL, 1)
        q.processAllAvailable()
        got = sorted(
            (r["window_start"].isoformat(), r["window_end"].isoformat(), r["n"])
            for r in spark.table("sess_out").filter(F.col("user_id") == 1).collect()
        )
    finally:
        q.stop()
    assert got == [
        ("2024-01-01T10:00:00", "2024-01-01T10:07:00", 2),
        ("2024-01-01T10:30:00", "2024-01-01T10:35:00", 1),
    ]


def test_cumulate_batch_matches_manual(spark, sf_dir):
    from flink_1_20_spark.streaming import cumulate_window_agg
    from flink_1_20_spark.catalog import read_table

    e = read_table(spark, sf_dir, "events")
    out = cumulate_window_agg(
        e, ts="ts", step="30 minutes", max_size="1 hour", aggs={"n": F.count("*")}
    )
    rows = out.collect()
    # every full-hour bucket appears with 2 ends; the 1h-end count must
    # equal the tumbling 1h count
    full = {r["window_start"]: r["n"] for r in rows if (r["window_end"] - r["window_start"]).total_seconds() == 3600}
    tumble = {
        r["w"]["start"]: r["n"]
        for r in e.groupBy(F.window("ts", "1 hour").alias("w")).agg(F.count("*").alias("n")).collect()
    }
    assert full == tumble


def test_connected_streams_control_gate(spark, tmp_path):
    from flink_1_20_spark.streaming import gated_stream

    data_dir, ctrl_dir = str(tmp_path / "data"), str(tmp_path / "ctrl")
    ctrl_schema = StructType(
        [
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("enabled", StringType()),  # json bools as strings for simplicity
        ]
    )
    # batch 0: gate opens for user 1 at 10:00; data at 09:59 (gate still
    # closed) and 10:01 (open); user 2 has data but never a control row
    _write_batch(data_dir, [("2024-01-01T09:59:00", 1, "d", 1.0),
                            ("2024-01-01T10:01:00", 1, "d", 2.0),
                            ("2024-01-01T10:01:00", 2, "d", 9.0)], 0)
    os.makedirs(ctrl_dir, exist_ok=True)
    with open(os.path.join(ctrl_dir, "c0.json"), "w") as f:
        f.write(json.dumps({"ts": "2024-01-01T10:00:00", "user_id": 1, "enabled": "true"}) + "\n")

    data = file_source(spark, data_dir, SCHEMA, fmt="json")
    ctrl = file_source(spark, ctrl_dir, ctrl_schema, fmt="json").withColumn(
        "enabled", F.col("enabled") == "true"
    )
    out = gated_stream(data, ctrl, keys=["user_id"], ts="ts", value_col="value")
    q = run_to_memory(out, "gate_out", output_mode="update")
    try:
        q.processAllAvailable()
        # batch 1: no new control rows — the open gate must persist in
        # state for user 1
        _write_batch(data_dir, [("2024-01-01T10:05:00", 1, "d", 3.0),
                                ("2024-01-01T10:05:00", 2, "d", 8.0)], 1)
        q.processAllAvailable()
        got = sorted((r["user_id"], r["value"]) for r in spark.table("gate_out").collect())
    finally:
        q.stop()
    # user 1: 2.0 (after gate opened) and 3.0 (next batch, state carried);
    # 1.0 was pre-gate; user 2 never enabled
    assert got == [(1, 2.0), (1, 3.0)]


def test_streaming_window_join(spark, tmp_path):
    from flink_1_20_spark.streaming import window_join

    left_dir, right_dir = str(tmp_path / "wl"), str(tmp_path / "wr")
    # same 5-min window [10:00,10:05) & user 1 → join; user 2's rows are
    # in different windows → no join
    _write_batch(left_dir, [("2024-01-01T10:01:00", 1, "order", 10.0),
                            ("2024-01-01T10:02:00", 2, "order", 20.0)], 0)
    _write_batch(right_dir, [("2024-01-01T10:03:00", 1, "ship", 1.0),
                             ("2024-01-01T10:07:00", 2, "ship", 2.0)], 0)
    l = file_source(spark, left_dir, SCHEMA, fmt="json").withColumnRenamed("ts", "lts")
    r = (
        file_source(spark, right_dir, SCHEMA, fmt="json")
        .withColumnRenamed("ts", "rts")
        .select("rts", "user_id", F.col("value").alias("rvalue"))
    )
    out = window_join(
        l, r, keys=["user_id"], left_ts="lts", right_ts="rts",
        size="5 minutes", watermark="1 minute",
    ).select("user_id", "value", "rvalue", "window_start")
    q = run_to_memory(out, "wj_out", output_mode="append")
    try:
        q.processAllAvailable()
        got = [(r["user_id"], r["value"], r["rvalue"]) for r in spark.table("wj_out").collect()]
    finally:
        q.stop()
    assert got == [(1, 10.0, 1.0)]


def test_side_output_sink_routes_both_ways(spark, tmp_path):
    from flink_1_20_spark.streaming.sinks import side_output_sink

    src = str(tmp_path / "in")
    _write_batch(src, ROWS, 0)
    stream = file_source(spark, src, SCHEMA, fmt="json")
    main_rows, side_rows = [], []
    q = side_output_sink(
        stream,
        F.col("event_type") == "view",  # views go to the side output
        lambda b, _id: main_rows.extend(b.collect()),
        lambda b, _id: side_rows.extend(b.collect()),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert {r["event_type"] for r in main_rows} == {"click"}
    assert {r["event_type"] for r in side_rows} == {"view"}
    assert len(main_rows) + len(side_rows) == len(ROWS)


def test_broadcast_control_gate_all_keys(spark, tmp_path):
    from flink_1_20_spark.streaming import connect_streams
    from flink_1_20_spark.streaming.connect import BroadcastControlGate

    data_dir, ctrl_dir = str(tmp_path / "bd"), str(tmp_path / "bc")
    ctrl_schema = StructType(
        [
            StructField("enabled", StringType()),
            StructField("min_value", DoubleType()),
        ]
    )
    # batch 0: gate closed (no control yet) — rows from BOTH users dropped
    _write_batch(data_dir, [("2024-01-01T10:00:00", 1, "d", 1.0),
                            ("2024-01-01T10:00:00", 2, "d", 9.0)], 0)
    os.makedirs(ctrl_dir, exist_ok=True)
    data = file_source(spark, data_dir, SCHEMA, fmt="json")
    ctrl = file_source(spark, ctrl_dir, ctrl_schema, fmt="json").withColumn(
        "enabled", F.col("enabled") == "true"
    )
    gate = BroadcastControlGate(control_cols=["enabled", "min_value"])
    got = []
    q = connect_streams(data, ctrl).writeStream.foreachBatch(
        gate.step(lambda b, _id: got.extend(b.collect()))
    ).start()
    try:
        q.processAllAvailable()
        assert got == []  # gate starts closed for every key
        # open the gate with a value floor — applies to ALL keys at once
        os.makedirs(ctrl_dir, exist_ok=True)
        with open(os.path.join(ctrl_dir, "c0.json"), "w") as f:
            f.write(json.dumps({"enabled": "true", "min_value": 5.0}) + "\n")
        q.processAllAvailable()
        _write_batch(data_dir, [("2024-01-01T10:05:00", 1, "d", 3.0),
                                ("2024-01-01T10:05:00", 2, "d", 8.0)], 1)
        q.processAllAvailable()
    finally:
        q.stop()
    # user 1's 3.0 < floor dropped; user 2's 8.0 passes — one control row
    # gated BOTH keys
    assert [(r["user_id"], r["value"]) for r in got] == [(2, 8.0)]


def test_streaming_interval_join_left_outer_null_after_watermark(spark, tmp_path):
    """Outer interval join: the unmatched left row must emit with nulls
    only once the watermark proves no matching right row can still
    arrive (Flink emits the padded row when state for the bound is
    cleaned; Spark at watermark + interval passage)."""
    left_dir, right_dir = str(tmp_path / "lo"), str(tmp_path / "ro")
    _write_batch(left_dir, [("2024-01-01T10:00:00", 1, "order", 10.0)], 0)
    _write_batch(right_dir, [("2024-01-01T10:02:00", 2, "ship", 0.0)], 0)  # wrong key
    left = file_source(spark, left_dir, SCHEMA, fmt="json").withColumnRenamed("ts", "lts")
    right = (
        file_source(spark, right_dir, SCHEMA, fmt="json")
        .withColumnRenamed("ts", "rts")
        .withColumnRenamed("user_id", "r_user")
        .select("rts", "r_user")
    )
    joined = interval_join(
        left, right,
        on=F.col("user_id") == F.col("r_user"),
        left_ts="lts", right_ts="rts",
        lower="0 seconds", upper="5 minutes",
        watermark="1 minute", how="leftOuter",
    ).select("user_id", "lts", "r_user", "rts")
    q = run_to_memory(joined, "loj_out", output_mode="append")
    try:
        q.processAllAvailable()
        before = spark.table("loj_out").collect()
        # advance both watermarks far past the join bound → padded row
        _write_batch(left_dir, [("2024-01-01T12:00:00", 9, "flush", 0.0)], 1)
        _write_batch(right_dir, [("2024-01-01T12:00:00", 9, "flush", 0.0)], 1)
        q.processAllAvailable()
        q.processAllAvailable()
        after = spark.table("loj_out").collect()
    finally:
        q.stop()
    # no premature null emission...
    assert all(r["rts"] is not None for r in before)
    # ...but the unmatched order eventually appears null-padded
    padded = [r for r in after if r["user_id"] == 1]
    assert len(padded) == 1 and padded[0]["r_user"] is None


def test_late_data_side_output(spark, tmp_path):
    from flink_1_20_spark.streaming.sinks import LateDataSplitter

    src = str(tmp_path / "late")
    _write_batch(src, [("2024-01-01T10:00:00", 1, "a", 1.0),
                       ("2024-01-01T10:10:00", 1, "a", 2.0)], 0)
    stream = file_source(spark, src, SCHEMA, fmt="json")
    splitter = LateDataSplitter(ts_col="ts", allowed_delay_seconds=300)
    main_rows, late_rows = [], []
    q = stream.writeStream.foreachBatch(
        splitter.step(lambda b, _i: main_rows.extend(b.collect()),
                      lambda b, _i: late_rows.extend(b.collect()))
    ).start()
    try:
        q.processAllAvailable()
        # watermark now 10:05; a 10:01 row is LATE, a 10:06 row is fine
        _write_batch(src, [("2024-01-01T10:01:00", 1, "a", 3.0),
                           ("2024-01-01T10:06:00", 1, "a", 4.0)], 1)
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(r["value"] for r in main_rows) == [1.0, 2.0, 4.0]
    assert [r["value"] for r in late_rows] == [3.0]


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Checkpointing/exactly-once (SURVEY.md §2.9: CheckpointCoordinator
    → Structured Streaming checkpoints, engine-level): a file-sink query
    stopped and restarted from the same checkpointLocation must neither
    duplicate already-committed rows nor lose new ones."""
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write_batch(src, ROWS[:3], 0)

    def start():
        return (
            file_source(spark, src, SCHEMA, fmt="json")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.read.parquet(out).count() == 3

    # new data lands while the query is DOWN; restart resumes from the
    # checkpoint — the first 3 rows are not re-emitted
    _write_batch(src, ROWS[3:], 1)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r["value"] for r in spark.read.parquet(out).collect())
    assert got == sorted(v for *_, v in ROWS)  # each row exactly once


def test_hop_window_streaming(spark, tmp_path):
    from flink_1_20_spark.streaming import hop_window_agg

    src = str(tmp_path / "hop")
    # one event at 10:02 → member of hops [9:55,10:05) and [10:00,10:10)
    _write_batch(src, [("2024-01-01T10:02:00", 1, "click", 1.0)], 0)
    stream = file_source(spark, src, SCHEMA, fmt="json")
    out = hop_window_agg(
        stream, ts="ts", size="10 minutes", slide="5 minutes",
        keys=["user_id"], aggs={"n": F.count("*")}, watermark="1 minute",
    )
    q = run_to_memory(out, "hop_out", output_mode="append")
    try:
        q.processAllAvailable()
        _write_batch(src, LATE_SENTINEL, 1)
        q.processAllAvailable()
        got = sorted(
            r["window_start"].isoformat()
            for r in spark.table("hop_out").filter(F.col("user_id") == 1).collect()
        )
    finally:
        q.stop()
    assert got == ["2024-01-01T09:55:00", "2024-01-01T10:00:00"]


def test_available_now_trigger_drains_and_stops(spark, tmp_path):
    """Trigger.AvailableNow: drain everything currently available, then
    stop on its own — the batch-over-bounded-stream execution mode
    (Flink's bounded-source batch mode, SURVEY.md §1.3)."""
    src = str(tmp_path / "an")
    _write_batch(src, ROWS, 0)
    stream = file_source(spark, src, SCHEMA, fmt="json")
    q = run_to_memory(
        stream.groupBy("event_type").count(),
        "an_out", output_mode="complete", trigger={"availableNow": True},
    )
    q.awaitTermination(60)  # self-terminates after the drain
    assert not q.isActive
    got = {r["event_type"]: r["count"] for r in spark.table("an_out").collect()}
    assert got == {"click": 3, "view": 2}


def test_early_firing_update_mode(spark, tmp_path):
    """Flink's early-fire triggers (ContinuousEventTimeTrigger /
    table.exec.emit.early-fire) map to Spark's UPDATE output mode: each
    micro-batch emits the window's current partial aggregate before the
    watermark closes it — proven by watching the same window's count
    grow across batches."""
    src = str(tmp_path / "src")
    _write_batch(src, [("2024-01-01T10:00:10", 1, "click", 1.0),
                       ("2024-01-01T10:01:00", 1, "click", 2.0)], 0)
    stream = file_source(spark, src, SCHEMA)
    out = tumble_window_agg(
        stream, "ts", "5 minutes", keys=["user_id"], watermark="1 minute"
    )
    q = run_to_memory(out, "early_fire_out", output_mode="update")
    try:
        q.processAllAvailable()
        first = {
            (r.user_id, r.window_start): r.n
            for r in spark.table("early_fire_out").collect()
        }
        assert list(first.values()) == [2]  # partial fire: 2 rows so far
        _write_batch(src, [("2024-01-01T10:03:00", 1, "click", 3.0)], 1)
        q.processAllAvailable()
        rows = spark.table("early_fire_out").collect()
        ns = sorted(r.n for r in rows)
        assert ns[-1] == 3  # the SAME window re-fired with the updated count
    finally:
        q.stop()


def test_streaming_topn_operator(spark, tmp_path):
    """streaming_topn (StreamExecRank parity): per-key top-N by value
    maintained across micro-batches with state bounded by N; emits the
    full current top-N per change, ranks arrival-stable on ties."""
    import json as _json

    from flink_1_20_spark.streaming import file_source, run_to_memory, streaming_topn

    src = tmp_path / "topn_src"
    src.mkdir()
    rows0 = [
        {"k": 1, "ts": "2024-01-01T10:00:00", "score": 10.0, "who": "a"},
        {"k": 1, "ts": "2024-01-01T10:00:01", "score": 30.0, "who": "b"},
        {"k": 1, "ts": "2024-01-01T10:00:02", "score": 20.0, "who": "c"},
        {"k": 2, "ts": "2024-01-01T10:00:03", "score": 5.0, "who": "d"},
    ]
    (src / "b0.jsonl").write_text("\n".join(_json.dumps(r) for r in rows0) + "\n")
    stream = file_source(
        spark, str(src), "k bigint, ts timestamp, score double, who string",
        fmt="json",
    )
    out = streaming_topn(stream, ["k"], "score", n=2, ascending=False)
    q = run_to_memory(out, "topn_out", output_mode="update")
    try:
        q.processAllAvailable()
        first = {
            (r["k"], r["rn"], r["who"]) for r in spark.table("topn_out").collect()
        }
        assert {(1, 1, "b"), (1, 2, "c"), (2, 1, "d")} <= first
        assert (1, 3, "a") not in first  # only top-2 retained/emitted
        # a new high score re-ranks the key's leaderboard
        (src / "b1.jsonl").write_text(
            _json.dumps(
                {"k": 1, "ts": "2024-01-01T10:00:10", "score": 99.0, "who": "e"}
            )
            + "\n"
        )
        q.processAllAvailable()
        latest: dict[tuple, str] = {}
        for r in spark.table("topn_out").collect():  # last emission wins
            latest[(r["k"], r["rn"])] = r["who"]
        assert latest[(1, 1)] == "e" and latest[(1, 2)] == "b"
        assert latest[(2, 1)] == "d"
    finally:
        q.stop()


def test_streaming_window_topn_composition(spark, tmp_path):
    """Flink's WINDOW Top-N (rank within a tumbling window,
    StreamExecWindowRank) composes directly from streaming_topn keyed by
    the window bucket: state per (window, key) is bounded by N and a
    closed window's leaderboard simply stops changing."""
    import json as _json

    from pyspark.sql import functions as F

    from flink_1_20_spark.streaming import file_source, run_to_memory, streaming_topn

    src = tmp_path / "wtn_src"
    src.mkdir()
    rows0 = [
        {"k": 1, "ts": "2024-01-01T10:00:10", "score": 10.0},
        {"k": 1, "ts": "2024-01-01T10:00:20", "score": 30.0},
        {"k": 1, "ts": "2024-01-01T10:00:30", "score": 20.0},
        {"k": 1, "ts": "2024-01-01T10:01:10", "score": 5.0},  # next window
    ]
    (src / "b0.jsonl").write_text("\n".join(_json.dumps(r) for r in rows0) + "\n")
    stream = file_source(
        spark, str(src), "k bigint, ts timestamp, score double", fmt="json"
    ).withColumn("w", F.date_trunc("minute", F.col("ts")))
    out = streaming_topn(stream, ["w", "k"], "score", n=2, ascending=False)
    q = run_to_memory(out, "wtn_out", output_mode="update")
    try:
        q.processAllAvailable()
        latest: dict[tuple, float] = {}
        for r in spark.table("wtn_out").collect():
            latest[(str(r["w"]), r["k"], r["rn"])] = r["score"]
        # window 10:00: top-2 of {10,30,20}; window 10:01: the single row
        assert latest[("2024-01-01 10:00:00", 1, 1)] == 30.0
        assert latest[("2024-01-01 10:00:00", 1, 2)] == 20.0
        assert latest[("2024-01-01 10:01:00", 1, 1)] == 5.0
        # a late row for the FIRST window still re-ranks it (state keyed
        # by window bucket — Flink's allowed-lateness analogue)
        (src / "b1.jsonl").write_text(
            _json.dumps({"k": 1, "ts": "2024-01-01T10:00:50", "score": 99.0})
            + "\n"
        )
        q.processAllAvailable()
        for r in spark.table("wtn_out").collect():
            latest[(str(r["w"]), r["k"], r["rn"])] = r["score"]
        assert latest[("2024-01-01 10:00:00", 1, 1)] == 99.0
        assert latest[("2024-01-01 10:00:00", 1, 2)] == 30.0
    finally:
        q.stop()
