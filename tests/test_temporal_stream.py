"""Streaming temporal join: dim versions persist in state across
micro-batches; each event matches the version valid at its time."""

from __future__ import annotations

import json
import os

from flink_1_20_spark.streaming import file_source, run_to_memory
from flink_1_20_spark.streaming.temporal_stream import temporal_join_stream


def _drop(src, n, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, f"b{n}.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_temporal_join_stream_versions(spark, tmp_path):
    ev_dir, dim_dir = str(tmp_path / "ev"), str(tmp_path / "dim")
    # batch 0: two dim versions for key 1 (price 10 then 20 at 10:30)
    _drop(dim_dir, 0, [
        {"k": 1, "vts": "2024-01-01T10:00:00", "price": 10.0},
        {"k": 1, "vts": "2024-01-01T10:30:00", "price": 20.0},
    ])
    _drop(ev_dir, 0, [
        {"k": 1, "ets": "2024-01-01T10:15:00", "qty": 3},   # → price 10
    ])
    events = file_source(spark, ev_dir, "k bigint, ets timestamp, qty bigint", fmt="json")
    dim = file_source(spark, dim_dir, "k bigint, vts timestamp, price double", fmt="json")
    out = temporal_join_stream(
        events, dim,
        key="k", event_ts="ets", dim_ts="vts",
        event_payload=["qty"], dim_payload=["price"],
        output_schema="k bigint, ts timestamp, qty bigint, price double",
    )
    q = run_to_memory(out, "tjs_out", output_mode="update")
    try:
        q.processAllAvailable()
        # batch 1: later event joins the *newer* version from state;
        # pre-history event (9:00) finds no version → null
        _drop(ev_dir, 1, [
            {"k": 1, "ets": "2024-01-01T11:00:00", "qty": 5},   # → price 20
            {"k": 1, "ets": "2024-01-01T09:00:00", "qty": 1},   # → null
        ])
        q.processAllAvailable()
        rows = spark.table("tjs_out").collect()
    finally:
        q.stop()
    got = {r["ts"].isoformat(): (r["qty"], r["price"]) for r in rows}
    assert got == {
        "2024-01-01T10:15:00": (3, 10.0),
        "2024-01-01T11:00:00": (5, 20.0),
        "2024-01-01T09:00:00": (1, None),
    }


def test_proctime_temporal_join_latest_wins(spark, tmp_path):
    from flink_1_20_spark.streaming.temporal_stream import proctime_temporal_join

    ev_dir, dim_dir = str(tmp_path / "ev2"), str(tmp_path / "dim2")
    # batch 0: dim arrives (price 10), one event → joins 10 regardless
    # of event time (proc-time = whatever is latest NOW)
    _drop(dim_dir, 0, [{"k": 1, "price": 10.0}])
    _drop(ev_dir, 0, [{"k": 1, "ets": "2024-01-01T09:00:00", "qty": 3}])
    events = file_source(spark, ev_dir, "k bigint, ets timestamp, qty bigint", fmt="json")
    dim = file_source(spark, dim_dir, "k bigint, price double", fmt="json")
    out = proctime_temporal_join(
        events, dim,
        key="k", event_ts="ets",
        event_payload=["qty"], dim_payload=["price"],
        output_schema="k bigint, ts timestamp, qty bigint, price double",
    )
    q = run_to_memory(out, "ptj_out", output_mode="update")
    try:
        q.processAllAvailable()
        # batch 1: dim updated to 20 → later events join 20 even with
        # EARLIER event times (no version history — proc-time semantics)
        _drop(dim_dir, 1, [{"k": 1, "price": 20.0}])
        q.processAllAvailable()
        _drop(ev_dir, 1, [{"k": 1, "ets": "2024-01-01T08:00:00", "qty": 5}])
        q.processAllAvailable()
        rows = spark.table("ptj_out").collect()
    finally:
        q.stop()
    got = {r["qty"]: r["price"] for r in rows}
    assert got == {3: 10.0, 5: 20.0}


def test_temporal_join_watermark_late_dim(spark, tmp_path):
    """Watermark mode (TemporalRowTimeJoinOperator.java:78 buffering):
    an event whose matching dim version arrives one micro-batch LATER
    must still enrich with that version.  The drain bound is the
    COMBINED min watermark of both inputs (Flink's two-input operator
    watermark; Spark's multipleWatermarkPolicy=min over per-side
    withWatermark) — so the event waits while the DIM side's watermark
    still allows an applicable version to arrive, and only drains once
    both sides have passed it."""
    ev_dir, dim_dir = str(tmp_path / "ev3"), str(tmp_path / "dim3")
    # batch 0: the event arrives BEFORE any dim version exists
    _drop(ev_dir, 0, [{"k": 1, "ets": "2024-01-01T10:00:00", "qty": 3}])
    os.makedirs(dim_dir, exist_ok=True)
    _drop(dim_dir, 0, [])
    events = file_source(spark, ev_dir, "k bigint, ets timestamp, qty bigint", fmt="json")
    dim = file_source(spark, dim_dir, "k bigint, vts timestamp, price double", fmt="json")
    out = temporal_join_stream(
        events, dim,
        key="k", event_ts="ets", dim_ts="vts",
        event_payload=["qty"], dim_payload=["price"],
        output_schema="k bigint, ts timestamp, qty bigint, price double",
        watermark_delay="0 seconds",
    )
    q = run_to_memory(out, "tjw_out", output_mode="update")
    try:
        q.processAllAvailable()
        # the dim watermark hasn't moved → nothing emitted (the old
        # in-order code would have emitted (3, null) here)
        assert spark.table("tjw_out").count() == 0
        # batch 1: the dim version the event needs arrives a batch
        # LATE (vts 09:55 < the already-seen event ts — legal, the
        # event side can't push the combined watermark past it), plus
        # a later event
        _drop(dim_dir, 1, [{"k": 1, "vts": "2024-01-01T09:55:00", "price": 10.0}])
        _drop(ev_dir, 1, [{"k": 1, "ets": "2024-01-01T10:30:00", "qty": 5}])
        q.processAllAvailable()
        # still held: the DIM watermark (09:55) hasn't passed the
        # events — Flink's min-of-inputs does exactly this
        assert spark.table("tjw_out").count() == 0
        # batch 2: a later dim version advances the dim watermark to
        # 11:30, the event side reaches 11:00
        _drop(dim_dir, 2, [{"k": 1, "vts": "2024-01-01T11:30:00", "price": 99.0}])
        _drop(ev_dir, 2, [{"k": 1, "ets": "2024-01-01T11:00:00", "qty": 7}])
        q.processAllAvailable()
        # batch 3 pushes the combined watermark STRICTLY past 11:00
        # (to min(12:00, 11:30) = 11:30) — strictly, because whether
        # the two batch-2 files land in one or two micro-batches
        # decides if the drain timer (earliest pending + 1ms) has
        # already fired at exactly 11:00
        _drop(ev_dir, 3, [{"k": 1, "ets": "2024-01-01T12:00:00", "qty": 9}])
        q.processAllAvailable()
        rows = spark.table("tjw_out").collect()
    finally:
        q.stop()
    got = {r["qty"]: r["price"] for r in rows}
    # 3/5/7 enriched by the 09:55 version (11:30 is after every
    # event's time); qty=9 still pending (combined watermark 11:30
    # hasn't passed 12:00)
    assert got == {3: 10.0, 5: 10.0, 7: 10.0}
