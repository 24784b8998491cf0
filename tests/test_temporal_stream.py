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
    must still enrich with that version — the event waits in state until
    the watermark passes its timestamp."""
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
        # watermark hasn't passed 10:00 yet → nothing emitted (the old
        # in-order code would have emitted (3, null) here)
        assert spark.table("tjw_out").count() == 0
        # batch 1: the dim version the event needs arrives LATE
        # (vts 09:55 < event ts), plus a later event to push time along
        _drop(dim_dir, 1, [{"k": 1, "vts": "2024-01-01T09:55:00", "price": 10.0}])
        _drop(ev_dir, 1, [{"k": 1, "ets": "2024-01-01T10:30:00", "qty": 5}])
        q.processAllAvailable()
        # batch 2: watermark (>= 10:30) passes both buffered events
        _drop(ev_dir, 2, [{"k": 1, "ets": "2024-01-01T11:00:00", "qty": 7}])
        q.processAllAvailable()
        rows = spark.table("tjw_out").collect()
    finally:
        q.stop()
    got = {r["qty"]: r["price"] for r in rows}
    # qty=3 enriched by the LATE dim version; qty=5 by the same version;
    # qty=7 still pending (watermark hasn't passed 11:00)
    assert got == {3: 10.0, 5: 10.0}
