"""Streaming CEP: pattern matches spanning micro-batches via keyed state."""

from __future__ import annotations

import json
import os

from flink_1_20_spark.operators.cep import Pattern
from flink_1_20_spark.streaming import file_source, match_recognize_stream, run_to_memory

SCHEMA = "ts timestamp, user_id bigint, event_type string"


def _drop(src, n, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, f"b{n}.json"), "w") as f:
        for ts, uid, et in rows:
            f.write(json.dumps({"ts": ts, "user_id": uid, "event_type": et}) + "\n")


def test_streaming_cep_match_spans_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    # batch 0: click+view for user 1 (partial match must persist in state)
    _drop(src, 0, [
        ("2024-01-01T10:00:00", 1, "click"),
        ("2024-01-01T10:01:00", 1, "view"),
        ("2024-01-01T10:00:00", 2, "view"),   # wrong start — never matches
    ])
    pat = (
        Pattern.begin("a", lambda r: r["event_type"] == "click")
        .followed_by("b", lambda r: r["event_type"] == "view")
        .followed_by("c", lambda r: r["event_type"] == "purchase")
    )

    def measures(g):
        return {
            "start_ts": g["a"]["ts"].iloc[0].isoformat(),
            "end_ts": g["c"]["ts"].iloc[-1].isoformat(),
        }

    stream = file_source(spark, src, SCHEMA, fmt="json")
    out = match_recognize_stream(
        stream,
        keys=["user_id"],
        ts="ts",
        pattern=pat,
        measures=measures,
        output_schema="start_ts string, end_ts string, user_id bigint",
        payload_cols=["event_type"],
    )
    q = run_to_memory(out, "cep_stream_out", output_mode="update")
    try:
        q.processAllAvailable()
        assert spark.table("cep_stream_out").count() == 0  # no purchase yet
        # batch 1: the purchase arrives — completes the buffered partial
        _drop(src, 1, [("2024-01-01T10:05:00", 1, "purchase")])
        q.processAllAvailable()
        rows = spark.table("cep_stream_out").collect()
    finally:
        q.stop()
    assert len(rows) == 1
    assert rows[0]["user_id"] == 1
    assert rows[0]["start_ts"] == "2024-01-01T10:00:00"
    assert rows[0]["end_ts"] == "2024-01-01T10:05:00"


def test_streaming_cep_followed_by_any_no_skip(spark, tmp_path):
    """followedByAny + NO_SKIP in streaming: every branch is a match
    (one per qualifying occurrence), and a match is emitted exactly once
    across micro-batches — a later batch only adds the branches whose
    last event is new."""
    src = str(tmp_path / "in_fba")
    _drop(src, 0, [
        ("2024-01-01T10:00:00", 1, "click"),
        ("2024-01-01T10:01:00", 1, "view"),
        ("2024-01-01T10:02:00", 1, "view"),
    ])
    pat = (
        Pattern.begin("a", lambda r: r["event_type"] == "click")
        .followed_by_any("b", lambda r: r["event_type"] == "view")
        .after_match_skip("NO_SKIP")
    )

    def measures(g):
        return {
            "start_ts": g["a"]["ts"].iloc[0].isoformat(),
            "end_ts": g["b"]["ts"].iloc[-1].isoformat(),
        }

    stream = file_source(spark, src, SCHEMA, fmt="json")
    out = match_recognize_stream(
        stream,
        keys=["user_id"],
        ts="ts",
        pattern=pat,
        measures=measures,
        output_schema="start_ts string, end_ts string, user_id bigint",
        payload_cols=["event_type"],
    )
    q = run_to_memory(out, "cep_stream_fba", output_mode="update")
    try:
        q.processAllAvailable()
        ends = sorted(r["end_ts"] for r in spark.table("cep_stream_fba").collect())
        # one branch per view occurrence
        assert ends == ["2024-01-01T10:01:00", "2024-01-01T10:02:00"]
        # next batch: a third view — exactly ONE new branch, no re-emission
        _drop(src, 1, [("2024-01-01T10:03:00", 1, "view")])
        q.processAllAvailable()
        ends = sorted(r["end_ts"] for r in spark.table("cep_stream_fba").collect())
    finally:
        q.stop()
    assert ends == [
        "2024-01-01T10:01:00",
        "2024-01-01T10:02:00",
        "2024-01-01T10:03:00",
    ]


def test_streaming_cep_int_bool_payload_state(spark, tmp_path):
    """Regression: int/bool payload columns reach state as numpy scalars
    (np.int64/np.bool_) — json.dumps must serialize them, and a partial
    match buffered in state must survive into the next batch."""
    src = str(tmp_path / "in_ib")
    os.makedirs(src, exist_ok=True)
    schema = "ts timestamp, user_id bigint, amount bigint, flagged boolean"

    def drop(n, rows):
        with open(os.path.join(src, f"b{n}.json"), "w") as f:
            for ts, uid, amt, fl in rows:
                f.write(json.dumps(
                    {"ts": ts, "user_id": uid, "amount": amt, "flagged": fl}) + "\n")

    # batch 0: only the first half of the pattern — forces a state write
    # of int+bool payload (the old json.dumps raised TypeError here)
    drop(0, [("2024-01-01T10:00:00", 1, 5, True)])
    pat = (
        Pattern.begin("a", lambda r: bool(r["flagged"]))
        .followed_by("b", lambda r: r["amount"] > 100)
    )

    def measures(g):
        return {
            "small": int(g["a"]["amount"].iloc[0]),
            "big": int(g["b"]["amount"].iloc[-1]),
        }

    stream = file_source(spark, src, schema, fmt="json")
    out = match_recognize_stream(
        stream,
        keys=["user_id"],
        ts="ts",
        pattern=pat,
        measures=measures,
        output_schema="small bigint, big bigint, user_id bigint",
        payload_cols=["amount", "flagged"],
    )
    q = run_to_memory(out, "cep_stream_ib", output_mode="update")
    try:
        q.processAllAvailable()
        assert spark.table("cep_stream_ib").count() == 0  # partial buffered
        drop(1, [("2024-01-01T10:02:00", 1, 500, False)])
        q.processAllAvailable()
        rows = spark.table("cep_stream_ib").collect()
    finally:
        q.stop()
    assert len(rows) == 1
    assert rows[0]["small"] == 5 and rows[0]["big"] == 500


def test_streaming_cep_iterative_condition_spans_batches(spark, tmp_path):
    """Iterative (cross-variable) conditions in the streaming NFA: the
    dip/rebound comparison evaluates against rows buffered in state
    from an EARLIER micro-batch."""
    src = str(tmp_path / "in_iter")

    def drop(n, rows):
        os.makedirs(src, exist_ok=True)
        with open(os.path.join(src, f"b{n}.json"), "w") as f:
            for ts, uid, et, v in rows:
                f.write(json.dumps(
                    {"ts": ts, "user_id": uid, "event_type": et, "value": v}
                ) + "\n")

    drop(0, [
        ("2024-01-01T10:00:00", 1, "click", 10.0),
        ("2024-01-01T10:01:00", 1, "view", 7.0),    # dip below 10
        ("2024-01-01T10:00:00", 2, "click", 5.0),
        ("2024-01-01T10:01:00", 2, "view", 6.0),    # NOT a dip — dead
    ])
    pat = (
        Pattern.begin("a", lambda r: r["event_type"] == "click")
        .next("b", lambda r, g: r["value"] < g["a"]["value"].iloc[-1])
        .next("c", lambda r, g: r["value"] > g["b"]["value"].iloc[-1])
    )

    def measures(g):
        return {
            "anchor": float(g["a"]["value"].iloc[0]),
            "dip": float(g["b"]["value"].iloc[-1]),
            "rebound": float(g["c"]["value"].iloc[-1]),
        }

    stream = file_source(
        spark, src, SCHEMA + ", value double", fmt="json"
    )
    out = match_recognize_stream(
        stream,
        keys=["user_id"],
        ts="ts",
        pattern=pat,
        measures=measures,
        output_schema="anchor double, dip double, rebound double, user_id bigint",
        payload_cols=["event_type", "value"],
    )
    q = run_to_memory(out, "cep_iter_out", output_mode="update")
    try:
        q.processAllAvailable()
        assert spark.table("cep_iter_out").count() == 0  # rebound pending
        drop(1, [
            ("2024-01-01T10:02:00", 1, "purchase", 9.0),   # > dip 7 -> match
            ("2024-01-01T10:02:00", 2, "purchase", 100.0),  # chain already dead
        ])
        q.processAllAvailable()
        rows = spark.table("cep_iter_out").collect()
    finally:
        q.stop()
    assert [(r.user_id, r.anchor, r.dip, r.rebound) for r in rows] == [
        (1, 10.0, 7.0, 9.0)
    ]


def test_streaming_cep_overlap_tail_in_next_batch(spark, tmp_path):
    """SKIP TO NEXT ROW retention (FOUND by the r11 streaming-vs-batch
    cep differential, seed 900): rows inside an emitted match may START
    a later overlapping match whose tail arrives in a FUTURE batch, so
    the buffer must retain them — the old code consumed everything up
    to the match end and silently dropped the overlap.  Pattern
    a b c over alternating click/view rows: (r0 r1 r2) completes in
    batch 0, the overlapping (r1 r2 r3) completes when r3 lands in
    batch 1.  Dedup still holds: batch 1 must not re-emit (r0 r1 r2)."""
    src = str(tmp_path / "in")
    _drop(src, 0, [
        ("2024-01-01T10:00:00", 1, "click"),
        ("2024-01-01T10:01:00", 1, "view"),
        ("2024-01-01T10:02:00", 1, "click"),
    ])
    pat = (
        Pattern.begin("a", lambda r: True)
        .next("b", lambda r: True)
        .next("c", lambda r: True)
        .after_match_skip("TO_NEXT_ROW")
    )

    def measures(g):
        return {
            "s": g["a"]["ts"].iloc[0].isoformat(),
            "e": g["c"]["ts"].iloc[-1].isoformat(),
        }

    stream = file_source(spark, src, SCHEMA, fmt="json")
    out = match_recognize_stream(
        stream,
        keys=["user_id"],
        ts="ts",
        pattern=pat,
        measures=measures,
        output_schema="s string, e string, user_id bigint",
        payload_cols=["event_type"],
    )
    q = run_to_memory(out, "cep_overlap_out", output_mode="update")
    try:
        q.processAllAvailable()
        first = {(r["s"], r["e"]) for r in spark.table("cep_overlap_out").collect()}
        assert first == {("2024-01-01T10:00:00", "2024-01-01T10:02:00")}
        _drop(src, 1, [("2024-01-01T10:03:00", 1, "view")])
        q.processAllAvailable()
        rows = [(r["s"], r["e"]) for r in spark.table("cep_overlap_out").collect()]
    finally:
        q.stop()
    # exactly TWO matches total: the overlap completed, nothing re-emitted
    assert sorted(rows) == [
        ("2024-01-01T10:00:00", "2024-01-01T10:02:00"),
        ("2024-01-01T10:01:00", "2024-01-01T10:03:00"),
    ]


def test_streaming_cep_variable_length_hold(spark, tmp_path):
    """Greedy variable-length matches completed by BACKTRACKING at the
    buffer end are PROVISIONAL (r12, decided by the cep_skip_extend
    differential seed 102): later input reshapes them into the longer
    match the batch single-pass chain reports, so the stream must HOLD
    — no emission until a row after the match proves it final — and
    then emit exactly the batch NFA's output, once."""
    src = str(tmp_path / "in")

    def drop_v(n, rows):
        os.makedirs(src, exist_ok=True)
        with open(os.path.join(src, f"b{n}.json"), "w") as f:
            for ts, uid, v in rows:
                f.write(json.dumps({"ts": ts, "user_id": uid, "v": v}) + "\n")

    # batch 0: A=10 (10%5=0), B=4, B/C=6 — greedy B+ wants {4,6} but C
    # has no row left, so backtracking would complete (A, B={4}, C=6)
    # AT the buffer end: provisional, must not emit
    drop_v(0, [
        ("2024-01-01T10:00:00", 1, 10),
        ("2024-01-01T10:01:00", 1, 4),
        ("2024-01-01T10:02:00", 1, 6),
    ])
    pat = (
        Pattern.begin("a", lambda r: r["v"] % 5 == 0)
        .next("b", lambda r: r["v"] % 2 == 0)
        .one_or_more()
        .strict_repeat()
        .next("c", lambda r: r["v"] % 3 == 0)
        .after_match_skip("SKIP_TO_LAST", "b")
    )

    def measures(g):
        return {
            "a_v": int(g["a"]["v"].iloc[0]),
            "b_last": int(g["b"]["v"].iloc[-1]),
            "c_v": int(g["c"]["v"].iloc[-1]),
        }

    stream = file_source(
        spark, src, "ts timestamp, user_id bigint, v bigint", fmt="json"
    )
    out = match_recognize_stream(
        stream,
        keys=["user_id"],
        ts="ts",
        pattern=pat,
        measures=measures,
        output_schema="a_v bigint, b_last bigint, c_v bigint, user_id bigint",
        payload_cols=["v"],
    )
    q = run_to_memory(out, "cep_hold_out", output_mode="update")
    try:
        q.processAllAvailable()
        assert spark.table("cep_hold_out").count() == 0  # held
        # batch 1: C=12 (also B) reshapes the match to (A, B={4,6}, C=12)
        # — still ends at the buffer end, so still held
        drop_v(1, [("2024-01-01T10:03:00", 1, 12)])
        q.processAllAvailable()
        assert spark.table("cep_hold_out").count() == 0  # still held
        # batch 2: v=7 fails every step — proves non-extendability; the
        # FINAL reshaped match emits exactly once (the short provisional
        # (A, {4}, 6) must never have appeared)
        drop_v(2, [("2024-01-01T10:04:00", 1, 7)])
        q.processAllAvailable()
        rows = [
            (r.a_v, r.b_last, r.c_v)
            for r in spark.table("cep_hold_out").collect()
        ]
    finally:
        q.stop()
    assert rows == [(10, 6, 12)]


def test_streaming_cep_equal_boundary_ts_matches_both_emit(spark, tmp_path):
    """r12 verdict finding 3: two DISTINCT matches sharing boundary
    timestamps must both emit.  The emission-log identity was
    (first_ts, last_ts) — under tied event times the second match looked
    already-emitted and was silently dropped; the identity now carries
    the persisted per-key arrival sequence of the boundary rows.
    Covers both collision surfaces: two same-ts matches inside one
    batch, and a third same-ts match arriving in a LATER batch (its
    tie-mates already in the emission log)."""
    src = str(tmp_path / "in_ties")
    _drop(src, 0, [
        ("2024-01-01T10:00:00", 1, "click"),
        ("2024-01-01T10:00:00", 1, "click"),   # same ts, distinct match
    ])
    pat = (
        Pattern.begin("a", lambda r: r["event_type"] == "click")
        .after_match_skip("TO_NEXT_ROW")
    )

    def measures(g):
        return {"m_ts": g["a"]["ts"].iloc[0].isoformat()}

    stream = file_source(spark, src, SCHEMA, fmt="json")
    out = match_recognize_stream(
        stream,
        keys=["user_id"],
        ts="ts",
        pattern=pat,
        measures=measures,
        output_schema="m_ts string, user_id bigint",
        payload_cols=["event_type"],
    )
    q = run_to_memory(out, "cep_ties_out", output_mode="update")
    try:
        q.processAllAvailable()
        assert spark.table("cep_ties_out").count() == 2
        # a later batch adds a THIRD click at the same timestamp: the
        # retained rows' matches are in the log (no re-emission), the
        # new row's match must not collide with them
        _drop(src, 1, [("2024-01-01T10:00:00", 1, "click")])
        q.processAllAvailable()
        rows = spark.table("cep_ties_out").collect()
    finally:
        q.stop()
    assert len(rows) == 3
    assert all(r["m_ts"] == "2024-01-01T10:00:00" for r in rows)
