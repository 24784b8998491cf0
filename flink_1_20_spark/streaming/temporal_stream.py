"""Streaming temporal (as-of) join: enrich an event stream against a
versioned dimension stream.

Reference parity: TemporalRowTimeJoinOperator.java:78 — a keyed
two-input operator holding the dim table's versions in state
(rightState, indexed by version time) and buffering left rows until the
right watermark guarantees the correct version is known.

Spark mapping: `applyInPandasWithState` is single-input, so the two
streams are unioned with a side tag (Flink's connect() lowers to the
same thing: CoProcess = union of tagged inputs keyed together). Per key:
- dim rows append (version_ts, payload) to the version list in state
- event rows look up the latest version with version_ts <= event_ts
Versions are kept sorted; old versions are pruned to `max_versions`
(Flink's state-retention cleanup).

Watermark correctness (`watermark_delay` set): the union carries a
`withWatermark` and the state function reads the global watermark via
`GroupState.getCurrentWatermarkMs()` — events BUFFER in keyed state
until watermark >= event_ts, i.e. until no dim version that could be
the event's match can still arrive (exactly the left-row buffering of
TemporalRowTimeJoinOperator.java:78; the delay is the allowed
out-of-orderness). Dim updates arriving a batch after the events they
enrich therefore still join correctly. Latency follows the watermark:
an event emits in the first micro-batch whose watermark passed it —
including via an EVENT-TIME TIMER at the earliest held event
(registerSmallestTimer in the reference), so a key whose events are
buffered drains on watermark advance even if no further row ever
arrives for that key (r11 differential find: without the timer the
final round's events for a quiet key never emitted).

`watermark_delay=None` keeps the lighter contract: events emit in
their arrival batch, assuming dim updates for a version arrive no
later than the events that need them (in-order across batches per
key). Within a batch, dim rows apply before event lookups, so
dim-before-event in the same batch always works in both modes.
"""

from __future__ import annotations

import json
from bisect import bisect_right
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _tag(df: DataFrame, key: str, ts_col, side: int, payload: list[str]) -> DataFrame:
    return df.select(
        F.col(key).alias("__k"),
        (F.col(ts_col) if isinstance(ts_col, str) else ts_col).alias("__t"),
        F.lit(side).alias("__side"),
        F.to_json(F.struct(*payload)).alias("__payload"),
    )


def _intake(batches: Iterator[pd.DataFrame]) -> tuple[list, list]:
    """Split tagged batches into (events, dims) as (iso_ts, payload)
    tuples — column-wise, no iterrows."""
    events: list[tuple[str, str]] = []
    dims: list[tuple[str, str]] = []
    for pdf in batches:
        if not len(pdf):
            continue
        t_iso = pdf["__t"].map(lambda t: t.isoformat() if t is not None else "")
        is_dim = (pdf["__side"] == 1).to_numpy()
        pay = pdf["__payload"]
        dims.extend(zip(t_iso[is_dim], pay[is_dim]))
        events.extend(zip(t_iso[~is_dim], pay[~is_dim]))
    return events, dims


def temporal_join_stream(
    events: DataFrame,
    dim_updates: DataFrame,
    key: str,
    event_ts: str,
    dim_ts: str,
    event_payload: list[str],
    dim_payload: list[str],
    output_schema: str,
    max_versions: int = 100,
    watermark_delay: str | None = None,
    dim_watermark_delay: str | None = None,
) -> DataFrame:
    """FOR SYSTEM_TIME AS OF over streams.

    Output columns: key, event_ts (as `ts`), event_payload...,
    dim_payload... (null when no version existed at the event's time) —
    declare them in `output_schema` in that order. See module docstring
    for the `watermark_delay` contract; `dim_watermark_delay` lets the
    versioned side declare its OWN disorder bound (defaults to the
    event side's)."""
    ev_tagged = _tag(events, key, event_ts, 0, event_payload)
    dim_tagged = _tag(dim_updates, key, dim_ts, 1, dim_payload)
    if watermark_delay is not None:
        # PER-INPUT watermarks, combined by Spark's default
        # multipleWatermarkPolicy = min — exactly the reference's
        # two-input operator watermark (min of left/right): the drain
        # bound only advances once BOTH sides' watermarks pass, so a
        # dim version is never "late" while its own watermark still
        # allows it.  (A single post-union watermark was max-based:
        # the event side alone pushed it forward, and the stateful
        # operator's late-input filter then dropped in-flight dim
        # versions — found when the event-time drain timer exposed it.)
        ev_tagged = ev_tagged.withWatermark("__t", watermark_delay)
        dim_tagged = dim_tagged.withWatermark(
            "__t", dim_watermark_delay or watermark_delay
        )
    unioned = ev_tagged.unionByName(dim_tagged)

    def fn(k: tuple, batches: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"versions": [], "pending": []}
        versions = [tuple(v) for v in st["versions"]]
        pending = [tuple(p) for p in st["pending"]]

        new_events, new_dims = _intake(batches)
        versions.extend(new_dims)
        versions.sort(key=lambda v: v[0])
        versions = versions[-max_versions:]

        if watermark_delay is None:
            ready = sorted(new_events)
            pending_next: list[tuple[str, str]] = []
        else:
            wm_ms = state.getCurrentWatermarkMs()
            wm_iso = pd.Timestamp(wm_ms, unit="ms").isoformat() if wm_ms > 0 else ""
            allp = pending + new_events
            ready = sorted(e for e in allp if e[0] <= wm_iso)
            pending_next = [e for e in allp if e[0] > wm_iso]

        vts = [v[0] for v in versions]
        out: list[dict] = []
        for t_iso, payload in ready:
            i = bisect_right(vts, t_iso) - 1  # latest version_ts <= event_ts
            rec = {"__k": k[0], "ts": t_iso, **json.loads(payload)}
            dimvals = json.loads(versions[i][1]) if i >= 0 else {}
            for c in dim_payload:
                rec[c] = dimvals.get(c)
            out.append(rec)

        state.update((json.dumps({"versions": versions, "pending": pending_next}),))
        if pending_next and watermark_delay is not None:
            # event-time timer at the earliest held event: the key is
            # re-invoked when the GLOBAL watermark passes it, so held
            # events drain even if no further row ever arrives for this
            # key (TemporalRowTimeJoinOperator registers exactly this
            # timer, registerSmallestTimer(leftRow ts) — FOUND by the
            # r11 temporal_join differential shape: the final round's
            # events never emitted without it).  +1ms: fire only once
            # the watermark has STRICTLY passed the event — a timer at
            # exactly event_ts fires in the no-data batch BEFORE a
            # same-trigger-window late dim version can land, losing the
            # one-batch late-dim grace Flink gets from its per-input
            # min watermark (the dim side's watermark holds the drain
            # back while a version is still in flight); data-driven
            # invocations keep the inclusive ts <= wm drain above.
            first_ms = int(
                pd.Timestamp(min(e[0] for e in pending_next)).value // 10**6
            )
            state.setTimeoutTimestamp(first_ms + 1)
        if out:
            pdf_out = pd.DataFrame(out).rename(columns={"__k": key})
            pdf_out["ts"] = pd.to_datetime(pdf_out["ts"])
            yield pdf_out

    return unioned.groupBy("__k").applyInPandasWithState(
        fn,
        output_schema,
        "state string",
        "update",
        GroupStateTimeout.NoTimeout
        if watermark_delay is None
        else GroupStateTimeout.EventTimeTimeout,
    )


def proctime_temporal_join(
    events: DataFrame,
    dim_updates: DataFrame,
    key: str,
    event_ts: str,
    event_payload: list[str],
    dim_payload: list[str],
    output_schema: str,
) -> DataFrame:
    """Processing-time temporal join
    (TemporalProcessTimeJoinOperator.java:48): each event joins the
    dim's LATEST version as of processing time — no version history, no
    event-time alignment. State = one row per key (vs the version list
    of the row-time variant); arrival order decides, which is exactly
    Flink's proc-time semantics. Same tagged-union wiring as
    `temporal_join_stream`."""
    tagged_events = _tag(events, key, event_ts, 0, event_payload)
    tagged_dim = dim_updates.select(
        F.col(key).alias("__k"),
        F.lit(None).cast("timestamp").alias("__t"),
        F.lit(1).alias("__side"),
        F.to_json(F.struct(*dim_payload)).alias("__payload"),
    )
    unioned = tagged_events.unionByName(tagged_dim)

    def fn(k: tuple, batches: Iterator[pd.DataFrame], state: GroupState):
        latest: str | None = state.get[0] if state.exists else None
        evs, dims = _intake(batches)
        # dim updates apply before events (micro-batch granularity of
        # "processing time"; ties build-side-first)
        if dims:
            latest = dims[-1][1]
        out: list[dict] = []
        for t_iso, payload in evs:
            rec = {"__k": k[0], "ts": t_iso, **json.loads(payload)}
            dimvals = json.loads(latest) if latest else {}
            for c in dim_payload:
                rec[c] = dimvals.get(c)
            out.append(rec)
        state.update((latest,))
        if out:
            pdf_out = pd.DataFrame(out).rename(columns={"__k": key})
            pdf_out["ts"] = pd.to_datetime(pdf_out["ts"])
            yield pdf_out

    return unioned.groupBy("__k").applyInPandasWithState(
        fn,
        output_schema,
        "latest string",
        "update",
        GroupStateTimeout.NoTimeout,
    )
