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

Simplification vs Flink: events are matched at micro-batch granularity
assuming dim updates for a version arrive no later than the events that
need them (in-order across batches per key) — no watermark-held event
buffering. Within a batch, rows are time-sorted, so dim-before-event in
the same batch works.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


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
) -> DataFrame:
    """FOR SYSTEM_TIME AS OF over streams.

    Output columns: key, event_ts (as `ts`), event_payload...,
    dim_payload... (null when no version existed at the event's time) —
    declare them in `output_schema` in that order."""
    tagged_events = events.select(
        F.col(key).alias("__k"),
        F.col(event_ts).alias("__t"),
        F.lit(0).alias("__side"),  # 0 = event (probe)
        F.to_json(F.struct(*event_payload)).alias("__payload"),
    )
    tagged_dim = dim_updates.select(
        F.col(key).alias("__k"),
        F.col(dim_ts).alias("__t"),
        F.lit(1).alias("__side"),  # 1 = dim version (build)
        F.to_json(F.struct(*dim_payload)).alias("__payload"),
    )
    unioned = tagged_events.unionByName(tagged_dim)

    def fn(k: tuple, batches: Iterator[pd.DataFrame], state: GroupState):
        versions: list[tuple[str, str]] = json.loads(state.get[0]) if state.exists else []
        rows = []
        for pdf in batches:
            for _, r in pdf.iterrows():
                rows.append((r["__t"], int(r["__side"]), r["__payload"]))
        # dim rows first at equal timestamps (version valid AT its time)
        rows.sort(key=lambda x: (x[0], -x[1]))
        out = []
        for t, side, payload in rows:
            tiso = t.isoformat()
            if side == 1:
                versions.append((tiso, payload))
                versions.sort(key=lambda v: v[0])
                versions = versions[-max_versions:]
            else:
                match = None
                for vts, vpayload in reversed(versions):
                    if vts <= tiso:
                        match = (vts, vpayload)
                        break
                rec = {"__k": k[0], "ts": tiso, **json.loads(payload)}
                dimvals = json.loads(match[1]) if match else {}
                for c in dim_payload:
                    rec[c] = dimvals.get(c)
                out.append(rec)
        state.update((json.dumps(versions),))
        if out:
            pdf_out = pd.DataFrame(out)
            pdf_out = pdf_out.rename(columns={"__k": key})
            pdf_out["ts"] = pd.to_datetime(pdf_out["ts"])
            yield pdf_out

    return unioned.groupBy("__k").applyInPandasWithState(
        fn,
        output_schema,
        "versions string",
        "update",
        GroupStateTimeout.NoTimeout,
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
    tagged_events = events.select(
        F.col(key).alias("__k"),
        F.col(event_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.to_json(F.struct(*event_payload)).alias("__payload"),
    )
    tagged_dim = dim_updates.select(
        F.col(key).alias("__k"),
        F.lit(None).cast("timestamp").alias("__t"),
        F.lit(1).alias("__side"),
        F.to_json(F.struct(*dim_payload)).alias("__payload"),
    )
    unioned = tagged_events.unionByName(tagged_dim)

    def fn(k: tuple, batches: Iterator[pd.DataFrame], state: GroupState):
        latest: str | None = state.get[0] if state.exists else None
        rows = []
        for pdf in batches:
            for _, r in pdf.iterrows():
                rows.append((int(r["__side"]), r["__t"], r["__payload"]))
        out: list[dict] = []
        # dim updates apply before events within a batch (micro-batch
        # granularity of "processing time"; ties build-side-first)
        for side, t, payload in sorted(rows, key=lambda x: -x[0]):
            if side == 1:
                latest = payload
            else:
                rec = {"__k": k[0], "ts": t.isoformat(), **json.loads(payload)}
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
