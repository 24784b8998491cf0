"""Streaming Top-N — the ROW_NUMBER() <= N rank over an unbounded
stream.

Reference parity: StreamExecRank.java:70 (rank over PARTITION BY keys
ORDER BY any column, RankRange 1..N) and its AppendOnlyTopNFunction /
UpdatableTopNFunction state design: per key, keep ONLY the current
top-N rows — state is bounded by N regardless of stream length.

Spark mapping: applyInPandasWithState in update mode. Each batch with
new rows for a key merges them into the key's retained top-N, re-ranks,
stores the survivors back (≤ N rows of the payload projection), and
emits the key's FULL current top-N with a rank column — an UPDATING
result keyed on (keys, rank), exactly Flink's Top-N changelog contract
(consumers upsert on the unique rank key; Flink's
UpdatableTopNFunction emits the same shape).

Ordering rules: ties rank arrival-stable (earlier-arrived first,
matching ROW_NUMBER's determinism requirement); NULL order values rank
LAST in both directions; timestamps round-trip state as isoformat
strings (lexicographic == chronological, so a rowtime ORDER BY sorts
correctly while serialized). Payload columns must survive the JSON
state encoding — validated up front via streaming/_state.py, so a
DATE/DECIMAL/BINARY payload fails at construction with a clear message
instead of killing the query mid-stream.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from flink_1_20_spark.streaming._state import (
    json_default,
    marshal_records,
    validate_payload_schema,
)


def streaming_topn(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    n: int,
    ascending: bool = False,
    rank_col: str = "rn",
) -> DataFrame:
    """Current top-`n` rows per `keys`, ordered by `order_col`
    (descending by default — the leaderboard shape). Output columns:
    the SOURCE columns in their declared order + `rank_col` (1..n);
    update-mode changelog keyed on (keys, rank_col)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    payload = [c for c in df.columns if c not in keys]
    if order_col not in payload:
        raise ValueError(f"order column {order_col!r} must be a non-key column")
    schema = df.schema
    validate_payload_schema(schema, payload, "streaming_topn")
    # SELECT *-compatible output: source column order, rank appended
    out_cols = [*df.columns, rank_col]
    out_schema = StructType(
        [*[schema[c] for c in df.columns], StructField(rank_col, LongType())]
    )
    ts_cols = [
        f.name
        for f in schema.fields
        # NTZ is NOT a TimestampType subclass — missing it here would let
        # an NTZ payload pass validate_payload_schema yet reach json.dumps
        # as a raw pd.Timestamp (and break the isoformat ordering contract)
        if isinstance(f.dataType, (TimestampType, TimestampNTZType))
        and f.name in payload
    ]

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        buf = json.loads(state.get[0]) if state.exists else []
        changed = False
        for pdf in pdfs:
            if len(pdf):
                buf.extend(marshal_records(pdf, payload, ts_cols))
                changed = True
        if not changed:
            return
        # stable two-pass order: non-null order values sorted (ties keep
        # arrival order — state rows precede batch rows), nulls LAST
        present = [r for r in buf if r[order_col] is not None]
        absent = [r for r in buf if r[order_col] is None]
        present.sort(key=lambda r: r[order_col], reverse=not ascending)
        buf = (present + absent)[:n]
        state.update((json.dumps(buf, default=json_default),))
        out = pd.DataFrame(buf)
        for c in ts_cols:
            out[c] = pd.to_datetime(out[c])
        for kc, kv in zip(keys, key):
            out[kc] = kv
        out[rank_col] = range(1, len(out) + 1)
        yield out[out_cols]

    return df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, "rows string", "update", GroupStateTimeout.NoTimeout
    )
