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

Ties rank arrival-stable (earlier-arrived first), matching ROW_NUMBER's
determinism requirement; timestamps round-trip state as isoformat
strings (lexicographic == chronological, so a rowtime ORDER BY sorts
correctly while serialized).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType, TimestampType


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
    keys + payload columns + `rank_col` (1..n); update-mode changelog
    keyed on (keys, rank_col)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    payload = [c for c in df.columns if c not in keys]
    if order_col not in payload:
        raise ValueError(f"order column {order_col!r} must be a non-key column")
    schema = df.schema
    out_schema = StructType(
        [
            *[schema[k] for k in keys],
            *[schema[c] for c in payload],
            StructField(rank_col, LongType()),
        ]
    )
    ts_cols = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, TimestampType) and f.name in payload
    ]

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        buf = json.loads(state.get[0]) if state.exists else []
        changed = False
        for pdf in pdfs:
            if len(pdf):
                p = pdf[payload].copy()
                for c in ts_cols:
                    p[c] = p[c].map(lambda t: t.isoformat())
                buf.extend(p.to_dict("records"))
                changed = True
        if not changed:
            return
        # stable sort: among equal order values, earlier-arrived ranks
        # first (list order IS arrival order — state then batch)
        buf.sort(key=lambda r: r[order_col], reverse=not ascending)
        buf = buf[:n]
        state.update((json.dumps(buf),))
        out = pd.DataFrame(buf)
        for c in ts_cols:
            out[c] = pd.to_datetime(out[c])
        for kc, kv in zip(keys, key):
            out[kc] = kv
        out[rank_col] = range(1, len(out) + 1)
        yield out[[*keys, *payload, rank_col]]

    return df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, "rows string", "update", GroupStateTimeout.NoTimeout
    )
