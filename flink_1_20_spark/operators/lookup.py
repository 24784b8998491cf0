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

Caching modes, mirroring the reference's lookup cache family:
- `RefreshingDim` — FULL cache with periodic reload (LookupFullCache):
  the dim reloads at most once per TTL and broadcast-joins each batch.
- `async_lookup_join` + `PartialCache` — PARTIAL cache with TTL + async
  fetch (AsyncLookupJoinRunner + LookupCacheManager): per-worker key
  cache, bounded-concurrency fetches for the distinct missing keys.
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


class RefreshingDim:
    """FULL-caching lookup with periodic reload
    (LookupFullCache + ReloadTriggers in flink-table-runtime
    .../lookup/fullcache/; CommonExecLookupJoin.java:141 selects it for
    'FULL' cache mode): the whole dim is (re)loaded at most once per
    `ttl_seconds` and broadcast-joined against every micro-batch.

    Use from foreachBatch: `sink(refreshing.join(batch, on), bid)`.
    The loaded snapshot is localCheckpoint-ed so every batch inside one
    TTL window joins against the same materialized version (Flink's
    cache consistency guarantee), not a re-planned live read."""

    def __init__(self, loader, ttl_seconds: float, clock=None):
        import time

        self._loader = loader
        self._ttl = ttl_seconds
        self._clock = clock or time.monotonic
        self._df: DataFrame | None = None
        self._loaded_at: float | None = None
        self.n_loads = 0  # observable for tests/metrics

    def current(self) -> DataFrame:
        now = self._clock()
        if self._df is None or now - self._loaded_at >= self._ttl:
            self._df = self._loader().localCheckpoint(eager=True)
            self._loaded_at = now
            self.n_loads += 1
        return self._df

    def join(
        self,
        fact: DataFrame,
        on: Column | list[str],
        how: str = "left",
        broadcast_hint: bool = True,
    ) -> DataFrame:
        return lookup_join(fact, self.current(), on, how, broadcast_hint)


class PartialCache:
    """Per-key TTL cache (LookupCacheManager / DefaultLookupCache in
    flink-table-runtime .../lookup/cache/): entries expire after
    `ttl_seconds`; empty lookup results are cached too (Flink's
    cacheMissingKey=true default).

    API is contains/get rather than a miss-sentinel: an `is`-compared
    sentinel would break across cloudpickle boundaries (the worker
    deserializes its own copy of a by-value-captured object, so identity
    comparisons against the module's original silently fail)."""

    def __init__(self, ttl_seconds: float, clock=None):
        import time

        self._ttl = ttl_seconds
        self._clock = clock or time.monotonic
        self._data: dict = {}

    def contains(self, key) -> bool:
        hit = self._data.get(key)
        if hit is None:
            return False
        if self._clock() >= hit[1]:
            del self._data[key]
            return False
        return True

    def get(self, key):
        """Cached value, or None if absent/expired (a cached empty
        result returns {} — distinguishable from a miss)."""
        return self._data[key][0] if self.contains(key) else None

    def put(self, key, value) -> None:
        self._data[key] = (value, self._clock() + self._ttl)


# Per-python-worker partial caches (one per async_lookup_join call site).
# Worker processes are reused across batches (spark.python.worker.reuse),
# so the cache persists across micro-batches within a worker — the same
# per-task locality Flink's cache has; it is NOT shared across executors.
_WORKER_CACHES: dict[str, PartialCache] = {}


def async_lookup_join(
    fact: DataFrame,
    key_cols: list[str],
    fetch,
    output_schema: str,
    ttl_seconds: float = 300.0,
    max_in_flight: int = 64,
    cache_id: str | None = None,
) -> DataFrame:
    """PARTIAL-caching async lookup join (AsyncLookupJoinRunner.java +
    LookupCacheManager): for dims that can't be broadcast and must be
    fetched per key from an external service.

    `fetch: async (key_tuple) -> dict | None` is awaited only for keys
    missing from the per-worker TTL cache; per Arrow batch, the distinct
    missing keys are gathered with bounded concurrency (orderedWait
    output semantics — row order is preserved). Returned dict fields
    must match the dim columns appended in `output_schema`; None caches
    an empty result (missing-key caching).

    Scale: per-row RPC remains the slow path — prefer `lookup_join`
    (broadcast) or `RefreshingDim` whenever the dim CAN ship to the
    cluster. This operator exists for the genuinely-external case; its
    cost is one await per (worker, key, TTL window) instead of per row.
    """
    import uuid

    from pyspark.sql.types import _parse_datatype_string

    cid = cache_id or uuid.uuid4().hex
    kcols = list(key_cols)
    out_cols = [f.name for f in _parse_datatype_string(output_schema).fields]

    def run(batches):
        import asyncio

        import pandas as pd

        cache = _WORKER_CACHES.setdefault(cid, PartialCache(ttl_seconds))
        for pdf in batches:
            if not len(pdf):
                continue
            keys = [tuple(k) for k in pdf[kcols].drop_duplicates().to_numpy()]
            misses = [k for k in keys if not cache.contains(k)]

            async def gather(ks):
                sem = asyncio.Semaphore(max_in_flight)

                async def one(k):
                    async with sem:
                        return k, await fetch(k)

                return await asyncio.gather(*[one(k) for k in ks])

            if misses:
                for k, v in asyncio.run(gather(misses)):
                    cache.put(k, v if v is not None else {})

            def val(k):
                return cache.get(tuple(k)) or {}

            dim_df = pd.DataFrame([val(k) for k in pdf[kcols].to_numpy()])
            merged = pd.concat(
                [pdf.reset_index(drop=True), dim_df.reset_index(drop=True)], axis=1
            )
            # null-fill dim columns absent from every fetched result so
            # the frame always carries the declared schema (left-join)
            for c in out_cols:
                if c not in merged.columns:
                    merged[c] = None
            yield merged[out_cols]

    return fact.mapInPandas(run, output_schema)
