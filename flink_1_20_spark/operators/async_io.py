"""Async I/O: per-row calls to an external service, batched.

Reference parity: AsyncDataStream.unorderedWait/orderedWait
(flink-streaming-java/.../AsyncDataStream.java:115,165) — bounded
in-flight async requests per operator, results re-emitted (un)ordered;
also AsyncCalc / AsyncLookupJoinRunner on the SQL side.

Spark mapping: there is no per-row async operator; the idiomatic
equivalent batches the requests inside `mapInPandas` — each Arrow batch
becomes one asyncio gather of up to `max_in_flight` concurrent calls.
Ordering within a partition is preserved (orderedWait semantics);
`unorderedWait` would drop the reordering step (nothing to do — we keep
batch order anyway).

At scale: concurrency = partitions × max_in_flight; size partitions so
the external service's rate limit is respected cluster-wide.
"""

from __future__ import annotations

import asyncio
from collections.abc import Awaitable, Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame


def async_enrich(
    df: DataFrame,
    fn: Callable[[dict[str, Any]], Awaitable[dict[str, Any]]],
    output_schema: str,
    max_in_flight: int = 64,
) -> DataFrame:
    """Apply async `fn(row_dict) -> dict` to every row with bounded
    concurrency; output = input columns declared in `output_schema`
    merged with fn's returned dict."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        async def gather(rows: list[dict]) -> list[dict]:
            sem = asyncio.Semaphore(max_in_flight)

            async def one(r: dict) -> dict:
                async with sem:
                    extra = await fn(r)
                return {**r, **extra}

            return await asyncio.gather(*[one(r) for r in rows])

        for pdf in batches:
            rows = pdf.to_dict("records")
            out = asyncio.run(gather(rows))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=output_schema)
