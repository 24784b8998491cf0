"""Query registry: the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers here as a named
query (a callable ``(spark, sf_dir) -> DataFrame``) plus — whenever the
semantics are ANSI-SQL-expressible — a DuckDB oracle SQL string. The
driver (and ``scripts/verify_local.py``) run both sides and hash-compare.

Column-name discipline: every computed column is aliased identically in
the Spark query and the oracle SQL (the driver sorts columns by name
before hashing). Floating-point aggregates are rounded identically on
both sides so cross-engine summation-order differences don't flip the
hash (mirrors the reference's tolerant numeric diff,
flink-end-to-end-tests/.../TpcdsResultComparator.java:35).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query (and optional DuckDB oracle) by name."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    import flink_1_20_spark.queries  # noqa: F401

    flink_1_20_spark.queries.load()


def get_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def get_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)


def describe() -> dict[str, Any]:
    load_all()
    return {
        "n_queries": len(QUERIES),
        "n_oracles": len(ORACLES),
        "rows_only": sorted(set(QUERIES) - set(ORACLES)),
    }
