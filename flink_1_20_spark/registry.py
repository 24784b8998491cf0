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


# The driver's correctness gate checks the FIRST 50 registered queries,
# so iteration order is coverage policy: this curated prefix is a
# representative cross-section — the 5 bench headliners plus at least one
# oracle-backed query per operator family (joins incl. asof/lookup/banded
# range, set ops, aggs incl. approx, over/rank/dedup/sessionization,
# correlate/subquery, scalar fns, window TVFs, CEP, changelog/CDC,
# text+embedding dedup, similarity search, curation pipeline, UDx,
# TPC-DS shapes). Remaining queries follow in registration order and
# keep full local-oracle coverage via scripts/verify_local.py.
DRIVER_PRIORITY: tuple[str, ...] = (
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "join_full_outer",
    "join_left_anti",
    "join_nonequi_range",
    "join_window",
    "join_interval",
    "asof_join_backward",
    "lookup_join_dims",
    "join_range_banded",
    "cogroup_custkey",
    "setop_intersect_all",
    "sort_multicol_nulls",
    "agg_count_distinct",
    "agg_grouping_sets",
    "agg_cube",
    "agg_pivot",
    "table_agg_top2_per_group",
    "agg_approx_count_distinct",
    "agg_approx_percentile",
    "over_range_time",
    "over_rank_functions",
    "rank_topn_per_group",
    "window_topn",
    "dedup_keep_last",
    "sessionization_gap",
    "correlate_lateral_topn",
    "subquery_exists_correlated",
    "fn_string_advanced",
    "fn_json_path",
    "fn_time_type",
    "wtvf_tumble",
    "wtvf_session",
    "cep_funnel_strict",
    "cep_followed_by_any",
    "changelog_join_semi",
    "cdc_retract_agg",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "simsearch_lsh_topk",
    "text_quality",
    "pipeline_corpus_curation",
    "udx_grouped_agg",
    "tpcds_q36_rollup_rank",
    "tpcds_q78_no_return_by_year",
    "tpcds_q72_residual_inequality",
)


def _ordered(mapping: dict[str, Any]) -> dict[str, Any]:
    """Curated prefix first, then the rest in registration order."""
    head = {n: mapping[n] for n in DRIVER_PRIORITY if n in mapping}
    tail = {n: v for n, v in mapping.items() if n not in head}
    return {**head, **tail}


def load_all() -> None:
    """Import every query module so registration side effects run."""
    import flink_1_20_spark.queries  # noqa: F401

    flink_1_20_spark.queries.load()


def get_queries() -> dict[str, QueryFn]:
    load_all()
    return _ordered(QUERIES)


def get_oracles() -> dict[str, str]:
    load_all()
    return _ordered(ORACLES)


def describe() -> dict[str, Any]:
    load_all()
    return {
        "n_queries": len(QUERIES),
        "n_oracles": len(ORACLES),
        "rows_only": sorted(set(QUERIES) - set(ORACLES)),
    }
