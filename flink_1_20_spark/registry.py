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
    # ---- held back every round (8) ----
    # 5 bench headliners
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    # dtype-cast regression sentinel (red r6, green r7)
    "fn_math_basic",
    # the r7 hash-red, fixed in r8 (integer-units sum at the CTE sum
    # site — the lineage-resolved ROUND(SUM(double)) class): kept in
    # window to prove the fix
    "tpcds_q1_returns_above_avg",
    # decimal-output-ban regression sentinel (red r4-r5, green r6)
    "join_range_banded",
    # ---- r12 rotation (VERDICT r11 task 6): the 42 re-proof slots go
    # to the queries whose last driver confirmation is OLDEST — all 22
    # remaining r4-confirmed plus the 20 oldest r5-confirmed (the
    # wtvf_* / cep_* / udx_* / approx-agg era the verdict names).
    # Cumulative driver confirmation closed at 283/283 in r11; from
    # here the window purely ages the registry forward.  The r12 CEP
    # reluctant-backtracking fix (operators/cep.py) makes the two cep_*
    # rows and wtvf_window_rank this round's guard-path re-proofs.
    "dedup_keep_last",
    "over_range_time",
    "correlate_lateral_topn",
    "subquery_exists_correlated",
    "fn_string_advanced",
    "fn_time_type",
    "fn_json_path",
    "wtvf_tumble",
    "wtvf_session",
    "asof_join_backward",
    "lookup_join_dims",
    "cep_funnel_strict",
    "cep_followed_by_any",
    "dedup_exact",
    "dedup_embedding_cosine",
    "simsearch_lsh_topk",
    "text_quality",
    "changelog_join_semi",
    "tpcds_q36_rollup_rank",
    "tpcds_q78_no_return_by_year",
    "tpcds_q72_residual_inequality",
    "agg_approx_count_distinct",
    "fn_string_basic",
    "wtvf_hop",
    "wtvf_cumulate",
    "wtvf_window_rank",
    "dedup_simhash",
    "simsearch_topk_bruteforce",
    "embed_quantize_int8",
    "text_tokens",
    "multimodal_resize_nearest",
    "count_window_tumble",
    "changelog_join_anti",
    "udx_table_function",
    "temporal_sort",
    "script_transform_pipe",
    "tpch_q12_priority_by_status",
    "tpcds_q99_ship_bucket_grid",
    "tpcds_q97_matched_unmatched",
    "tpcds_q50_latency_buckets",
    "tpcds_q86_rollup_rank_within_parent",
    # r12 second half: the NEW collapse-first best-representative query
    # takes the last rotation slot — a first-time driver confirmation
    # outranks one more re-proof (tpcds_q30 rotates back next round;
    # its local-oracle coverage continues every sweep)
    "dedup_cluster_best_representative_collapsed",
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
