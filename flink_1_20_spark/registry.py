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
    # 5 bench headliners (every round)
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    # the 10 dtype-drift fixes (3 driver-red in r4 + 7 latent) — kept in
    # window to prove the oracle-dtype sweep closed the class
    "join_range_banded",
    "sessionization_gap",
    "cdc_retract_agg",
    "tpch_q12_priority_by_status",
    "tpch_q2_min_cost_supplier",
    "embed_quantize_int8",
    "tpcds_q99_ship_bucket_grid",
    "tpcds_q97_matched_unmatched",
    "tpcds_q50_latency_buckets",
    "tpcds_q64_spine_reused_cte",
    # never-driver-confirmed families (r5 rotation)
    "changelog_join_incremental",
    "changelog_join_anti",
    "dedup_simhash",
    "join_interval_overlap",
    "simsearch_ivf_topk",
    "wtvf_cumulate",
    "wtvf_hop",
    "cep_vshape_iterative",
    "pipeline_token_budget_sample",
    "script_transform_pipe",
    "temporal_sort",
    # new residual TPC-DS ports (103/103 coverage proof)
    "tpcds_q57_lag_lead_self_join",
    "tpcds_q30_returns_above_nation_avg",
    "tpcds_q86_rollup_rank_within_parent",
    # training-prep family (new in r5: packing/chunking/SemDeDup/recall)
    "pipeline_sequence_pack",
    "text_chunk_sliding",
    "dedup_semantic_cells",
    "simsearch_recall_lsh",
    # breadth fill, never-confirmed (fn_* family keeps one seat — its
    # siblings fn_string_advanced/fn_json_path/fn_time_type are
    # driver-confirmed green in CORRECTNESS_r04)
    "fn_string_basic",
    "multimodal_features",
    "text_pii_scrub",
    "sample_stratified_exact",
    "wtvf_session_dynamic_gap",
    "wtvf_window_rank",
    "asof_join_tolerance",
    "dedup_ngram_jaccard",
    "dedup_connected_clusters",
    "text_lm_score",
    "text_tokens",
    "multimodal_resize_nearest",
    "simsearch_topk_bruteforce",
    "count_window_tumble",
    "udx_table_function",
    "text_contamination_ngram",
    "dedup_boilerplate_chunks",
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
