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
    # ---- r10 rotation: coverage is cumulatively complete after r9
    # (280/281 driver-confirmed; the 281st below). 4 new/edited slots,
    # then 38 re-proof slots — breadth sampling, at least one per
    # operator family, favoring queries whose only driver confirmation
    # is rounds old.
    # LEDGER: decontaminate_exact_substring_tokens landed after this
    # window was verified+frozen (r10 late addition; green in the bare
    # AND perturbed sweeps) — rotate it into the r11 window.
    # (1) the one registered query without a driver row — landed after
    # the r9 window froze; green in both local sweeps since. A green
    # row here closes cumulative driver confirmation of the r9 surface.
    "decontaminate_exact_substring",
    # (2) r10-new: token-space exact-substring dedup (Lee et al.'s
    # span unit), first driver look
    "dedup_exact_substring_tokens",
    # (3)+(4) internals edited this round (chunk rows now carry the
    # unit weight `w`; scan-parallelism guard threshold cores/2 →
    # cores) — driver re-confirms the edited plans
    "dedup_exact_substring",
    "dedup_exact_substring_keep_first",
    # ---- 38 re-proof slots: one+ per family ----
    "agg_grouping_sets",
    "agg_percentiles",
    "agg_approx_percentile",
    "cdc_retract_agg",
    "changelog_join_incremental",
    "subquery_not_in",
    "dedup_connected_clusters",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_cross_corpus",
    "fn_string_regex",
    "fn_temporal_arith",
    "fn_array_higher_order",
    "text_pii_scrub",
    "text_contamination_ngram",
    "sample_stratified_exact",
    "dedup_boilerplate_chunks",
    "join_interval",
    "cogroup_custkey",
    "agg_json_arrayagg",
    "window_dedup",
    "multimodal_features",
    "sessionization_gap",
    "window_topn",
    "pipeline_corpus_curation",
    "pipeline_token_budget_sample",
    "join_interval_overlap",
    "setop_except_all",
    "simsearch_ivf_topk",
    "asof_join_tolerance",
    "cep_vshape_iterative",
    "text_lm_score",
    "text_langid",
    "tpch_q9_product_profit",
    "tpcds_q64_spine_reused_cte",
    "simsearch_recall_ivfpq",
    "udx_grouped_agg",
    "wtvf_session_dynamic_gap",
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
