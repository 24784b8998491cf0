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
    # ---- r9 rotation: coverage-completion round. The 9th held slot is
    # pipeline_dsir_select — its top-K plan changed this round (rank
    # window → TakeOrderedAndProject, VERDICT r8 task 2), so the driver
    # re-confirms the edited plan. Then ALL 36 never-driver-confirmed
    # queries: the final 34 TPC-DS shapes — every one green in this
    # session's bare AND perturbed sweeps — plus the two r9-new
    # exact-substring ops (dedup_exact_substring in the block below,
    # the keep-first variant in the remaining-slots block). A fully
    # green window closes cumulative driver coverage at 280/281 — the
    # one remaining query, decontaminate_exact_substring, landed after
    # this window was verified+frozen and rotates in r10. The 5
    # re-confirm slots: the three r8 oracle conversions that never
    # re-rotated after the integer-units rewrite (tpch_q17, tpcds_q44,
    # tpcds_q57 — proven locally both sweeps, never driver-proven
    # post-conversion), dedup_cluster_best_representative (the r8 perf
    # watch item — its 10x drift was profiled this round as upstream
    # pair-generation JIT/load variance, code unchanged), and
    # simsearch_ivfpq_adc_topk (newest ANN path, single
    # confirmation) ----
    # plan edited this round — driver re-confirms the new top-K shape
    "pipeline_dsir_select",
    # ---- the 35 never-driver-confirmed queries (34 final TPC-DS
    # shapes in registration order + the r9-new op) ----
    "tpcds_q3_brand_year_topn",
    "tpcds_q8_suffix_band_semi",
    "tpcds_q14b_intersect_items_avg_gate",
    "tpcds_q15_disjunctive_restriction",
    "tpcds_q24b_netpaid_above_cte_avg",
    "tpcds_q27_rollup_three_dims",
    "tpcds_q33_union_in_dim",
    "tpcds_q37_banded_dim_scan",
    "tpcds_q40_before_after_pivot",
    "tpcds_q42_dim_group_agg",
    "tpcds_q43_bucket_pivot",
    "tpcds_q45_disjunctive_in",
    "tpcds_q46_lag_change_points",
    "tpcds_q52_brand_ext_price",
    "tpcds_q55_brand_simple",
    "tpcds_q56_channel_union_color_gate",
    "tpcds_q60_channel_union_type_gate",
    "tpcds_q65_low_revenue_items",
    "tpcds_q68_bought_vs_current_nation",
    "tpcds_q69_semi_anti_profile",
    "tpcds_q70_rank_gated_rollup",
    "tpcds_q71_period_breakdown_union",
    "tpcds_q74_yoy_max_ratio",
    "tpcds_q76_null_channel_union",
    "tpcds_q77_channel_profit_full_outer",
    "tpcds_q79_coupon_profit_by_order",
    "tpcds_q81_returns_incl_tax_above_avg",
    "tpcds_q82_banded_item_availability",
    "tpcds_q83_return_share_three_way",
    "tpcds_q84_concat_lookup",
    "tpcds_q85_or_of_band_pairs",
    "tpcds_q89_deviation_from_avg",
    "tpcds_q92_excess_discount_amount",
    "tpcds_q96_filtered_count",
    "dedup_exact_substring",
    # ---- keep-first variant (r9-new) + 5 re-confirm slots ----
    "dedup_exact_substring_keep_first",
    "tpch_q17_small_quantity",
    "tpcds_q44_best_worst",
    "tpcds_q57_lag_lead_self_join",
    "dedup_cluster_best_representative",
    "simsearch_ivfpq_adc_topk",
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
