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
    # ---- r8 rotation: 42 slots, all from the 76 never-driver-
    # confirmed set (after this window: 33 remain for r9). First the
    # four r7 pipeline/ANN ops with zero driver history, then the 14
    # never-confirmed TPC-DS shapes whose oracles moved to the
    # order-independent integer-units idiom this round (the q1 class,
    # converted at the sum site before rotation so they arrive
    # deterministic), then the never-confirmed TPC-DS tail in
    # registration order (23 after the DSIR swap below). Three
    # DRIVER-CONFIRMED queries also had
    # their oracles converted this round (tpch_q17, tpcds_q44,
    # tpcds_q57) and are NOT re-rotated: the conversion is
    # value-identical by construction, both verify_local passes
    # (driver-mirror + --perturb order-flip) re-proved them at sf0.01,
    # and the idiom itself is the most driver-proven form in the repo
    # — never-confirmed debt outranks re-proof of a proven idiom ----
    "simsearch_ivfpq_adc_topk",
    "simsearch_recall_ivfpq",
    "dedup_cluster_best_representative",
    "pipeline_decontaminated_corpus",
    # converted in r8 (lineage-aware ROUND/SUM sweep)
    "tpcds_q58_tolerance_band",
    "tpcds_q14_cross_channel_common",
    "tpcds_q24_above_global_avg",
    "tpcds_q11_yoy_spend",
    "tpcds_q53_ratio_to_avg",
    "tpcds_q9_bucket_case",
    "tpcds_q31_yoy_two_channels",
    "tpcds_q35_exists_stats",
    "tpcds_q2_period_share",
    "tpcds_q28_band_agg_union",
    "tpcds_q61_promo_share_ratio",
    "tpcds_q59_period_pivot_compare",
    "tpcds_q63_monthly_deviation_or_of_ands",
    "tpcds_q98_revenue_share_window",
    # never-confirmed TPC-DS tail, registration order
    "tpcds_q87_except_customers",
    "tpcds_q51_cumulative_compare",
    "tpcds_q16_exists_shape",
    "tpcds_q67_rollup_topk",
    "tpcds_q32_excess_revenue",
    "tpcds_q88_count_grid",
    "tpcds_q90_am_pm_ratio",
    "tpcds_q34_count_band",
    "tpcds_q48_or_of_ands",
    "tpcds_q93_adjusted_sales",
    "tpcds_q23_frequent_keys",
    "tpcds_q41_distinct_exists_dim",
    "tpcds_q17_quantity_stats",
    "tpcds_q21_before_after_ratio",
    "tpcds_q25_return_reorder_chain",
    "tpcds_q66_month_pivot",
    "tpcds_q75_yoy_decline",
    "tpcds_q39_consecutive_cov",
    "tpcds_q54_followup_cohort",
    "tpcds_q49_return_ratio_rank",
    "tpcds_q95_exists_self_join",
    "tpcds_q94_late_unreturned",
    "tpcds_q4_tri_channel_ratio",
    # r8-new operator (DSIR importance selection) — new code outranks
    # one more tail shape for immediate driver proof
    "pipeline_dsir_select",
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
