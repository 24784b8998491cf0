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
    # the two r6 hash-reds, fixed in r7 (exact integer money sums /
    # cross-engine dtype casts) — kept in window to prove the fix
    "fn_math_basic",
    "tpch_q9_product_profit",
    # decimal-output-ban regression sentinel (red r4-r5, green r6)
    "join_range_banded",
    # ---- r7 rotation: 42 slots. First the queries whose oracles moved
    # to the order-independent integer-money idiom this round (changed
    # SQL must be driver-re-proven), then the never-confirmed fn_*
    # batteries, the never-confirmed pipeline/ANN ops, and the TPC-H /
    # TPC-DS tail (113 queries had no driver confirmation entering r7;
    # every slot below except tpcds_q12 is from that set) ----
    "tpch_q8_market_share",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q19_discounted_revenue",
    "tpcds_q5_channel_union",
    "tpcds_q80_channel_returns_rollup",
    "tpcds_q19_or_join_bands",
    "tpcds_q91_two_dim_loss",
    "tpcds_q10_active_customer_profile",
    "tpcds_q7_avg_grid",
    "tpcds_q13_or_band_averages",
    "tpcds_q18_rollup_decimal_avgs",
    "tpcds_q22_inventory_rollup",
    "tpcds_q26_urgent_avg_grid",
    "tpcds_q73_order_size_band",
    # the r7 builtin-tail battery (collection literals, STR_TO_MAP
    # defaults, JSON constructors, IS JSON, OVERLAPS) — brand-new
    # rewrite machinery, driver-proof it immediately; it displaced
    # tpcds_q12 (confirmed r6; its idiom-change re-proof is covered by
    # the 15 sibling converted queries above)
    "fn_builtin_tail",
    # scalar-function batteries, never confirmed
    "fn_math_trig",
    "fn_math_misc",
    "fn_temporal_arith",
    "fn_temporal_format",
    "fn_conditional",
    "fn_array_basic",
    "fn_array_setops",
    "fn_hash",
    "fn_flink_names",
    # pipeline / dedup / ANN ops, never confirmed
    "dedup_cross_corpus",
    "dedup_incremental_batch",
    "embed_pq_encode",
    "simsearch_pq_adc_topk",
    "simsearch_recall_pq",
    "text_domain_mix_report",
    "pipeline_train_val_test_split",
    # TPC-H full-suite tail, never confirmed
    "tpch_q11_important_stock",
    "tpch_q16_parts_suppliers",
    "tpch_q17_small_quantity",
    "tpch_q20_part_promotion",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_sales_opportunity",
    # TPC-DS family breadth, never confirmed
    "tpcds_q1_returns_above_avg",
    "tpcds_q38_intersect_customers",
    "tpcds_q47_monthly_lag_lead",
    "tpcds_q44_best_worst",
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
