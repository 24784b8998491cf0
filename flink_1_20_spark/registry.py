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
    # the 3 DECIMAL→DOUBLE conversions (hash-red r4-r5) — kept in window
    # to prove the decimal-output ban closed the class
    "join_range_banded",
    "tpch_q2_min_cost_supplier",
    "tpcds_q64_spine_reused_cte",
    # ---- r6 rotation: every slot below had ZERO driver history through
    # r5 (146 such queries remain; local sweep green on all of them) ----
    # correlate / subquery family (5 queries + VALUES)
    "subquery_scalar",
    "subquery_in",
    "subquery_not_in",
    "subquery_correlated_agg",
    "values_inline",
    "correlate_unnest_words",
    "correlate_posexplode",
    # scalar-function batteries (siblings fn_string_basic/advanced,
    # fn_json_path, fn_time_type driver-green in r4/r5)
    "fn_string_regex",
    "fn_math_basic",
    "fn_temporal_extract",
    "fn_array_higher_order",
    "fn_json",
    "fn_map",
    # named by the r5 verdict as priority unconfirmed
    "pipeline_temperature_mix",
    "simsearch_hard_negatives",
    "simsearch_recall_ivf",
    "cdc_upsert_materialize",
    "changelog_normalize",
    # operator-family breadth, never-confirmed
    "cep_error_burst",
    "dedup_simhash_collapsed",
    "simsearch_lsh_buckets",
    "text_langid",
    "text_fingerprint",
    "text_repetition",
    "count_window_slide",
    "udx_pandas_scalar",
    "window_dedup",
    "agg_json_arrayagg",
    "agg_json_objectagg",
    # TPC-H full-suite rows never yet in a window
    "tpch_q4_order_priority",
    "tpch_q7_volume_shipping",
    "tpch_q9_product_profit",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q18_large_volume",
    # TPC-DS residual ports never yet in a window
    "tpcds_q6_state_over_avg_price",
    "tpcds_q12_revenue_share_by_class",
    "tpcds_q20_discounted_share_by_type",
    "tpcds_q29_sale_return_repurchase",
    "tpcds_q62_latency_grid_three_dims",
    "tpcds_q23b_best_customer_frequent_items",
    "tpcds_q39b_cov_pair_gated",
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
