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
    # ---- r11 rotation. (1) the ONE query without a driver row —
    # landed after the r10 window froze (r10 ledger); a green row here
    # closes cumulative driver confirmation at 283/283, coverage
    # complete. Green in the r10 bare AND perturbed sweeps and again
    # this round.
    "decontaminate_exact_substring_tokens",
    # (2)-(5) guard-path re-proof: the compact-input scan guard moved
    # to the public operators/util.ensure_scan_parallelism this round
    # and gained the split-count estimate (files are not splits — r11
    # ADVICE), and the exact-substring/decon oracles+call sites now
    # derive their pinned constants from one place (byte-identical SQL,
    # verified) — the driver re-confirms one query per touched family.
    "dedup_exact_substring",
    "decontaminate_exact_substring",
    "text_contamination_ngram",
    "pipeline_dsir_select",
    # ---- 37 re-proof slots: the queries whose last driver
    # confirmation is OLDEST (all 25 remaining r3-confirmed + the 12
    # oldest r4-confirmed) — ages the whole registry forward while
    # keeping one+ per operator family (joins incl. outer/semi/anti/
    # nonequi/window, all set ops, agg tail, over windows, rank/dedup,
    # sort/limit).
    "join_inner_equi",
    "join_left_outer",
    "join_right_outer",
    "join_left_semi",
    "join_cross",
    "setop_union_all",
    "setop_union_distinct",
    "setop_intersect",
    "setop_except",
    "limit_offset",
    "agg_stats",
    "agg_first_last_value",
    "agg_listagg",
    "agg_sum0_empty",
    "agg_collect_multiset",
    "agg_rollup",
    "agg_grouping_id",
    "agg_having",
    "agg_bool_bit",
    "over_rows_running",
    "over_rows_sliding",
    "over_range_numeric",
    "over_lead_lag",
    "over_first_last_nth",
    "dedup_keep_first",
    "join_full_outer",
    "join_left_anti",
    "join_nonequi_range",
    "join_window",
    "setop_intersect_all",
    "sort_multicol_nulls",
    "agg_count_distinct",
    "agg_cube",
    "agg_pivot",
    "table_agg_top2_per_group",
    "over_rank_functions",
    "rank_topn_per_group",
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
