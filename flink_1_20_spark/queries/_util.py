"""Shared helpers for query modules."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def T(
    spark: SparkSession, sf_dir: str, name: str, fresh: bool = False
) -> DataFrame:
    """Load one fixture table (declarative scan — pushdown-friendly).

    Pass ``fresh=True`` at SELF-JOIN call sites (a query referencing
    the same table twice in one join tree): the catalog serves one
    shared lazy handle per (session, sf_dir, table), and a self-join
    through the same object trips Spark's ambiguous-self-join check —
    `fresh` re-aliases the reference with new expression ids
    (catalog.read_table)."""
    from flink_1_20_spark.catalog import read_table

    return read_table(spark, sf_dir, name, fresh=fresh)


def V(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as temp views (for spark.sql queries).

    View names match the oracle's pre-registered DuckDB views, so a
    dialect-neutral SQL string can be shared verbatim between both
    engines.  Registration state lives in catalog.register_view (one
    shared bookkeeping — repeat registrations of the same
    (session, sf_dir) are skipped, any repoint re-registers)."""
    from flink_1_20_spark.catalog import register_view

    for name in names:
        register_view(spark, sf_dir, name)


def canon_join(col: Column | str, sep: str = ",") -> Column:
    """Canonical string rendering of an array column for oracle-checked
    output (list dtypes are banned from oracle outputs — see
    tests/test_oracle_dtypes.py): elements cast to string, joined.
    Oracle mirror: `coalesce(array_to_string(<list>, ','), '')` —
    DuckDB renders the empty list as NULL where Spark's array_join
    gives ''."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(F.transform(c, lambda x: x.cast("string")), sep)


def money(col: Column | str, scale: int = 2) -> Column:
    """Round a float value so the cross-engine value-hash is stable.

    Safe ONLY when the true decimal value of the input lies ON the
    `scale`-digit grid (e.g. rounding a 2-decimal column, or a SUM
    whose summands carry <= `scale` decimal digits — such sums are
    exact on the grid and fp noise never reaches the half-step).
    NOT safe for ROUND(SUM(x), s) where x carries MORE than s decimal
    digits: the exact sum then sits on a half-step boundary with ~1%
    probability per group, and the rounded cent becomes a coin flip on
    cross-engine/run-order fp noise (tpch_q9 went driver-red exactly
    this way: 3/175 groups one cent off). Use money_sum() there.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, scale)


def money_sum(col: Column | str, digits: int = 4, scale: int = 2) -> Column:
    """Order-independent money aggregate (Spark side).

    The summand must carry exactly `digits` decimal digits (TPC-H money:
    price 2, price*(1-disc) 4, price*(1-disc)*(1+tax) 6). Scaling to
    integer units and summing as BIGINT is exact regardless of
    accumulation order — partial-agg order varies run to run and engine
    to engine, so this is the only deterministic form. Overflow headroom:
    |sum| < 2^63 / 10^digits, i.e. ~9e12 at digits=6 — fine for any
    per-group money total; at extreme SF split into two-level sums.

    Oracle mirror (same algebra, HUGEINT internal is fine):
        ROUND(SUM(CAST(ROUND(expr * 10^d) AS BIGINT)) / 10^d.0, s)
    """
    c = F.col(col) if isinstance(col, str) else col
    m = 10**digits
    return F.round(F.sum(F.round(c * m).cast("bigint")) / F.lit(float(m)), scale)


def exact_avg(col: Column | str, digits: int = 2, scale: int = 4) -> Column:
    """Order-independent AVG of a fixed-decimal column: exact BIGINT sum
    of scaled units divided by the count — both deterministic, so the
    quotient and its rounding are bit-stable across engines."""
    c = F.col(col) if isinstance(col, str) else col
    m = 10**digits
    return F.round(
        F.sum(F.round(c * m).cast("bigint")) / F.lit(float(m)) / F.count(F.lit(1)),
        scale,
    )
