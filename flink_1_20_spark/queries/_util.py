"""Shared helpers for query modules."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table (declarative scan — pushdown-friendly)."""
    from flink_1_20_spark.catalog import read_table

    return read_table(spark, sf_dir, name)


def V(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as temp views (for spark.sql queries).

    View names match the oracle's pre-registered DuckDB views, so a
    dialect-neutral SQL string can be shared verbatim between both
    engines.
    """
    for name in names:
        T(spark, sf_dir, name).createOrReplaceTempView(name)


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
    """Round a float aggregate so the cross-engine value-hash is stable.

    Both Spark and DuckDB round-half-up doubles onto the same decimal
    grid, so identical rounding on both sides yields bit-identical
    doubles (mirror of the reference's tolerant numeric comparison,
    TpcdsResultComparator.java:35).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, scale)
