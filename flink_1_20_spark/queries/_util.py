"""Shared helpers for query modules."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table (declarative scan — pushdown-friendly)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def money(col: Column | str, scale: int = 2) -> Column:
    """Round a float aggregate so the cross-engine value-hash is stable.

    Both Spark and DuckDB round-half-up doubles onto the same decimal
    grid, so identical rounding on both sides yields bit-identical
    doubles (mirror of the reference's tolerant numeric comparison,
    TpcdsResultComparator.java:35).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, scale)
