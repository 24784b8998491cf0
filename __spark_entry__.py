"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over `flink_1_20_spark.registry` — every operator implemented
from SURVEY.md §2 registers a named query callable plus (where
SQL-expressible) a DuckDB oracle there. See flink_1_20_spark/queries/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_1_20_spark.registry import get_oracles, get_queries  # noqa: E402

FLAGSHIP = "tpch_q5_local_supplier_volume"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (5-table star join → revenue by nation) at sf0.001."""
    return get_queries()[FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each SQL-expressible query."""
    return get_oracles()
