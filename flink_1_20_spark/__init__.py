"""pyspark-flow: a PySpark-native analytics engine with the query and
data-processing capabilities of Apache Flink 1.20 (reference:
WangS-C/flink-1.20, surveyed in SURVEY.md).

Not a port — every capability is re-expressed Spark-first:

- relational surface (SURVEY §2.1-2.8) → DataFrame / Spark SQL + Catalyst
- streaming surface (§2.5, §2.9)      → Structured Streaming
- genuinely-missing operators (§7)     → library-level compositions and
  Arrow-batched pandas operators (as-of join, CUMULATE windows, CEP NFA, ...)
- beyond-reference LLM-data-pipeline ops → `flink_1_20_spark.pipeline`

Public entry points:

    from flink_1_20_spark import get_spark, load_tables
    from flink_1_20_spark.registry import QUERIES, ORACLES
"""

from flink_1_20_spark.session import get_spark
from flink_1_20_spark.catalog import load_tables, register_views, TABLE_NAMES

__all__ = ["get_spark", "load_tables", "register_views", "TABLE_NAMES"]
__version__ = "0.1.0"
