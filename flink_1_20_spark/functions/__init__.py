"""Scalar/aggregate function surface (SURVEY.md §2.8).

~95% of Flink's 206 BuiltInFunctionDefinitions map 1:1 onto
`pyspark.sql.functions`; `compat` holds shims for the remainder.
"""

from flink_1_20_spark.functions import compat

__all__ = ["compat"]
