"""Registrable function targets for `CREATE FUNCTION ... AS '<path>'`
(sql_ddl.TableEnvironment._create_function).

Flink registers functions by fully-qualified class name
(SqlNodeToOperationConversion CREATE FUNCTION path; function kinds in
flink-table-common/.../functions/). The Python analogues here cover
each accepted target kind:

  * `score_udf`        — a pandas UDF object (ScalarFunction, vectorized)
  * `TaggedLength`     — a Flink-style class with ``eval`` + result_type
  * `clip_value`       — a plain callable with a ``result_type`` attribute
  * `SplitWords`       — a UDTF (TableFunction), usable via LATERAL/TABLE()
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# NOTE: return types are DataType INSTANCES, not DDL strings — string
# types are parsed via the active session at decoration time, and this
# module is also imported by executor workers (when a registered plain
# callable defined here is unpickled), where no session exists.


@pandas_udf(DoubleType())
def score_udf(value: pd.Series, et: pd.Series) -> pd.Series:
    """value * 0.5 + length(event_type), rounded — matches the
    udx_pandas_scalar oracle expression."""
    return (value * 0.5 + et.str.len()).round(6)


class TaggedLength:
    """Flink ScalarFunction shape: instance ``eval`` plus a declared
    result type (ScalarFunction.getTypeInference analog)."""

    result_type = "int"

    def eval(self, s):
        return len(s) if s is not None else None


def clip_value(v):
    """Plain callable target; result_type pins the Spark return type."""
    return float(min(max(v, 0.0), 100.0)) if v is not None else None


clip_value.result_type = "double"


@udtf(
    returnType=StructType(
        [StructField("word", StringType()), StructField("idx", IntegerType())]
    )
)
class SplitWords:
    """TableFunction shape: one row in, N (word, idx) rows out."""

    def eval(self, text: str):
        for i, w in enumerate((text or "").split()):
            yield w, i
