"""User-defined function surface: scalar / aggregate / table functions
(SURVEY.md §2.11).

Reference parity: Flink's UDF API — ScalarFunction (udf),
AggregateFunction (udaf), TableFunction (udtf) in
flink-table-common/.../functions/; PyFlink runs them in Beam-managed
Python workers (flink-python/). Spark's analogue: Arrow-vectorized
pandas UDFs (SCALAR / GROUPED_AGG) and Python UDTFs — same
process-isolation model, Arrow batch transfer instead of Beam.

Even the Python paths here are deterministic, so all three are
oracle-checked against DuckDB SQL reformulations.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from flink_1_20_spark.registry import register

from ._util import T


@register(
    "udx_pandas_scalar",
    oracle="""
    SELECT event_id,
           round(value * 0.5 + length(event_type), 6) AS score
    FROM events WHERE event_id <= 2000
    """,
)
def udx_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar UDF (Flink ScalarFunction.eval →
    @pandas_udf SCALAR): whole Arrow batches in, numpy math, batch out —
    the ~10-100× faster path vs row-at-a-time Python UDFs."""

    @pandas_udf("double")
    def score(value: pd.Series, et: pd.Series) -> pd.Series:
        return (value * 0.5 + et.str.len()).round(6)

    e = T(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    return e.select("event_id", score("value", "event_type").alias("score"))


@register(
    "udx_grouped_agg",
    oracle="""
    SELECT event_type,
           round(sum(value * ((event_id % 10) + 1)) / sum((event_id % 10) + 1), 4)
               AS weighted_avg
    FROM events GROUP BY event_type
    """,
)
def udx_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined aggregate (Flink AggregateFunction accumulate/getValue
    → @pandas_udf GROUPED_AGG): weighted average with numpy inside, one
    Arrow batch per group. Note: unlike built-in aggs this has no
    map-side partial — for 100 TB prefer expressing the same agg as
    built-ins (the oracle shows the rewrite) and reserve GROUPED_AGG for
    genuinely non-decomposable logic."""

    @pandas_udf("double")
    def weighted_avg(value: pd.Series, weight: pd.Series) -> float:
        return round(float((value * weight).sum() / weight.sum()), 4)

    e = T(spark, sf_dir, "events").withColumn(
        "weight", (F.col("event_id") % 10 + 1).cast("double")
    )
    return e.groupBy("event_type").agg(weighted_avg("value", "weight").alias("weighted_avg"))


@register(
    "udx_table_function",
    oracle="""
    SELECT doc_id, u.word, u.idx
    FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word,
               unnest(range(1, len(string_split(text, ' ')) + 1)) AS idx
        FROM documents WHERE doc_id < 20
    ) u
    WHERE length(u.word) > 6
    """,
)
def udx_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table function (Flink TableFunction.collect → Python UDTF,
    Spark 4): one input row → many output rows, lateral-joined. Emits
    (word, 1-based position) for words longer than 6 chars."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, idx int")
    class LongWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" ")):
                if len(w) > 6:
                    yield w, i + 1

    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    # lateral join: UDTF applied per row, doc_id carried through
    spark.udtf.register("long_words", LongWords)
    d.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT doc_id, t.word, t.idx FROM __udtf_docs, "
        "LATERAL long_words(text) AS t"
    )
