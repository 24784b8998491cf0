"""Correlate (UDTF/UNNEST/lateral) and subqueries (SURVEY.md §2.2, §4.1).

Reference parity:
- Correlate / lateral UDTF   common/CommonExecCorrelate.java:52
- UNNEST                     BuiltInFunctionDefinitions.java:446 ($UNNEST_ROWS$1)
- subquery → semi/anti join  FlinkSubQueryRemoveRule (FlinkStreamRuleSets.scala:37)
- decorrelation              FlinkStreamProgram.scala:33 (DECORRELATE phase)

Spark: explode/posexplode are the Correlate operator; Catalyst's
RewritePredicateSubquery + decorrelation match Flink's Calcite programs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_20_spark.queries._util import T, V, money
from flink_1_20_spark.registry import register


@register(
    "correlate_unnest_words",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word
          FROM documents WHERE doc_id <= 100)
    WHERE word <> ''
    GROUP BY word
    """,
)
def correlate_unnest_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST / flatMap: explode document tokens → word counts."""
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") <= 100)
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


@register(
    "correlate_posexplode",
    oracle="""
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
           unnest(string_split(text, ' ')) AS word
    FROM documents WHERE doc_id <= 20
    """,
)
def correlate_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (ordinal UNNEST) — 0-based position like Spark."""
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") <= 20)
    return d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word"))


_LATERAL_SQL = """
    SELECT r.r_name, t.n_name, t.n_nationkey
    FROM region r,
         LATERAL (SELECT n_name, n_nationkey FROM nation
                  WHERE n_regionkey = r.r_regionkey
                  ORDER BY n_nationkey LIMIT 2) t
"""


@register("correlate_lateral_topn", oracle=_LATERAL_SQL)
def correlate_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlate (CommonExecCorrelate.java:52): first-2 nations
    per region via a correlated lateral subquery — identical SQL on both
    engines (Spark ≥3.2 supports LATERAL)."""
    V(spark, sf_dir, "region", "nation")
    return spark.sql(_LATERAL_SQL)


_SCALAR_SUBQ_SQL = """
    SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal
    FROM customer
    WHERE c_acctbal > 2 * (SELECT AVG(c_acctbal) FROM customer)
"""


@register("subquery_scalar", oracle=_SCALAR_SUBQ_SQL)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    V(spark, sf_dir, "customer")
    return spark.sql(_SCALAR_SUBQ_SQL)


_IN_SUBQ_SQL = """
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
      AND o_totalprice > 350000
"""


@register("subquery_in", oracle=_IN_SUBQ_SQL)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery → left-semi join (FlinkSubQueryRemoveRule)."""
    V(spark, sf_dir, "orders", "customer")
    return spark.sql(_IN_SUBQ_SQL)


_NOT_IN_SQL = """
    SELECT p_partkey, p_brand
    FROM part
    WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 10)
"""


@register("subquery_not_in", oracle=_NOT_IN_SQL)
def subquery_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    V(spark, sf_dir, "part", "lineitem")
    return spark.sql(_NOT_IN_SQL)


_CORR_EXISTS_SQL = """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_suppkey = s_suppkey AND l_discount >= 0.09)
"""


@register("subquery_exists_correlated", oracle=_CORR_EXISTS_SQL)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    V(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(_CORR_EXISTS_SQL)


_CORR_AGG_SQL = """
    SELECT c_mktsegment, c_custkey, ROUND(c_acctbal, 2) AS acctbal
    FROM customer c1
    WHERE c_acctbal > (SELECT AVG(c_acctbal) + 4000 FROM customer c2
                       WHERE c2.c_mktsegment = c1.c_mktsegment)
"""


@register("subquery_correlated_agg", oracle=_CORR_AGG_SQL)
def subquery_correlated_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar aggregate subquery → decorrelated join+agg
    (Flink DECORRELATE phase / Catalyst decorrelation)."""
    V(spark, sf_dir, "customer")
    return spark.sql(_CORR_AGG_SQL)


@register(
    "values_inline",
    oracle="""
    SELECT id, name, UPPER(name) AS uname
    FROM (VALUES (1, 'flink'), (2, 'spark'), (3, 'calcite'), (4, NULL)) v(id, name)
    """,
)
def values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUES source (exec/batch/BatchExecValues.java:37).

    Expressed as a SQL VALUES clause so the plan is a driver-local
    LocalTableScan — `createDataFrame` over a Python list parallelizes
    it into an RDD scan whose stage launches `defaultParallelism`
    tasks (32 on this box) for 4 rows (r13 plan audit; BatchExecValues
    is likewise a local values node, not a distributed scan)."""
    return spark.sql(
        "SELECT id, name, upper(name) AS uname "
        "FROM VALUES (1, 'flink'), (2, 'spark'), (3, 'calcite'), "
        "(4, CAST(NULL AS STRING)) AS v(id, name)"
    )
