"""Set operations, sort, limit/offset (SURVEY.md §2.7).

Reference parity:
- union / unionAll      Table.java:554,568; common/CommonExecUnion.java:42
- intersect / minus     Table.java:584,600,523,540 (planner rewrites to agg/join)
- batch sort            exec/batch/BatchExecSort.java:47 → RT/sort/BinaryExternalSorter.java:68
- sort-limit            exec/batch/BatchExecSortLimit.java:48

Spark: all built-in; sort-limit plans as TakeOrderedAndProject (no full
sort at scale), set ops rewrite to aggregates/joins exactly like Flink's
planner does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_20_spark.queries._util import T
from flink_1_20_spark.registry import register


def _big_cust(spark, sf_dir):
    return (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )


def _supp_nations(spark, sf_dir):
    return T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))


_BIG_CUST_SQL = "SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000"
_SUPP_SQL = "SELECT s_nationkey AS nationkey FROM supplier"


@register(
    "setop_union_all",
    oracle=f"SELECT nationkey FROM ({_BIG_CUST_SQL} UNION ALL {_SUPP_SQL})",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _big_cust(spark, sf_dir).union(_supp_nations(spark, sf_dir))


@register(
    "setop_union_distinct",
    oracle=f"SELECT nationkey FROM ({_BIG_CUST_SQL} UNION {_SUPP_SQL})",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _big_cust(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct()


@register(
    "setop_intersect",
    oracle=f"{_BIG_CUST_SQL} INTERSECT {_SUPP_SQL}",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _big_cust(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@register(
    "setop_intersect_all",
    oracle=f"{_BIG_CUST_SQL} INTERSECT ALL {_SUPP_SQL}",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _big_cust(spark, sf_dir).intersectAll(_supp_nations(spark, sf_dir))


@register(
    "setop_except",
    oracle=f"{_BIG_CUST_SQL} EXCEPT {_SUPP_SQL}",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _big_cust(spark, sf_dir).subtract(_supp_nations(spark, sf_dir))


@register(
    "setop_except_all",
    oracle=f"{_BIG_CUST_SQL} EXCEPT ALL {_SUPP_SQL}",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _big_cust(spark, sf_dir).exceptAll(_supp_nations(spark, sf_dir))


@register(
    "sort_multicol_nulls",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 450000
    ORDER BY o_orderkey DESC NULLS LAST, c_custkey ASC
    LIMIT 50
    """,
)
def sort_multicol_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column sort with explicit null ordering over outer-join output."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 450000)
    return (
        c.join(o, cond, "left")
        .select("c_custkey", "c_name", "o_orderkey")
        .orderBy(F.col("o_orderkey").desc_nulls_last(), F.col("c_custkey").asc())
        .limit(50)
    )


@register(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 10
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .offset(10)
        .limit(20)
    )
