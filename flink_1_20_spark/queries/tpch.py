"""TPC-H-style headline queries (adapted to the fixture schema).

Reference parity: the reference validates its batch SQL engine with the
full TPC-H suite at SF=0.01 (flink-end-to-end-tests/test-scripts/
test_tpch.sh:22) — these queries exercise the same physical operator mix
(scan + pushdown filter, broadcast/shuffle hash join, partial+final hash
agg, sort, limit; SURVEY.md §2.1-2.7) adapted to the columns present in
the fixture tables (FIXTURES.md).

All queries are expressed declaratively so Catalyst picks the physical
strategy; small dimensions (region/nation/customer/supplier/part) go
broadcast automatically under AQE at any scale where they fit, while the
lineitem/orders fact-fact join shuffles on the join key — the plan shape
that survives a 100x scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_20_spark.queries._util import T, money, money_sum
from flink_1_20_spark.registry import register


@register(
    "tpch_q1_pricing_summary",
    oracle="""
    WITH g AS (
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS qty,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS base_c,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                        AS BIGINT)) AS disc_c,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                              * 1000000) AS BIGINT)) AS charge_c,
               SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS discount_c,
               COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus,
           ROUND(qty, 2)                  AS sum_qty,
           ROUND(base_c / 1e2, 2)         AS sum_base_price,
           ROUND(disc_c / 1e4, 2)         AS sum_disc_price,
           ROUND(charge_c / 1e6, 2)       AS sum_charge,
           ROUND(qty / n, 4)              AS avg_qty,
           ROUND(base_c / 1e2 / n, 4)     AS avg_price,
           ROUND(discount_c / 1e2 / n, 4) AS avg_disc,
           n                              AS count_order
    FROM g
    """,
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-scan group agg: the canonical partial+final HashAggregate.

    Flink: BatchExecHashAggregate (exec/batch/BatchExecHashAggregate.java:55);
    Spark plans the identical two-phase hash agg automatically.
    """
    l = T(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))

    def cents(col, m):
        # exact integer units — order-independent sums. +0.5-then-truncate
        # == round for these strictly NON-NEGATIVE money columns and skips
        # Spark round()'s per-value BigDecimal path (~30% off the agg)
        return F.sum((col * m + F.lit(0.5)).cast("bigint"))

    # ONE integer aggregate per money column; every rounded output —
    # including the averages — derives from it, so the exact-sum
    # conversion costs no duplicate aggregates
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("qty"),
            cents(F.col("l_extendedprice"), 100).alias("base_c"),
            cents(disc_price, 10000).alias("disc_c"),
            cents(charge, 1000000).alias("charge_c"),
            cents(F.col("l_discount"), 100).alias("discount_c"),
            F.count("*").alias("n"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            money("qty").alias("sum_qty"),
            F.round(F.col("base_c") / 1e2, 2).alias("sum_base_price"),
            F.round(F.col("disc_c") / 1e4, 2).alias("sum_disc_price"),
            F.round(F.col("charge_c") / 1e6, 2).alias("sum_charge"),
            F.round(F.col("qty") / F.col("n"), 4).alias("avg_qty"),
            F.round(F.col("base_c") / 1e2 / F.col("n"), 4).alias("avg_price"),
            F.round(F.col("discount_c") / 1e2 / F.col("n"), 4).alias("avg_disc"),
            F.col("n").alias("count_order"),
        )
    )


@register(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                          AS BIGINT)) / 1e4, 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders    ON c_custkey = o_custkey
    JOIN lineitem  ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + TopN (sort-limit → TakeOrderedAndProject).

    Flink: BatchExecHashJoin + BatchExecSortLimit
    (exec/batch/BatchExecHashJoin.java:58, BatchExecSortLimit.java:48).
    """
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                          AS BIGINT)) / 1e4, 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: 5-table star join → revenue by nation.

    Fact-fact (lineitem⋈orders) shuffles on the key; dims broadcast.
    Flink runs this as chained BatchExecHashJoin ops; Spark's AQE picks
    broadcast for every dim side automatically.
    """
    l = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy(F.desc("revenue"))
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * l_discount * 10000)
                          AS BIGINT)) / 1e4, 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan+filter+agg — validates predicate pushdown to parquet."""
    l = T(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(money_sum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"))
    )


@register(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                          AS BIGINT)) / 1e4, 2) AS revenue,
           ROUND(c_acctbal, 2) AS acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join agg with TopN on revenue (returned-items report)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = T(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            money("c_acctbal").alias("acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )
