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

Form note (r13, guide §1/§4 — the Python boundary applies to the DRIVER
too): these were DataFrame-API chains through round 12.  Every Column
operation is a py4j round-trip, and the r13 profile measured
construction at 0.35-0.7 s per build against 0.09-0.26 s of actual
execution at sf0.1 — the Python-side chatter had become the dominant
per-query cost.  Each query is now ONE SQL string (a single round-trip
into Catalyst, exactly how tpch_full.py's q2-q22 are shipped), mirroring
the former DataFrame chain expression-for-expression: measured build
0.68 s → 0.12-0.18 s (q5), identical physical plans
(plans/r13/*_before/_after.txt), identical results (oracle gate).
The integer-units money algebra (see _util.money_sum) is unchanged —
sums are exact and order-independent, so cross-engine hashes are stable.

q1's cents trick: `CAST(expr * 10^d + 0.5 AS BIGINT)` ==
`CAST(ROUND(expr * 10^d) AS BIGINT)` for these strictly NON-NEGATIVE
money columns (+0.5-then-truncate is round-half-up), and skips Spark
round()'s per-value BigDecimal path (~30% off the agg; r8 ledger).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_1_20_spark.queries._util import V
from flink_1_20_spark.registry import register

# Spark-side SQL per query.  The oracle strings (register(...) below)
# stay byte-identical to rounds 8-12: the Spark forms use the
# +0.5-truncate cents form where the DataFrame chain did; the oracles
# keep DuckDB's ROUND form — equal values on non-negative money.


_Q1_SPARK = """
SELECT l_returnflag, l_linestatus,
       ROUND(qty, 2)                  AS sum_qty,
       ROUND(base_c / 1e2, 2)         AS sum_base_price,
       ROUND(disc_c / 1e4, 2)         AS sum_disc_price,
       ROUND(charge_c / 1e6, 2)       AS sum_charge,
       ROUND(qty / n, 4)              AS avg_qty,
       ROUND(base_c / 1e2 / n, 4)     AS avg_price,
       ROUND(discount_c / 1e2 / n, 4) AS avg_disc,
       n                              AS count_order
FROM (
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS qty,
           SUM(CAST(l_extendedprice * 100 + 0.5 AS BIGINT)) AS base_c,
           SUM(CAST(l_extendedprice * (1 - l_discount) * 10000 + 0.5
                    AS BIGINT)) AS disc_c,
           SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                    * 1000000 + 0.5 AS BIGINT)) AS charge_c,
           SUM(CAST(l_discount * 100 + 0.5 AS BIGINT)) AS discount_c,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
) g
"""


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
    Spark plans the identical two-phase hash agg automatically. ONE
    integer aggregate per money column; every rounded output — including
    the averages — derives from it."""
    V(spark, sf_dir, "lineitem")
    return spark.sql(_Q1_SPARK)


_Q3_SPARK = """
SELECT l_orderkey,
       ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                      AS BIGINT)) / 1e4, 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders    ON c_custkey = o_custkey
JOIN lineitem  ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
"""


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
    V(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_Q3_SPARK)


_Q5_SPARK = """
SELECT /*+ BROADCAST(nation), BROADCAST(region) */ n_name,
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
"""


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

    Fact-fact (lineitem⋈orders) shuffles on the key; dims broadcast
    (hinted for nation/region exactly as the DataFrame form did).
    Flink runs this as chained BatchExecHashJoin ops."""
    V(spark, sf_dir, "lineitem", "orders", "customer", "nation", "region")
    return spark.sql(_Q5_SPARK)


_Q6_SPARK = """
SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * l_discount * 10000)
                      AS BIGINT)) / 1e4, 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


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
    V(spark, sf_dir, "lineitem")
    return spark.sql(_Q6_SPARK)


_Q10_SPARK = """
SELECT /*+ BROADCAST(nation) */ c_custkey, c_name,
       ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                      AS BIGINT)) / 1e4, 2) AS revenue,
       ROUND(c_acctbal, 2) AS acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


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
    V(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return spark.sql(_Q10_SPARK)
