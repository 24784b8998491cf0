"""TPC-H q2-q22 adapted to the fixture schema (SURVEY.md §5-6).

The reference's batch-SQL correctness gate is the full TPC-H suite at
SF=0.01 (flink-end-to-end-tests/test-scripts/test_tpch.sh:22). The
fixture schema (FIXTURES.md) omits partsupp and several columns
(l_commitdate/l_receiptdate/l_shipmode, p_mfgr/p_container, c_phone,
o_comment), so each query here keeps the ORIGINAL's operator shape —
join graph, subquery structure, aggregation pattern — with predicates
adapted to the available columns. q1/q3/q5/q6/q10 live in tpch.py.

Every query is ONE dialect-neutral SQL string executed verbatim on both
Spark (spark.sql over temp views) and DuckDB (the oracle) — the purest
form of the reference's golden-answer comparison.

Scale notes: all dimension tables broadcast under AQE; the fact-side
joins shuffle on their keys; correlated subqueries decorrelate to
joins/aggregates in Catalyst (same rewrites Flink's
FlinkSubQueryRemoveRule performs — SURVEY.md §4.1).

One-pass forms (r12, measured at the full-22 100x battery): q2, q15
and q18 spell their spec-shaped "CTE referenced twice" subqueries in
the single-pass equivalent (per-group extreme as a window over the one
aggregation; q18's order-quantity CTE joined instead of re-aggregated
under the IN).  Spark inlines CTE references, so the textbook form
re-scans the 60M-row fact once per reference (q2 measured 74.5 s warm
/ 494 s cold before, the decorrelated scalar agg being a second full
costs build); the rewrites are result-identical (the correlation key
equals the join key in each) and run verbatim on the DuckDB oracle.
"""

from __future__ import annotations

from flink_1_20_spark.registry import register

from ._util import V

_ALL_TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

# name -> dialect-neutral SQL (same string = Spark query AND DuckDB oracle)
_QUERIES: dict[str, str] = {
    # q2: min-cost supplier per part (partsupp emulated from lineitem)
    # The correlated scalar subquery form (`unit_cost = (SELECT MIN ...
    # WHERE c2.l_partkey = p.p_partkey)`) decorrelates to a SECOND full
    # scan+aggregation of the 60M-row costs CTE (Spark inlines CTE
    # references) — measured 74.5 s warm at 100x; a MIN-OVER window on
    # the unfiltered 50M-group costs was WORSE (162.9 s — the window's
    # partition-key sort dwarfs the extra hash agg; rejected form kept
    # in SCALE_r12.json).  The winning shape: the correlation key is
    # the join key and p_size<=10 filters ~4/5 of parts, so the size
    # filter pushes INTO the costs build (per-partkey minima are
    # untouched — restricting to qualifying partkeys cannot change a
    # qualifying partkey's own minimum), and the per-part minimum is a
    # window over that reduced single pass.
    "tpch_q2_min_cost_supplier": """
    WITH costs AS (
        SELECT l_partkey, l_suppkey,
               CAST(CAST(ROUND(CAST(MIN(l_extendedprice / l_quantity) AS DECIMAL(18,8)), 4)
                         AS DECIMAL(18,4)) AS DOUBLE) AS unit_cost
        FROM lineitem
        JOIN part pc ON pc.p_partkey = l_partkey
        WHERE pc.p_size <= 10
        GROUP BY l_partkey, l_suppkey
    ),
    best AS (
        SELECT l_partkey, l_suppkey, unit_cost,
               MIN(unit_cost) OVER (PARTITION BY l_partkey) AS min_cost
        FROM costs
    )
    SELECT p.p_partkey, p.p_brand, s.s_name, n.n_name, c.unit_cost
    FROM part p
    JOIN best c     ON p.p_partkey = c.l_partkey
    JOIN supplier s ON c.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_size <= 10
      AND c.unit_cost = c.min_cost
    """,
    # q4: order priority checking (EXISTS; late-ship predicate adapted)
    "tpch_q4_order_priority": """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    # q7: volume shipping between two nations
    "tpch_q7_volume_shipping": """
    SELECT supp_nation, cust_nation, l_year,
           ROUND(SUM(CAST(ROUND(volume * 10000) AS BIGINT)) / 1e4, 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               EXTRACT(YEAR FROM l_shipdate) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    # q8: national market share within a region for a part type
    "tpch_q8_market_share": """
    SELECT o_year,
           ROUND(SUM(CAST(ROUND(CASE WHEN nation = 'NATION_3' THEN volume
                                     ELSE 0 END * 10000) AS BIGINT)) * 1e0
                 / SUM(CAST(ROUND(volume * 10000) AS BIGINT)), 6) AS mkt_share
    FROM (
        SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
        JOIN region r   ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'EUROPE' AND p.p_type = 'STANDARD'
    ) all_nations
    GROUP BY o_year
    """,
    # q9: product-type profit by nation and year (supplycost term dropped)
    "tpch_q9_product_profit": """
    SELECT nation, o_year,
           ROUND(SUM(CAST(ROUND(amount * 10000) AS BIGINT)) / 1e4, 2)
             AS sum_profit
    FROM (
        SELECT n.n_name AS nation,
               EXTRACT(YEAR FROM o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS amount
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%a%'
    ) profit
    GROUP BY nation, o_year
    """,
    # q11: important stock (value share with HAVING over a scalar subquery)
    "tpch_q11_important_stock": """
    WITH value_per AS (
        SELECT l_partkey, SUM(l_extendedprice * l_quantity) AS val
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_regionkey = 2
        GROUP BY l_partkey
    )
    SELECT l_partkey, ROUND(val, 2) AS value
    FROM value_per
    WHERE val > (SELECT SUM(val) * 0.001 FROM value_per)
    """,
    # q12: shipping modes and order priority (mode → linestatus adapted)
    "tpch_q12_priority_by_status": """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
    # q13: customer order-count distribution (outer join preserving zeros)
    "tpch_q13_customer_distribution": """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                           AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    # q14: promo revenue share (conditional aggregation ratio)
    "tpch_q14_promo_revenue": """
    SELECT ROUND(1e2 * SUM(CAST(ROUND(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END * 10000) AS BIGINT))
                 / SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                            AS BIGINT)), 6) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
    # q15: top supplier (revenue view + scalar max)
    "tpch_q15_top_supplier": """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                        AS BIGINT)) AS rev_x4
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    ),
    best AS (
        SELECT supplier_no, rev_x4, MAX(rev_x4) OVER () AS max_rev
        FROM revenue
    )
    SELECT s.s_suppkey, s.s_name, ROUND(r.rev_x4 / 1e4, 2) AS total_revenue
    FROM supplier s JOIN best r ON s.s_suppkey = r.supplier_no
    WHERE r.rev_x4 = r.max_rev
    """,
    # q16: supplier count per part attribute group (distinct count, NOT IN)
    "tpch_q16_parts_suppliers": """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 9, 19, 23, 36, 45, 49, 3)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    # q17: small-quantity-order revenue (correlated avg subquery)
    "tpch_q17_small_quantity": """
    SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * 1e2) AS BIGINT))
                 / 7.0e0 / 1e2, 2) AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = p.p_partkey)
    """,
    # q18: large-volume customers (IN over grouped HAVING)
    "tpch_q18_large_volume": """
    WITH oq AS (
        SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 150
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           q.total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN oq q     ON o.o_orderkey = q.l_orderkey
    """,
    # q19: discounted revenue (disjunction of conjunctions pushed to join)
    "tpch_q19_discounted_revenue": """
    SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                          AS BIGINT)) / 1e4, 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 35)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
    # q20: potential part promotion (nested IN with half-of-shipped agg)
    "tpch_q20_part_promotion": """
    WITH per AS (
        SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty,
               SUM(SUM(l_quantity)) OVER (PARTITION BY l_partkey)
                   AS part_total
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE '%r%')
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
    )
    SELECT s.s_name, n.n_name
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (
        SELECT l_suppkey FROM per WHERE qty > 0.15 * part_total
    )
      AND n.n_regionkey = 3
    """,
    # q21: suppliers who kept orders waiting (late = shipped > 180 days
    # after order date).  Shipped in the r13 Expand-free pre-agg form
    # (accepted on the SCALE_r13 A/B: 100x fixture, results identical,
    # 28.6 -> 4.3 s warm / 83.6 -> 7.1 s cold at 2-3% steal): lineitem
    # collapses once per (l_orderkey, l_suppkey) with the late-item
    # count, then ONE per-orderkey aggregation replaces the spec's
    # EXISTS / NOT-EXISTS self-join pair —
    #   n_supp      >= 2  ⇔  EXISTS l2 with a different supplier
    #   n_late_supp  = 1  ⇔  NOT EXISTS another late supplier (l1's own
    #                        supplier is late, so exactly one is)
    #   SUM(late_items)   =  the spec's COUNT(*) over qualifying l1
    #                        rows (under n_late_supp = 1 the sum is
    #                        exactly the unique late supplier's count)
    # Both aggregations cluster on l_orderkey, so the second reuses the
    # join shuffle's partitioning (zero extra exchanges) and nothing
    # scans lineitem twice.  The spec form is pinned as the ledger twin
    # by tests/test_tpch_spec_equivalence.py (_Q21_SPEC).
    "tpch_q21_waiting_suppliers": """
    WITH sup AS (
        SELECT l.l_orderkey, l.l_suppkey,
               SUM(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL '180' DAY
                        THEN 1 ELSE 0 END) AS late_items
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY l.l_orderkey, l.l_suppkey
    ),
    ord AS (
        SELECT l_orderkey,
               COUNT(*) AS n_supp,
               SUM(CASE WHEN late_items > 0 THEN 1 ELSE 0 END) AS n_late_supp,
               MAX(CASE WHEN late_items > 0 THEN l_suppkey END) AS late_supp,
               SUM(late_items) AS late_items
        FROM sup
        GROUP BY l_orderkey
    )
    SELECT s.s_name, CAST(SUM(o2.late_items) AS BIGINT) AS numwait
    FROM ord o2
    JOIN supplier s ON s.s_suppkey = o2.late_supp
    WHERE o2.n_supp >= 2 AND o2.n_late_supp = 1
    GROUP BY s.s_name
    """,
    # q22: global sales opportunity (anti-join + scalar avg subquery;
    # phone-prefix adapted to nation-key buckets)
    "tpch_q22_sales_opportunity": """
    SELECT cntrycode, COUNT(*) AS numcust, ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM (
        SELECT CAST(c.c_nationkey % 5 AS INT) AS cntrycode, c.c_acctbal
        FROM customer c
        WHERE c.c_nationkey IN (1, 6, 11, 16, 21, 2, 7)
          AND c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                             WHERE c2.c_acctbal > 0
                               AND c2.c_nationkey IN (1, 6, 11, 16, 21, 2, 7))
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderpriority = '1-URGENT')
    ) custsale
    GROUP BY cntrycode
    """,
}


# q21 SPEC form (the textbook EXISTS / NOT-EXISTS self-join pair the
# shipped pre-agg replaced in r13) — kept as the ledger twin: the
# DuckDB equivalence pin (tests/test_tpch_spec_equivalence.py) runs
# both forms and asserts identical rows, and scale_probe --q21ab
# re-measures the A/B (r13 acceptance: identical 1000-row results at
# 100x, spec 28.6 s warm / 83.6 s cold vs pre-agg 4.3 s warm / 7.1 s
# cold at 2-3% steal; the r12-rejected pre-agg had failed on double
# COUNT DISTINCT's Expand, which this form avoids with bool_or-style
# per-(orderkey,suppkey) collapse).
_Q21_SPEC = """
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL '180' DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL '180' DAY)
    GROUP BY s.s_name
    """


def _make(name: str, sql: str):
    @register(name, oracle=sql)
    def runner(spark, sf_dir, _sql=sql):
        V(spark, sf_dir, *_ALL_TABLES)
        return spark.sql(_sql)

    runner.__name__ = name
    runner.__doc__ = (
        "TPC-H adaptation (test_tpch.sh:22 parity) — identical SQL runs on "
        "Spark and the DuckDB oracle."
    )
    return runner


for _name, _sql in _QUERIES.items():
    _make(_name, _sql)
