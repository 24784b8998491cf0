"""TPC-DS-shape batch SQL battery.

The reference's primary batch-correctness gate is 103 golden-answer
TPC-DS queries (flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/
query/, driver .../tpcds/TpcdsTestProgram.java:48). This module ports
the *shapes* those queries exercise — deep CTE stacks, union-of-channel
aggregations, window-over-aggregate chains, INTERSECT/EXCEPT towers,
correlated scalar subqueries, rollup+rank hierarchies — onto the
fixture tables, one registered query per shape, each named for the
TPC-DS query whose plan shape it mirrors.

Every query here is a single dialect-neutral SQL string executed
verbatim on BOTH engines (Spark via temp views, DuckDB as the oracle),
so correctness is value-exact by construction. Float aggregates are
rounded in the projection; rank/row_number windows carry explicit
tiebreaks (and explicit NULLS FIRST where engines' defaults differ) so
ordering is total.

Scale notes: these are pure declarative plans — Catalyst gets full
freedom (subquery decorrelation, partial aggs, broadcast of the dim
sides, AQE). The shapes worth watching at 100 TB: the correlated
scalar subqueries (q1/q32) decorrelate into one extra keyed aggregate +
broadcast/shuffle join each (no per-row subquery execution), the
INTERSECT towers are hash semi-joins on the grouping key, and the
rollup queries expand via Expand (one shuffle, grouping-id keyed).
q44's global rank and q51's global cumulative sum run unpartitioned
windows — safe here because their input is post-aggregation output
(one row per supplier / per month), which stays small at any corpus
size; never put a global window on a pre-aggregation stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_1_20_spark.registry import register

from ._util import V

# (name, tables, sql) — sql runs verbatim on Spark AND DuckDB.
_SHAPES: list[tuple[str, list[str], str]] = [
    (
        # TPC-DS q1: CTE aggregate + correlated scalar subquery vs
        # 1.2x the per-group average.
        "tpcds_q1_returns_above_avg",
        ["lineitem", "orders", "customer"],
        """
        WITH cust_returns AS (
          SELECT c.c_custkey AS custkey, c.c_nationkey AS nationkey,
                 sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1e4)
                          AS BIGINT)) AS ret_units
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE l.l_returnflag = 'R'
          GROUP BY c.c_custkey, c.c_nationkey)
        SELECT cr.custkey, round(cr.ret_units / 1e4, 2) AS ret_amt
        FROM cust_returns cr
        WHERE cr.ret_units > (SELECT avg(cr2.ret_units) * 1.2e0
                              FROM cust_returns cr2
                              WHERE cr2.nationkey = cr.nationkey)
        """,
    ),
    (
        # TPC-DS q11/q4: multi-CTE year-over-year customer spend ratio.
        "tpcds_q11_yoy_spend",
        ["orders"],
        """
        WITH y95 AS (SELECT o_custkey,
                            sum(CAST(round(o_totalprice * 1e2) AS BIGINT)) AS t
                     FROM orders WHERE year(o_orderdate) = 1995 GROUP BY o_custkey),
             y96 AS (SELECT o_custkey,
                            sum(CAST(round(o_totalprice * 1e2) AS BIGINT)) AS t
                     FROM orders WHERE year(o_orderdate) = 1996 GROUP BY o_custkey)
        SELECT y95.o_custkey AS custkey,
               round(y95.t / 1e2, 2) AS spend_95, round(y96.t / 1e2, 2) AS spend_96,
               round(y96.t * 1e0 / y95.t, 4) AS ratio
        FROM y95 JOIN y96 ON y95.o_custkey = y96.o_custkey
        WHERE y96.t * 1e0 / y95.t > 1.1
        """,
    ),
    (
        # TPC-DS q5/q76/q71: union of channels, aggregated per channel.
        "tpcds_q5_channel_union",
        ["orders", "lineitem"],
        """
        WITH sales AS (
          SELECT 'order' AS channel, year(o_orderdate) AS yr, o_totalprice AS amt
          FROM orders
          UNION ALL
          SELECT 'lineitem' AS channel, year(l_shipdate) AS yr,
                 l_extendedprice * (1 - l_discount) AS amt
          FROM lineitem
          UNION ALL
          SELECT 'return' AS channel, year(l_shipdate) AS yr, -l_extendedprice AS amt
          FROM lineitem WHERE l_returnflag = 'R')
        SELECT channel, yr, count(*) AS n,
               round(sum(CAST(round(amt * 10000) AS BIGINT)) / 1e4, 2) AS total
        FROM sales GROUP BY channel, yr
        """,
    ),
    (
        # TPC-DS q38: INTERSECT tower — customers active in all 3 years.
        "tpcds_q38_intersect_customers",
        ["orders"],
        """
        SELECT count(*) AS n_loyal FROM (
          SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
          INTERSECT
          SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
          INTERSECT
          SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997) t
        """,
    ),
    (
        # TPC-DS q87: EXCEPT tower — active in 1995, gone both later years.
        "tpcds_q87_except_customers",
        ["orders"],
        """
        SELECT count(*) AS n_churned FROM (
          SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
          EXCEPT
          SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
          EXCEPT
          SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997) t
        """,
    ),
    (
        # TPC-DS q47/q57: monthly aggregate + same-window avg/lag/lead,
        # deviation filter.
        "tpcds_q47_monthly_lag_lead",
        ["orders"],
        """
        WITH m AS (
          SELECT o_orderpriority AS pri, year(o_orderdate) AS yr,
                 month(o_orderdate) AS mon,
                 sum(CAST(round(o_totalprice * 1e2) AS BIGINT)) AS s_c
          FROM orders GROUP BY o_orderpriority, year(o_orderdate), month(o_orderdate)),
        w AS (
          SELECT pri, yr, mon, s_c,
                 sum(s_c) OVER (PARTITION BY pri, yr) * 1e0
                   / count(*) OVER (PARTITION BY pri, yr) AS yr_avg_c,
                 lag(s_c) OVER (PARTITION BY pri ORDER BY yr, mon) AS prev_c,
                 lead(s_c) OVER (PARTITION BY pri ORDER BY yr, mon) AS next_c
          FROM m)
        SELECT pri, yr, mon, round(s_c / 1e2, 2) AS s,
               round(yr_avg_c / 1e2, 2) AS yr_avg,
               round(prev_c / 1e2, 2) AS prev_s, round(next_c / 1e2, 2) AS next_s,
               round((s_c - yr_avg_c) / 1e2, 2) AS dev
        FROM w
        WHERE abs(s_c - yr_avg_c) / yr_avg_c > 0.1
        """,
    ),
    (
        # TPC-DS q51: two windowed cumulative streams FULL OUTER JOINed
        # and compared.
        "tpcds_q51_cumulative_compare",
        ["orders", "lineitem"],
        """
        WITH o AS (SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mon,
                          sum(o_totalprice) AS s
                   FROM orders GROUP BY year(o_orderdate), month(o_orderdate)),
             l AS (SELECT year(l_shipdate) AS yr, month(l_shipdate) AS mon,
                          sum(l_extendedprice) AS s
                   FROM lineitem GROUP BY year(l_shipdate), month(l_shipdate)),
             oc AS (SELECT yr, mon, sum(s) OVER (ORDER BY yr, mon
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                    FROM o),
             lc AS (SELECT yr, mon, sum(s) OVER (ORDER BY yr, mon
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                    FROM l)
        SELECT COALESCE(oc.yr, lc.yr) AS yr, COALESCE(oc.mon, lc.mon) AS mon,
               round(oc.cum, 2) AS cum_orders, round(lc.cum, 2) AS cum_lineitem
        FROM oc FULL OUTER JOIN lc ON oc.yr = lc.yr AND oc.mon = lc.mon
        WHERE COALESCE(oc.cum, 0) > COALESCE(lc.cum, 0)
        """,
    ),
    (
        # TPC-DS q53/q63/q89: per-group aggregate vs window average,
        # ratio filter (QUALIFY rewritten as a subquery — Spark has no
        # QUALIFY).
        "tpcds_q53_ratio_to_avg",
        ["lineitem", "part"],
        """
        WITH b AS (
          SELECT p_brand, year(l_shipdate) AS yr, month(l_shipdate) AS mon,
                 sum(CAST(round(l_extendedprice * 1e2) AS BIGINT)) AS s_c
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY p_brand, year(l_shipdate), month(l_shipdate))
        SELECT brand, yr, mon, s, brand_avg, round(ratio, 4) AS ratio
        FROM (
          SELECT p_brand AS brand, yr, mon, round(s_c / 1e2, 2) AS s,
                 round(avg(s_c) OVER (PARTITION BY p_brand) / 1e2, 2)
                   AS brand_avg,
                 s_c / avg(s_c) OVER (PARTITION BY p_brand) AS ratio
          FROM b) t
        WHERE ratio > 1.3
        """,
    ),
    (
        # TPC-DS q44: best-rank and worst-rank lists self-joined on rank.
        "tpcds_q44_best_worst",
        ["lineitem"],
        """
        WITH s AS (SELECT l_suppkey,
                          avg(CAST(round(l_discount * 1e2) AS BIGINT)) AS ad
                   FROM lineitem GROUP BY l_suppkey),
             r AS (SELECT l_suppkey, ad,
                          rank() OVER (ORDER BY ad DESC, l_suppkey) AS rk_best,
                          rank() OVER (ORDER BY ad ASC, l_suppkey) AS rk_worst
                   FROM s)
        SELECT b.rk_best AS rnk, b.l_suppkey AS best_supp, w.l_suppkey AS worst_supp,
               floor(b.ad * 1e4 + 0.5) / 1e6 AS best_avg_disc,
               floor(w.ad * 1e4 + 0.5) / 1e6 AS worst_avg_disc
        FROM r b JOIN r w ON b.rk_best = w.rk_worst
        WHERE b.rk_best <= 5
        """,
    ),
    (
        # TPC-DS q36/q86: ROLLUP hierarchy + rank within grouping level
        # (the lochierarchy + CASE partition trick, verbatim shape).
        "tpcds_q36_rollup_rank",
        ["orders", "customer", "nation"],
        """
        WITH r AS (
          SELECT n_name, c_mktsegment,
                 grouping(n_name) + grouping(c_mktsegment) AS lochierarchy,
                 sum(o_totalprice) AS s
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY ROLLUP(n_name, c_mktsegment))
        SELECT n_name, c_mktsegment, lochierarchy, round(s, 2) AS total,
               rank() OVER (PARTITION BY lochierarchy,
                            CASE WHEN lochierarchy = 0 THEN n_name END
                            ORDER BY s DESC, c_mktsegment ASC NULLS FIRST) AS rnk
        FROM r
        """,
    ),
    (
        # TPC-DS q67: 3-level ROLLUP + top-k per partition.
        "tpcds_q67_rollup_topk",
        ["orders"],
        """
        WITH agg AS (
          SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mon,
                 o_orderpriority AS pri, sum(o_totalprice) AS s
          FROM orders
          GROUP BY ROLLUP(year(o_orderdate), month(o_orderdate), o_orderpriority)),
        ranked AS (
          SELECT yr, mon, pri, s,
                 row_number() OVER (PARTITION BY yr
                                    ORDER BY s DESC, mon ASC NULLS FIRST,
                                             pri ASC NULLS FIRST) AS rk
          FROM agg)
        SELECT yr, mon, pri, round(s, 2) AS total, rk
        FROM ranked WHERE rk <= 3
        """,
    ),
    (
        # TPC-DS q32/q92: correlated scalar subquery — rows above 1.3x
        # their own group's average.
        "tpcds_q32_excess_revenue",
        ["lineitem"],
        """
        SELECT count(*) AS n_items, round(sum(l.l_extendedprice), 2) AS excess_revenue
        FROM lineitem l
        WHERE l.l_extendedprice > (SELECT 1.3 * avg(l2.l_extendedprice)
                                   FROM lineitem l2
                                   WHERE l2.l_partkey = l.l_partkey)
        """,
    ),
    (
        # TPC-DS q9: CASE over bucketed conditional aggregates (FILTER
        # clause) — one scan, all buckets.
        "tpcds_q9_bucket_case",
        ["lineitem"],
        """
        SELECT CASE WHEN count(*) FILTER (WHERE l_quantity BETWEEN 1 AND 15) > 20000
                    THEN floor(avg(CAST(round(l_extendedprice * 1e2) AS BIGINT))
                               FILTER (WHERE l_quantity BETWEEN 1 AND 15) + 0.5) / 1e2
                    ELSE floor(avg(CAST(round(l_discount * 1e2) AS BIGINT))
                               FILTER (WHERE l_quantity BETWEEN 1 AND 15) * 1e4 + 0.5) / 1e6
               END AS bucket1,
               CASE WHEN count(*) FILTER (WHERE l_quantity BETWEEN 16 AND 35) > 20000
                    THEN floor(avg(CAST(round(l_extendedprice * 1e2) AS BIGINT))
                               FILTER (WHERE l_quantity BETWEEN 16 AND 35) + 0.5) / 1e2
                    ELSE floor(avg(CAST(round(l_discount * 1e2) AS BIGINT))
                               FILTER (WHERE l_quantity BETWEEN 16 AND 35) * 1e4 + 0.5) / 1e6
               END AS bucket2,
               CASE WHEN count(*) FILTER (WHERE l_quantity > 35) > 20000
                    THEN floor(avg(CAST(round(l_extendedprice * 1e2) AS BIGINT))
                               FILTER (WHERE l_quantity > 35) + 0.5) / 1e2
                    ELSE floor(avg(CAST(round(l_discount * 1e2) AS BIGINT))
                               FILTER (WHERE l_quantity > 35) * 1e4 + 0.5) / 1e6
               END AS bucket3,
               count(*) AS n_total
        FROM lineitem
        """,
    ),
    (
        # TPC-DS q88: a grid of independent filtered-count subqueries
        # cross-joined into one row.
        "tpcds_q88_count_grid",
        ["orders"],
        """
        SELECT h1.n AS n_urgent_open, h2.n AS n_urgent_done,
               h3.n AS n_low_open, h4.n AS n_low_done
        FROM (SELECT count(*) AS n FROM orders
              WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'O') h1,
             (SELECT count(*) AS n FROM orders
              WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F') h2,
             (SELECT count(*) AS n FROM orders
              WHERE o_orderpriority = '5-LOW' AND o_orderstatus = 'O') h3,
             (SELECT count(*) AS n FROM orders
              WHERE o_orderpriority = '5-LOW' AND o_orderstatus = 'F') h4
        """,
    ),
    (
        # TPC-DS q90: ratio of two disjoint-window scalar subqueries.
        "tpcds_q90_am_pm_ratio",
        ["events"],
        """
        SELECT round(CAST(am.n AS DOUBLE) / pm.n, 6) AS am_pm_ratio,
               am.n AS n_am, pm.n AS n_pm
        FROM (SELECT count(*) AS n FROM events WHERE hour(ts) BETWEEN 6 AND 11) am,
             (SELECT count(*) AS n FROM events WHERE hour(ts) BETWEEN 18 AND 23) pm
        """,
    ),
    (
        # TPC-DS q34/q73: per-group count HAVING a band, joined back to
        # the detail rows.
        "tpcds_q34_count_band",
        ["orders", "customer"],
        """
        WITH busy AS (
          SELECT o_custkey, count(*) AS cnt
          FROM orders GROUP BY o_custkey
          HAVING count(*) BETWEEN 15 AND 20)
        SELECT c.c_custkey, c.c_name, b.cnt
        FROM busy b JOIN customer c ON b.o_custkey = c.c_custkey
        """,
    ),
    (
        # TPC-DS q48/q85: disjunction of conjunctive band predicates
        # (each arm pairs a category with its own numeric range).
        "tpcds_q48_or_of_ands",
        ["lineitem"],
        """
        SELECT count(*) AS n, round(sum(l_extendedprice), 2) AS total
        FROM lineitem
        WHERE (l_returnflag = 'R' AND l_quantity BETWEEN 1 AND 15
               AND l_discount BETWEEN 0.00 AND 0.04)
           OR (l_returnflag = 'A' AND l_quantity BETWEEN 16 AND 35
               AND l_discount BETWEEN 0.03 AND 0.07)
           OR (l_returnflag = 'N' AND l_quantity BETWEEN 36 AND 50
               AND l_discount BETWEEN 0.06 AND 0.10)
        """,
    ),
    (
        # TPC-DS q93: per-order sums adjusted by subtracting the joined
        # returned quantity, then re-aggregated.
        "tpcds_q93_adjusted_sales",
        ["lineitem"],
        """
        WITH adj AS (
          SELECT l.l_orderkey,
                 sum(l.l_extendedprice) AS gross,
                 sum(CASE WHEN l.l_returnflag = 'R' THEN l.l_extendedprice
                          ELSE 0 END) AS returned
          FROM lineitem l GROUP BY l.l_orderkey)
        SELECT l_orderkey, round(gross - returned, 2) AS net
        FROM adj WHERE returned > 0 AND gross - returned > 0
        """,
    ),
    (
        # TPC-DS q23: CTE computes a per-key statistic, a scalar
        # subquery over the CTE sets the admission threshold.
        "tpcds_q23_frequent_keys",
        ["lineitem", "orders"],
        """
        WITH freq AS (
          SELECT l_partkey, count(*) AS cnt
          FROM lineitem GROUP BY l_partkey),
        threshold AS (SELECT avg(cnt) * 1.5 AS lim FROM freq)
        SELECT count(*) AS n_hot_lineitems,
               round(sum(l.l_extendedprice), 2) AS hot_revenue
        FROM lineitem l
        JOIN freq f ON l.l_partkey = f.l_partkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE f.cnt > (SELECT lim FROM threshold)
          AND year(o.o_orderdate) = 1997
        """,
    ),
    (
        # TPC-DS q31: two channels aggregated per (nation, year),
        # self-joined across consecutive years, growth-rate compare.
        "tpcds_q31_yoy_two_channels",
        ["orders", "customer", "nation", "lineitem"],
        """
        WITH o_by AS (
          SELECT n_name, year(o_orderdate) AS yr,
                 sum(CAST(round(o_totalprice * 1e2) AS BIGINT)) AS s
          FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name, year(o_orderdate)),
        l_by AS (
          SELECT n_name, year(l_shipdate) AS yr,
                 sum(CAST(round(l_extendedprice * (1 - l_discount) * 1e4)
                          AS BIGINT)) AS s
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name, year(l_shipdate))
        SELECT o1.n_name, o2.yr AS yr,
               round(o2.s * 1e0 / o1.s, 4) AS order_growth,
               round(l2.s * 1e0 / l1.s, 4) AS lineitem_growth
        FROM o_by o1 JOIN o_by o2 ON o1.n_name = o2.n_name AND o2.yr = o1.yr + 1
        JOIN l_by l1 ON l1.n_name = o1.n_name AND l1.yr = o1.yr
        JOIN l_by l2 ON l2.n_name = o1.n_name AND l2.yr = o2.yr
        WHERE o2.s * 1e0 / o1.s > l2.s * 1e0 / l1.s
        """,
    ),
    (
        # TPC-DS q41: EXISTS against a dimension with nested OR bands,
        # DISTINCT projection.
        "tpcds_q41_distinct_exists_dim",
        ["part", "lineitem"],
        """
        SELECT DISTINCT p.p_brand
        FROM part p
        WHERE p.p_size BETWEEN 10 AND 30
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_partkey = p.p_partkey
              AND ((l.l_quantity BETWEEN 1 AND 10 AND l.l_discount < 0.03)
                OR (l.l_quantity BETWEEN 40 AND 50 AND l.l_discount > 0.07)))
        """,
    ),
    (
        # TPC-DS q78: channel exclusion via left-join-null (orders with
        # no returned lineitem), aggregated per year.
        "tpcds_q78_no_return_by_year",
        ["orders", "lineitem"],
        """
        WITH nr AS (
          SELECT o.o_orderkey, year(o.o_orderdate) AS yr, o.o_totalprice
          FROM orders o
          LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem
                     WHERE l_returnflag = 'R') r
            ON o.o_orderkey = r.l_orderkey
          WHERE r.l_orderkey IS NULL)
        SELECT yr, count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM nr GROUP BY yr
        """,
    ),
    (
        # TPC-DS q17: per-group dispersion stats (mean, stddev,
        # coefficient of variation) with a cov HAVING gate.
        "tpcds_q17_quantity_stats",
        ["lineitem", "part", "orders"],
        """
        SELECT p.p_brand, count(*) AS n,
               round(avg(l.l_quantity), 4) AS qty_mean,
               round(stddev_samp(l.l_quantity), 4) AS qty_sd,
               round(stddev_samp(l.l_quantity) / avg(l.l_quantity), 4) AS qty_cov
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY p.p_brand
        HAVING stddev_samp(l.l_quantity) / avg(l.l_quantity) > 0.5
        """,
    ),
    (
        # TPC-DS q21: before/after-pivot-date conditional sums per
        # supplier with a ratio band in HAVING.
        "tpcds_q21_before_after_ratio",
        ["lineitem", "supplier"],
        """
        SELECT s.s_name,
               sum(CASE WHEN l.l_shipdate <  TIMESTAMP '1998-07-01' THEN l.l_quantity
                        ELSE 0 END) AS qty_before,
               sum(CASE WHEN l.l_shipdate >= TIMESTAMP '1998-07-01' THEN l.l_quantity
                        ELSE 0 END) AS qty_after
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY s.s_name
        HAVING sum(CASE WHEN l.l_shipdate < TIMESTAMP '1998-07-01' THEN l.l_quantity
                        ELSE 0 END) > 0
           AND sum(CASE WHEN l.l_shipdate >= TIMESTAMP '1998-07-01' THEN l.l_quantity
                        ELSE 0 END)
               / sum(CASE WHEN l.l_shipdate < TIMESTAMP '1998-07-01' THEN l.l_quantity
                          ELSE 0 END) BETWEEN 0.8 AND 1.25
        """,
    ),
    (
        # TPC-DS q25/q29: fact-to-fact chain — returned item later
        # re-ordered by the same customer, rolled up per nation.
        "tpcds_q25_return_reorder_chain",
        ["orders", "lineitem", "customer", "nation"],
        """
        SELECT n.n_name,
               count(*) AS n_chains,
               round(sum(l1.l_extendedprice), 2) AS returned_amt,
               round(sum(l2.l_extendedprice), 2) AS reordered_amt
        FROM orders o1
        JOIN lineitem l1 ON l1.l_orderkey = o1.o_orderkey AND l1.l_returnflag = 'R'
        JOIN orders o2 ON o2.o_custkey = o1.o_custkey
                      AND o2.o_orderdate > o1.o_orderdate
        JOIN lineitem l2 ON l2.l_orderkey = o2.o_orderkey
                        AND l2.l_partkey = l1.l_partkey
        JOIN customer c ON o1.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """,
    ),
    (
        # TPC-DS q35: double-EXISTS + NOT EXISTS gate, then group
        # statistics (count/avg/max/min) per segment.
        "tpcds_q35_exists_stats",
        ["customer", "orders", "lineitem"],
        """
        SELECT c.c_mktsegment, count(*) AS n,
               round(avg(CAST(round(c.c_acctbal * 1e2) AS BIGINT)) / 1e2, 4)
                 AS bal_avg,
               round(max(c.c_acctbal), 2) AS bal_max,
               round(min(c.c_acctbal), 2) AS bal_min
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
          AND EXISTS (SELECT 1 FROM orders o
                      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                      WHERE o.o_custkey = c.c_custkey AND l.l_returnflag = 'R')
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 400000)
        GROUP BY c.c_mktsegment
        """,
    ),
    (
        # TPC-DS q58: three per-period channel CTEs joined on the
        # grouping key, kept only where every channel is within ±10%
        # of the three-channel average.
        "tpcds_q58_tolerance_band",
        ["lineitem", "part"],
        """
        WITH y1 AS (SELECT p_brand,
                           sum(CAST(round(l_extendedprice * (1 - l_discount)
                                          * 1e4) AS BIGINT)) AS s
                    FROM lineitem JOIN part ON l_partkey = p_partkey
                    WHERE year(l_shipdate) = 1996 GROUP BY p_brand),
        y2 AS (SELECT p_brand,
                      sum(CAST(round(l_extendedprice * (1 - l_discount)
                                     * 1e4) AS BIGINT)) AS s
               FROM lineitem JOIN part ON l_partkey = p_partkey
               WHERE year(l_shipdate) = 1997 GROUP BY p_brand),
        y3 AS (SELECT p_brand,
                      sum(CAST(round(l_extendedprice * (1 - l_discount)
                                     * 1e4) AS BIGINT)) AS s
               FROM lineitem JOIN part ON l_partkey = p_partkey
               WHERE year(l_shipdate) = 1998 GROUP BY p_brand)
        SELECT y1.p_brand,
               round(y1.s / 1e4, 2) AS s1996, round(y2.s / 1e4, 2) AS s1997,
               round(y3.s / 1e4, 2) AS s1998
        FROM y1 JOIN y2 ON y1.p_brand = y2.p_brand
        JOIN y3 ON y1.p_brand = y3.p_brand
        WHERE y1.s BETWEEN 0.9e0 * (y1.s + y2.s + y3.s) / 3
                       AND 1.1e0 * (y1.s + y2.s + y3.s) / 3
          AND y2.s BETWEEN 0.9e0 * (y1.s + y2.s + y3.s) / 3
                       AND 1.1e0 * (y1.s + y2.s + y3.s) / 3
          AND y3.s BETWEEN 0.9e0 * (y1.s + y2.s + y3.s) / 3
                       AND 1.1e0 * (y1.s + y2.s + y3.s) / 3
        """,
    ),
    (
        # TPC-DS q66: wide month-pivot conditional aggregation (12
        # CASE sums in one pass) per nation for one year.
        "tpcds_q66_month_pivot",
        ["orders", "customer", "nation"],
        """
        SELECT n.n_name,
        """
        + ",\n".join(
            "               round(sum(CASE WHEN month(o.o_orderdate) = "
            f"{m} THEN o.o_totalprice ELSE 0 END), 2) AS m{m:02d}"
            for m in range(1, 13)
        )
        + """
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE year(o.o_orderdate) = 1997
        GROUP BY n.n_name
        """,
    ),
    (
        # TPC-DS q75: union of signed channel rows (sales minus
        # returns) → net per (brand, year) → consecutive-year self-join
        # keeping >10% net-quantity declines.
        "tpcds_q75_yoy_decline",
        ["lineitem", "part"],
        """
        WITH net AS (
          SELECT p_brand, yr, sum(qty) AS qty, sum(amt) AS amt FROM (
            SELECT p.p_brand, year(l.l_shipdate) AS yr,
                   l.l_quantity AS qty, l.l_extendedprice AS amt
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            UNION ALL
            SELECT p.p_brand, year(l.l_shipdate) AS yr,
                   -2 * l.l_quantity AS qty, -2 * l.l_extendedprice AS amt
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE l.l_returnflag = 'R') u
          GROUP BY p_brand, yr)
        SELECT cur.p_brand, cur.yr,
               round(prev.qty, 2) AS prev_qty, round(cur.qty, 2) AS cur_qty,
               round(prev.amt - cur.amt, 2) AS amt_drop
        FROM net cur JOIN net prev
          ON cur.p_brand = prev.p_brand AND cur.yr = prev.yr + 1
        WHERE cur.qty < prev.qty * 0.9
        """,
    ),
    (
        # TPC-DS q72: equi-join chain with a RESIDUAL inequality on the
        # joined rows (ship lag bound) — the planner must keep the hash
        # join and apply the inequality as a post-join filter.
        "tpcds_q72_residual_inequality",
        ["lineitem", "orders", "customer"],
        """
        SELECT c.c_mktsegment,
               count(*) AS n_lagged,
               round(sum(l.l_extendedprice), 2) AS lagged_value
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        GROUP BY c.c_mktsegment
        """,
    ),
    (
        # TPC-DS q39: per-(key, month) dispersion, self-joined on
        # consecutive months where BOTH sides exceed a cov threshold.
        "tpcds_q39_consecutive_cov",
        ["lineitem"],
        """
        WITH m AS (
          SELECT l_suppkey, year(l_shipdate) * 12 + month(l_shipdate) AS mo,
                 avg(l_quantity) AS mean, stddev_samp(l_quantity) AS sd
          FROM lineitem
          GROUP BY l_suppkey, year(l_shipdate) * 12 + month(l_shipdate)
          HAVING count(*) >= 2)
        SELECT m1.l_suppkey, m1.mo AS mo,
               round(m1.sd / m1.mean, 4) AS cov1,
               round(m2.sd / m2.mean, 4) AS cov2
        FROM m m1 JOIN m m2
          ON m1.l_suppkey = m2.l_suppkey AND m2.mo = m1.mo + 1
        WHERE m1.sd / m1.mean > 0.7 AND m2.sd / m2.mean > 0.7
        """,
    ),
    (
        # TPC-DS q54: cohort follow-up — months-since-first-urgent-order
        # histogram over a bounded follow-up window.
        "tpcds_q54_followup_cohort",
        ["orders"],
        """
        WITH first_buy AS (
          SELECT o_custkey,
                 min(year(o_orderdate) * 12 + month(o_orderdate)) AS mo0
          FROM orders WHERE o_orderpriority = '1-URGENT'
          GROUP BY o_custkey)
        SELECT months_after, count(*) AS n_orders FROM (
          SELECT (year(o.o_orderdate) * 12 + month(o.o_orderdate)) - f.mo0
                   AS months_after
          FROM orders o JOIN first_buy f ON o.o_custkey = f.o_custkey) t
        WHERE months_after BETWEEN 1 AND 3
        GROUP BY months_after
        """,
    ),
    (
        # TPC-DS q49: per-channel return-ratio ranking, channels
        # unioned, top-10 per channel with a deterministic tiebreak.
        "tpcds_q49_return_ratio_rank",
        ["lineitem", "orders"],
        """
        WITH ratios AS (
          SELECT o.o_orderstatus AS channel, l.l_suppkey AS suppkey,
                 sum(CASE WHEN l.l_returnflag = 'R' THEN l.l_quantity
                          ELSE 0 END) / sum(l.l_quantity) AS ret_ratio
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          GROUP BY o.o_orderstatus, l.l_suppkey
          HAVING sum(l.l_quantity) > 0),
        ranked AS (
          SELECT channel, suppkey, round(ret_ratio, 6) AS ret_ratio,
                 rank() OVER (PARTITION BY channel
                              ORDER BY round(ret_ratio, 6) DESC, suppkey) AS rnk
          FROM ratios)
        SELECT channel, suppkey, ret_ratio, rnk FROM ranked WHERE rnk <= 10
        """,
    ),
    (
        # TPC-DS q14: brands present in ALL channels (INTERSECT tower)
        # joined back, kept where revenue beats the channel average.
        "tpcds_q14_cross_channel_common",
        ["lineitem", "orders", "part"],
        """
        WITH ch AS (
          SELECT o.o_orderstatus AS channel, p.p_brand,
                 sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1e4)
                          AS BIGINT)) AS s
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN part p ON l.l_partkey = p.p_partkey
          GROUP BY o.o_orderstatus, p.p_brand),
        common AS (
          SELECT p_brand FROM ch WHERE channel = 'F'
          INTERSECT SELECT p_brand FROM ch WHERE channel = 'O'
          INTERSECT SELECT p_brand FROM ch WHERE channel = 'P'),
        avgs AS (SELECT channel, avg(s) AS a FROM ch GROUP BY channel)
        SELECT c.channel, c.p_brand, round(c.s / 1e4, 2) AS revenue
        FROM ch c
        JOIN common USING (p_brand)
        JOIN avgs a ON c.channel = a.channel
        WHERE c.s > a.a
        """,
    ),
]


def _make(name: str, tables: list[str], sql: str) -> None:
    @register(name, oracle=sql)
    def q(spark: SparkSession, sf_dir: str, _tables=tables, _sql=sql) -> DataFrame:
        V(spark, sf_dir, *_tables)
        return spark.sql(_sql)

    q.__name__ = name
    q.__doc__ = f"TPC-DS shape battery: dialect-shared SQL, see _SHAPES['{name}']."


for _name, _tables, _sql in _SHAPES:
    _make(_name, _tables, _sql)


# -- q16/q94: EXISTS (a second supplier on another lineitem of the same
# order) + NOT EXISTS (no returned lineitem), over a selective outer
# filter.  The spec form's EXISTS subquery self-joins lineitem with
# lineitem on l_orderkey — at the 100x fixture AQE keeps the 60M x 60M
# SortMergeJoin (6 SMJ, 9.6 s cold / 8.1 s warm;
# plans/r14/tpcds_q16_exists_shape_100x_executed.txt) because neither
# side can broadcast.  The q21 pre-agg playbook (r13, accepted on a
# row-identical 100x A/B) applies verbatim: both existence predicates
# are per-orderkey aggregates of lineitem —
#   EXISTS(l1 x l2, same order, different supplier)
#     <=> count(DISTINCT l_suppkey) >= 2 over the order's lineitems
#   NOT EXISTS(lr with l_returnflag = 'R')
#     <=> zero 'R' rows over the order's lineitems
# so ONE aggregate over lineitem replaces the self-join + two
# semi/anti joins.  The oracle keeps the spec EXISTS form, and the
# DuckDB both-forms pin (tests/test_tpch_spec_equivalence.py) proves
# the collapse row-identical, as for q21.

_Q16_SPEC = """
SELECT count(*) AS n_orders, round(sum(o.o_totalprice), 2) AS total
FROM orders o
WHERE o.o_orderstatus = 'O'
  AND EXISTS (SELECT 1
              FROM lineitem l1 JOIN lineitem l2
                ON l1.l_orderkey = l2.l_orderkey
               AND l1.l_suppkey <> l2.l_suppkey
              WHERE l1.l_orderkey = o.o_orderkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem lr
                  WHERE lr.l_orderkey = o.o_orderkey
                    AND lr.l_returnflag = 'R')
"""

# dialect-neutral pre-agg twin (runs on Spark AND in the DuckDB
# equivalence pin; the registered oracle stays _Q16_SPEC).
# ">= 2 distinct suppliers" is min <> max, NOT count(DISTINCT):
# a single distinct-agg still plans the two-level
# group-by-(orderkey, suppkey) rewrite (60M rows through the first
# exchange at 100x — measured SLOWER than the spec self-join), while
# min/max are plain partial aggregates that collapse map-side to one
# row per orderkey before the shuffle.
_Q16_PREAGG = """
SELECT count(*) AS n_orders, round(sum(o.o_totalprice), 2) AS total
FROM orders o
JOIN (SELECT l_orderkey,
             min(l_suppkey) AS supp_min,
             max(l_suppkey) AS supp_max,
             max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
      FROM lineitem
      GROUP BY l_orderkey) lx
  ON o.o_orderkey = lx.l_orderkey
WHERE o.o_orderstatus = 'O' AND lx.supp_min <> lx.supp_max AND lx.has_r = 0
"""


@register("tpcds_q16_exists_shape", oracle=_Q16_SPEC)
def tpcds_q16_exists_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q16/q94 port, pre-agg form (see comment above)."""
    V(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q16_PREAGG)
