"""TPC-DS-shape battery, long-tail extension.

Continues queries/tpcds_shapes.py toward the reference's 103-query gate
(flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query/): the plan
families the first 35 shapes left unexercised — q64-style multi-join
spines with a reused CTE self-joined across years, q95/q94-style
EXISTS over a self-joined subquery plus NOT EXISTS anti chains,
q80-style channel union with returns netting under ROLLUP, q2/q4-style
reused-CTE period comparisons, q10/q69-style multi-EXISTS customer
filtering, correlated-average gates (q24/q65), deep rollups (q27),
IN-dim unions (q33), banded dimension scans (q37/q85), shipping-bucket
grids (q99), disjunctive IN (q45), and revenue-share windows over
aggregates (q98) — through three extension batches to 80 shapes.

Coverage note vs the full 103: the 23 queries this module once covered
only by plan-family mapping (q6, q12, q20, q29, q30, q52, q55, q56,
q57, q60, q62, q63, q68, q79, q81, q82, q83, q86, q92 and the b-variants
q14b, q23b, q24b, q39b) are now ported for real in
queries/tpcds_residual.py — 103/103 family coverage, every one
oracle-checked and inside the no-NLJ plan sweep.

Same contract as the base module: one dialect-neutral SQL string per
shape, executed verbatim on Spark and DuckDB — value-exact by
construction. Scale notes: every EXISTS/NOT EXISTS decorrelates to
semi/anti hash joins (guarded by tests/test_plans.py no-NLJ sweep);
the reused CTEs materialize once per consumer under Catalyst (CTE
inlining) with partial aggs before every shuffle; the q98-style window
runs partitioned by its grouping key, never globally over raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_1_20_spark.registry import register

from ._util import V

_SHAPES: list[tuple[str, list[str], str]] = [
    (
        # q64: wide join spine (6 tables) aggregated into a CTE, then
        # self-joined across two years on the retained keys.
        "tpcds_q64_spine_reused_cte",
        ["lineitem", "orders", "customer", "nation", "supplier", "part"],
        """
        WITH spine AS (
          SELECT p.p_partkey AS partkey, p.p_brand AS brand, n.n_name AS nation,
                 year(o.o_orderdate) AS yr,
                 sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                          AS DECIMAL(18,6))) AS revenue,
                 count(*) AS cnt
          FROM lineitem l
          JOIN orders o   ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n   ON c.c_nationkey = n.n_nationkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN part p     ON l.l_partkey = p.p_partkey
          WHERE p.p_size <= 20
          GROUP BY p.p_partkey, p.p_brand, n.n_name, year(o.o_orderdate))
        SELECT s1.partkey, s1.brand, s1.nation,
               CAST(CAST(round(s1.revenue, 2) AS DECIMAL(18,2)) AS DOUBLE) AS rev_a,
               CAST(CAST(round(s2.revenue, 2) AS DECIMAL(18,2)) AS DOUBLE) AS rev_b,
               s1.cnt AS cnt_a, s2.cnt AS cnt_b
        FROM spine s1
        JOIN spine s2 ON s1.partkey = s2.partkey AND s1.nation = s2.nation
                     AND s1.brand = s2.brand
        WHERE s1.yr = 1995 AND s2.yr = 1996 AND s2.revenue >= s1.revenue
        """,
    ),
    (
        # q95: EXISTS over a self-joined subquery (two lines, different
        # suppliers) AND NOT EXISTS returns — semi + anti on one scan.
        "tpcds_q95_exists_self_join",
        ["orders", "lineitem"],
        """
        SELECT o.o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE EXISTS (SELECT 1
                      FROM lineitem l1 JOIN lineitem l2
                        ON l1.l_orderkey = l2.l_orderkey
                       AND l1.l_suppkey <> l2.l_suppkey
                      WHERE l1.l_orderkey = o.o_orderkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = o.o_orderkey
                            AND l3.l_returnflag = 'R')
        GROUP BY o.o_orderpriority
        """,
    ),
    (
        # q94: late-but-unreturned orders — EXISTS(receipt>commit) AND
        # NOT EXISTS(return), global distinct-count + sum.
        "tpcds_q94_late_unreturned",
        ["orders", "lineitem"],
        """
        SELECT count(DISTINCT o.o_custkey) AS n_cust,
               round(sum(o.o_totalprice), 2) AS total
        FROM orders o
        WHERE o.o_orderstatus = 'F'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND year(l.l_shipdate) > year(o.o_orderdate))
          AND NOT EXISTS (SELECT 1 FROM lineitem lr
                          WHERE lr.l_orderkey = o.o_orderkey
                            AND lr.l_returnflag = 'R')
        """,
    ),
    (
        # q80: three channels unioned, per-channel sales vs returns
        # netting, totals via ROLLUP (grand-total row included).
        "tpcds_q80_channel_returns_rollup",
        ["lineitem"],
        """
        WITH ch AS (
          SELECT CASE WHEN l_linenumber <= 2 THEN 'A'
                      WHEN l_linenumber <= 4 THEN 'B' ELSE 'C' END AS channel,
                 l_extendedprice * (1 - l_discount) AS sales,
                 CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END
                   AS returns_amt
          FROM lineitem)
        SELECT channel,
               round(sum(CAST(round(sales * 10000) AS BIGINT)) / 1e4, 2) AS sales,
               round(sum(returns_amt), 2) AS returns_amt,
               round(sum(CAST(round((sales - returns_amt) * 10000) AS BIGINT))
                     / 1e4, 2) AS profit
        FROM ch
        GROUP BY ROLLUP(channel)
        """,
    ),
    (
        # q2: periodic totals in a CTE consumed twice (adjacent-year
        # share comparison keyed by day-of-month).
        "tpcds_q2_period_share",
        ["orders"],
        """
        WITH pe AS (
          SELECT day(o_orderdate) AS dom, year(o_orderdate) AS yr,
                 sum(CAST(round(o_totalprice * 1e2) AS BIGINT)) AS t
          FROM orders
          GROUP BY day(o_orderdate), year(o_orderdate))
        SELECT p1.dom, round(p1.t / 1e2, 2) AS t_a, round(p2.t / 1e2, 2) AS t_b,
               round(p2.t * 1e0 / p1.t, 4) AS ratio
        FROM pe p1 JOIN pe p2 ON p1.dom = p2.dom
        WHERE p1.yr = 1995 AND p2.yr = 1996
        """,
    ),
    (
        # q4: three status channels as CTEs, inner-chained on the first
        # two with a LEFT join to the third, ratio-gated.
        "tpcds_q4_tri_channel_ratio",
        ["orders"],
        """
        WITH tf AS (SELECT o_custkey, sum(o_totalprice) AS t FROM orders
                    WHERE o_orderstatus = 'F' GROUP BY o_custkey),
             to2 AS (SELECT o_custkey, sum(o_totalprice) AS t FROM orders
                     WHERE o_orderstatus = 'O' GROUP BY o_custkey),
             tp AS (SELECT o_custkey, sum(o_totalprice) AS t FROM orders
                    WHERE o_orderstatus = 'P' GROUP BY o_custkey)
        SELECT tf.o_custkey AS custkey,
               round(tf.t, 2) AS t_f, round(to2.t, 2) AS t_o,
               round(coalesce(tp.t, 0), 2) AS t_p
        FROM tf
        JOIN to2 ON tf.o_custkey = to2.o_custkey
        LEFT JOIN tp ON tf.o_custkey = tp.o_custkey
        WHERE to2.t > tf.t
        """,
    ),
    (
        # q10: customers active in a year AND matching either of two
        # behavioral predicates — EXISTS + IN decorrelation mix.
        "tpcds_q10_active_customer_profile",
        ["customer", "nation", "orders"],
        """
        SELECT c.c_mktsegment, n.n_name, count(*) AS cnt,
               sign(sum(CAST(round(c.c_acctbal * 1e2) AS BIGINT)))
                 * floor(abs(sum(CAST(round(c.c_acctbal * 1e2) AS BIGINT))
                             * 1e0 / count(c.c_acctbal)) + 0.5) / 1e2
                 AS avg_bal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND year(o.o_orderdate) = 1995)
          AND c.c_custkey IN (SELECT o2.o_custkey FROM orders o2
                              WHERE o2.o_orderpriority = '1-URGENT'
                                 OR o2.o_orderstatus = 'F')
        GROUP BY c.c_mktsegment, n.n_name
        """,
    ),
    (
        # q69: semi on one channel, anti on another, grouped counts.
        "tpcds_q69_semi_anti_profile",
        ["customer", "orders"],
        """
        SELECT c.c_mktsegment, count(*) AS cnt
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'P')
        GROUP BY c.c_mktsegment
        """,
    ),
    (
        # q24: reused per-customer CTE gated by a scalar subquery over
        # itself (spend > 1.5x the global average spend).
        "tpcds_q24_above_global_avg",
        ["lineitem", "orders", "customer"],
        """
        WITH per_cust AS (
          SELECT c.c_custkey AS custkey, c.c_name AS name,
                 sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1e4)
                          AS BIGINT)) AS amt_units
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY c.c_custkey, c.c_name)
        SELECT custkey, name, round(amt_units / 1e4, 2) AS amt
        FROM per_cust
        WHERE amt_units > (SELECT 1.5e0 * avg(amt_units) FROM per_cust)
        """,
    ),
    (
        # q65: supplier-item revenue at most 10% of the supplier's
        # average item revenue — agg-over-agg join chain.
        "tpcds_q65_low_revenue_items",
        ["lineitem", "supplier"],
        """
        WITH si AS (SELECT l_suppkey AS supp, l_partkey AS item,
                           sum(l_extendedprice) AS rev
                    FROM lineitem GROUP BY l_suppkey, l_partkey),
             sa AS (SELECT supp, avg(rev) AS avg_rev FROM si GROUP BY supp)
        SELECT s.s_name, si.item, round(si.rev, 2) AS rev
        FROM si
        JOIN sa ON si.supp = sa.supp
        JOIN supplier s ON si.supp = s.s_suppkey
        WHERE si.rev <= 0.1 * sa.avg_rev
        """,
    ),
    (
        # q27: three-level ROLLUP hierarchy with grouping counts.
        "tpcds_q27_rollup_three_dims",
        ["lineitem", "orders", "customer", "nation"],
        """
        SELECT n.n_name, o.o_orderpriority, l.l_returnflag,
               count(*) AS cnt, round(avg(l.l_quantity), 2) AS avg_qty
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY ROLLUP(n.n_name, o.o_orderpriority, l.l_returnflag)
        """,
    ),
    (
        # q33/q56/q60: three channel aggregates over an IN-subquery dim
        # restriction, unioned then re-aggregated.
        "tpcds_q33_union_in_dim",
        ["lineitem", "part"],
        """
        WITH dim AS (SELECT p_partkey FROM part WHERE p_type LIKE '%ECO%'),
        a AS (SELECT p.p_type AS mfgr, sum(l.l_extendedprice) AS s
              FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
              WHERE l.l_partkey IN (SELECT p_partkey FROM dim)
                AND l.l_linenumber = 1 GROUP BY p.p_type),
        b AS (SELECT p.p_type AS mfgr, sum(l.l_extendedprice) AS s
              FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
              WHERE l.l_partkey IN (SELECT p_partkey FROM dim)
                AND l.l_linenumber = 2 GROUP BY p.p_type),
        c AS (SELECT p.p_type AS mfgr, sum(l.l_extendedprice) AS s
              FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
              WHERE l.l_partkey IN (SELECT p_partkey FROM dim)
                AND l.l_linenumber >= 3 GROUP BY p.p_type)
        SELECT mfgr, round(sum(s), 2) AS total
        FROM (SELECT * FROM a UNION ALL SELECT * FROM b UNION ALL SELECT * FROM c) u
        GROUP BY mfgr
        """,
    ),
    (
        # q37/q82: banded dimension scan (price range + size IN list)
        # joined to the fact for existence, per-brand minimum.
        "tpcds_q37_banded_dim_scan",
        ["part", "lineitem"],
        """
        SELECT p.p_brand, round(min(p.p_retailprice), 2) AS min_price,
               count(DISTINCT p.p_partkey) AS n_parts
        FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
        WHERE p.p_retailprice BETWEEN 900 AND 1400
          AND p.p_size IN (5, 10, 15, 20, 25)
        GROUP BY p.p_brand
        """,
    ),
    (
        # q85: OR of conjunctive band predicates across the join.
        "tpcds_q85_or_of_band_pairs",
        ["lineitem", "orders"],
        """
        SELECT o.o_orderpriority, count(*) AS cnt,
               round(avg(l.l_quantity), 2) AS avg_qty
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE (l.l_quantity BETWEEN 1 AND 10
               AND o.o_totalprice BETWEEN 0 AND 100000)
           OR (l.l_quantity BETWEEN 20 AND 30
               AND o.o_totalprice BETWEEN 100000 AND 300000)
        GROUP BY o.o_orderpriority
        """,
    ),
    (
        # q99/q62: shipping-interval bucket grid per ship mode.
        "tpcds_q99_ship_bucket_grid",
        ["lineitem"],
        """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CASE WHEN month(l_shipdate) <= 3
                             THEN 1 ELSE 0 END) AS BIGINT) AS s_q1,
               CAST(sum(CASE WHEN month(l_shipdate) BETWEEN 4 AND 6
                             THEN 1 ELSE 0 END) AS BIGINT) AS s_q2,
               CAST(sum(CASE WHEN month(l_shipdate) BETWEEN 7 AND 9
                             THEN 1 ELSE 0 END) AS BIGINT) AS s_q3,
               CAST(sum(CASE WHEN month(l_shipdate) >= 10
                             THEN 1 ELSE 0 END) AS BIGINT) AS s_q4
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        """,
    ),
    (
        # q45: plain-IN on a dim attribute OR uncorrelated IN-subquery.
        "tpcds_q45_disjunctive_in",
        ["orders", "customer", "nation"],
        """
        SELECT n.n_name, round(sum(o.o_totalprice), 2) AS total
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE substr(c.c_name, length(c.c_name) - 1, 2) IN ('13', '31', '23')
           OR c.c_custkey IN (SELECT o2.o_custkey FROM orders o2
                              WHERE o2.o_totalprice > 400000)
        GROUP BY n.n_name
        """,
    ),
    (
        # q28: a bag of independent global aggregates over disjoint
        # bands, assembled as a union (six scans collapse to one under
        # column pruning; each band is a single-row aggregate).
        "tpcds_q28_band_agg_union",
        ["lineitem"],
        """
        SELECT band, n, avg_price, n_distinct FROM (
          SELECT 'b1' AS band, count(*) AS n,
                 round(avg(CAST(round(l_extendedprice * 1e2) AS BIGINT)) / 1e2, 2) AS avg_price,
                 count(DISTINCT l_partkey) AS n_distinct
          FROM lineitem WHERE l_quantity BETWEEN 1 AND 10
          UNION ALL
          SELECT 'b2', count(*), round(avg(CAST(round(l_extendedprice * 1e2) AS BIGINT)) / 1e2, 2),
                 count(DISTINCT l_partkey)
          FROM lineitem WHERE l_quantity BETWEEN 11 AND 20
          UNION ALL
          SELECT 'b3', count(*), round(avg(CAST(round(l_extendedprice * 1e2) AS BIGINT)) / 1e2, 2),
                 count(DISTINCT l_partkey)
          FROM lineitem WHERE l_quantity BETWEEN 21 AND 30
          UNION ALL
          SELECT 'b4', count(*), round(avg(CAST(round(l_extendedprice * 1e2) AS BIGINT)) / 1e2, 2),
                 count(DISTINCT l_partkey)
          FROM lineitem WHERE l_quantity BETWEEN 31 AND 40
        ) u
        """,
    ),
    (
        # q61: ratio of two single-row scalar aggregates (promo share)
        # — a 1x1 cross join of two aggregate subqueries.
        "tpcds_q61_promo_share_ratio",
        ["lineitem", "part"],
        """
        SELECT round(promo.s / 1e2, 2) AS promo_sales,
               round(total.s / 1e2, 2) AS total_sales,
               round(promo.s * 1e0 / total.s, 6) AS share
        FROM (SELECT sum(CAST(round(l.l_extendedprice * 1e2) AS BIGINT)) AS s
              FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
              WHERE p.p_type = 'PROMO') promo,
             (SELECT sum(CAST(round(l_extendedprice * 1e2) AS BIGINT)) AS s
              FROM lineitem) total
        """,
    ),
    (
        # q70: rank computed in a subquery drives membership of the
        # outer rollup (top-5 nations by revenue, then rollup inside).
        "tpcds_q70_rank_gated_rollup",
        ["lineitem", "orders", "customer", "nation"],
        """
        WITH nat_rev AS (
          SELECT n.n_name AS nation, n.n_nationkey AS nk,
                 sum(l.l_extendedprice) AS rev
          FROM lineitem l
          JOIN orders o   ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n   ON c.c_nationkey = n.n_nationkey
          GROUP BY n.n_name, n.n_nationkey),
        top5 AS (
          SELECT nk FROM (
            SELECT nk, rank() OVER (ORDER BY rev DESC, nk) AS rnk
            FROM nat_rev) r
          WHERE rnk <= 5)
        SELECT n.n_name, o.o_orderpriority,
               round(sum(l.l_extendedprice), 2) AS revenue
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE n.n_nationkey IN (SELECT nk FROM top5)
        GROUP BY ROLLUP(n.n_name, o.o_orderpriority)
        """,
    ),
    (
        # q76: channel union where each branch NULLs out the columns the
        # other channels lack, counted per (channel, year).
        "tpcds_q76_null_channel_union",
        ["orders", "lineitem"],
        """
        SELECT channel, yr, count(*) AS cnt, round(sum(amt), 2) AS amt
        FROM (
          SELECT 'ord' AS channel, year(o_orderdate) AS yr,
                 o_totalprice AS amt, o_orderpriority AS detail,
                 CAST(NULL AS STRING) AS flag
          FROM orders
          UNION ALL
          SELECT 'line', year(l_shipdate), l_extendedprice,
                 CAST(NULL AS STRING), l_returnflag
          FROM lineitem) u
        GROUP BY channel, yr
        """,
    ),
    (
        # q77: per-channel profit CTEs combined with FULL OUTER JOIN +
        # COALESCE into one keyed report (the tri-channel coalesce
        # chain family).
        "tpcds_q77_channel_profit_full_outer",
        ["lineitem", "orders"],
        """
        WITH a AS (SELECT year(o_orderdate) AS yr, sum(o_totalprice) AS t
                   FROM orders WHERE o_orderstatus = 'F' GROUP BY year(o_orderdate)),
             b AS (SELECT year(o_orderdate) AS yr, sum(o_totalprice) AS t
                   FROM orders WHERE o_orderstatus = 'O' GROUP BY year(o_orderdate)),
             c AS (SELECT year(l_shipdate) AS yr, sum(l_extendedprice) AS t
                   FROM lineitem WHERE l_returnflag = 'R' GROUP BY year(l_shipdate))
        SELECT coalesce(a.yr, b.yr, c.yr) AS yr,
               round(coalesce(a.t, 0), 2) AS t_f,
               round(coalesce(b.t, 0), 2) AS t_o,
               round(coalesce(c.t, 0), 2) AS t_r
        FROM a
        FULL OUTER JOIN b ON a.yr = b.yr
        FULL OUTER JOIN c ON coalesce(a.yr, b.yr) = c.yr
        """,
    ),
    (
        # q97: matched/unmatched counting via FULL OUTER on two keyed
        # aggregates (customers with orders only / lines only / both).
        "tpcds_q97_matched_unmatched",
        ["orders", "lineitem"],
        """
        WITH o AS (SELECT DISTINCT o_orderkey FROM orders
                   WHERE o_orderstatus = 'F'),
             l AS (SELECT DISTINCT l_orderkey FROM lineitem
                   WHERE l_returnflag = 'R')
        SELECT CAST(sum(CASE WHEN o.o_orderkey IS NOT NULL
                              AND l.l_orderkey IS NULL
                              THEN 1 ELSE 0 END) AS BIGINT) AS only_f,
               CAST(sum(CASE WHEN o.o_orderkey IS NULL
                              AND l.l_orderkey IS NOT NULL
                              THEN 1 ELSE 0 END) AS BIGINT) AS only_r,
               CAST(sum(CASE WHEN o.o_orderkey IS NOT NULL
                              AND l.l_orderkey IS NOT NULL
                              THEN 1 ELSE 0 END) AS BIGINT) AS bth
        FROM o FULL OUTER JOIN l ON o.o_orderkey = l.l_orderkey
        """,
    ),
    (
        # q46/q68: change-detection across consecutive facts per
        # customer — lag over a joined fact stream, keep change points.
        "tpcds_q46_lag_change_points",
        ["orders"],
        """
        WITH seq AS (
          SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
                 lag(o_orderpriority) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey) AS prev_prio
          FROM orders)
        SELECT o_custkey AS custkey, count(*) AS n_changes
        FROM seq
        WHERE prev_prio IS NOT NULL AND prev_prio <> o_orderpriority
        GROUP BY o_custkey
        HAVING count(*) >= 3
        """,
    ),
    (
        # q59: wide period pivot in a reused CTE, self-joined across
        # years, column-by-column ratio comparison.
        "tpcds_q59_period_pivot_compare",
        ["orders"],
        """
        WITH p AS (
          SELECT year(o_orderdate) AS yr,
                 sum(CAST(round(CASE WHEN month(o_orderdate) <= 4
                                THEN o_totalprice ELSE 0 END * 1e2)
                          AS BIGINT)) AS t1,
                 sum(CAST(round(CASE WHEN month(o_orderdate) BETWEEN 5 AND 8
                                THEN o_totalprice ELSE 0 END * 1e2)
                          AS BIGINT)) AS t2,
                 sum(CAST(round(CASE WHEN month(o_orderdate) >= 9
                                THEN o_totalprice ELSE 0 END * 1e2)
                          AS BIGINT)) AS t3
          FROM orders GROUP BY year(o_orderdate))
        SELECT a.yr AS yr_a,
               round(b.t1 * 1e0 / a.t1, 4) AS r1,
               round(b.t2 * 1e0 / a.t2, 4) AS r2,
               round(b.t3 * 1e0 / a.t3, 4) AS r3
        FROM p a JOIN p b ON a.yr + 1 = b.yr
        """,
    ),
    (
        # q43: bucket pivot — wide CASE sums per group key.
        "tpcds_q43_bucket_pivot",
        ["lineitem"],
        """
        SELECT l_returnflag,
               round(sum(CASE WHEN day(l_shipdate) <= 10
                              THEN l_extendedprice ELSE 0 END), 2) AS early,
               round(sum(CASE WHEN day(l_shipdate) BETWEEN 11 AND 20
                              THEN l_extendedprice ELSE 0 END), 2) AS mid,
               round(sum(CASE WHEN day(l_shipdate) >= 21
                              THEN l_extendedprice ELSE 0 END), 2) AS late
        FROM lineitem
        GROUP BY l_returnflag
        """,
    ),
    (
        # q89/q63: deviation from the group average via a window over
        # the aggregate output, band-filtered.
        "tpcds_q89_deviation_from_avg",
        ["lineitem", "part"],
        """
        WITH m AS (
          SELECT p.p_brand AS brand, month(l.l_shipdate) AS mon,
                 sum(CAST(round(l.l_extendedprice * 1e2) AS BIGINT)) AS rev_c
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          GROUP BY p.p_brand, month(l.l_shipdate))
        SELECT brand, mon, round(rev_c / 1e2, 2) AS rev,
               round(avg_c / 1e2, 2) AS avg_rev
        FROM (SELECT m.*, sum(rev_c) OVER (PARTITION BY brand) * 1e0
                          / count(*) OVER (PARTITION BY brand) AS avg_c
              FROM m) x
        WHERE abs(rev_c - avg_c) > 0.05 * avg_c
        """,
    ),
    (
        # q98/q89: revenue share within group via a window over the
        # aggregate output (partitioned — never a global window on rows).
        "tpcds_q98_revenue_share_window",
        ["lineitem", "part"],
        """
        WITH s AS (SELECT p.p_type AS ptype, p.p_brand AS brand,
                          sum(CAST(round(l.l_extendedprice * 1e2) AS BIGINT))
                            AS rev_c
                   FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
                   GROUP BY p.p_type, p.p_brand)
        SELECT ptype, brand, round(rev_c / 1e2, 2) AS rev,
               round(rev_c * 1e0 / sum(rev_c) OVER (PARTITION BY ptype), 4)
                 AS share
        FROM s
        """,
    ),
    (
        # q3: the canonical dim-filtered fact aggregate with rank-gated
        # output (ORDER BY + LIMIT replaced by rank for total order).
        "tpcds_q3_brand_year_topn",
        ["lineitem", "part"],
        """
        WITH agg AS (
          SELECT year(l.l_shipdate) AS yr, p.p_brand,
                 sum(l.l_extendedprice) AS rev
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          WHERE p.p_type = 'STANDARD'
          GROUP BY year(l.l_shipdate), p.p_brand)
        SELECT yr, p_brand, round(rev, 2) AS rev
        FROM (SELECT agg.*, rank() OVER (PARTITION BY yr
                     ORDER BY rev DESC, p_brand) AS rnk FROM agg) r
        WHERE rnk <= 5
        """,
    ),
    (
        # q7/q26: demographic average grid — one pass, several avgs.
        "tpcds_q7_avg_grid",
        ["lineitem", "orders", "customer"],
        """
        SELECT c.c_mktsegment,
               round(avg(l.l_quantity), 2) AS avg_qty,
               round(sum(CAST(round(l.l_extendedprice * 1e2) AS BIGINT)) / 1e2
                     / count(l.l_extendedprice), 2)
                 AS avg_price,
               round(sum(CAST(round(l.l_discount * 1e2) AS BIGINT)) / 1e2
                     / count(l.l_discount), 4) AS avg_disc
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        """,
    ),
    (
        # q8: name-suffix band (zip-prefix analog) semi-joined against
        # an aggregate-derived set.
        "tpcds_q8_suffix_band_semi",
        ["customer", "orders"],
        """
        WITH busy AS (SELECT o_custkey FROM orders
                      GROUP BY o_custkey HAVING count(*) >= 10)
        SELECT substr(c.c_name, length(c.c_name) - 0, 1) AS last_digit,
               count(*) AS cnt,
               round(sum(c.c_acctbal), 2) AS total_bal
        FROM customer c
        WHERE c.c_custkey IN (SELECT o_custkey FROM busy)
        GROUP BY substr(c.c_name, length(c.c_name) - 0, 1)
        """,
    ),
    (
        # q13: averages under an OR of demographic band conjunctions.
        "tpcds_q13_or_band_averages",
        ["orders", "customer"],
        """
        SELECT floor(sum(CAST(round(o.o_totalprice * 1e2) AS BIGINT)) * 1e0
                     / count(o.o_totalprice) + 0.5) / 1e2
                 AS avg_price,
               count(*) AS cnt
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE (c.c_mktsegment = 'BUILDING' AND o.o_totalprice < 100000)
           OR (c.c_mktsegment = 'MACHINERY'
               AND o.o_totalprice BETWEEN 100000 AND 250000)
           OR (c.c_mktsegment = 'HOUSEHOLD' AND o.o_totalprice > 250000)
        """,
    ),
    (
        # q15: per-nation totals restricted by a value OR membership
        # disjunction.
        "tpcds_q15_disjunctive_restriction",
        ["orders", "customer", "nation"],
        """
        SELECT n.n_name, round(sum(o.o_totalprice), 2) AS total
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal > 9000
           OR n.n_name IN ('FRANCE', 'GERMANY', 'CHINA')
        GROUP BY n.n_name
        """,
    ),
    (
        # q18: decimal-exact averages under a two-level ROLLUP.
        "tpcds_q18_rollup_decimal_avgs",
        ["lineitem", "orders", "customer", "nation"],
        """
        SELECT n.n_name, c.c_mktsegment,
               floor(sum(CAST(round(l.l_quantity) AS BIGINT)) * 1e2
                     / count(l.l_quantity) + 0.5) / 1e2 AS avg_qty,
               floor(sum(CAST(round(l.l_extendedprice * 1e2) AS BIGINT))
                     * 1e0 / count(l.l_extendedprice) + 0.5) / 1e2
                 AS avg_price
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY ROLLUP(n.n_name, c.c_mktsegment)
        """,
    ),
    (
        # q19: join with an OR of (brand, quantity-band) pairs across
        # the join boundary.
        "tpcds_q19_or_join_bands",
        ["lineitem", "part"],
        """
        SELECT round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                    * 10000) AS BIGINT)) / 1e4, 2)
                 AS revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 15)
           OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 25)
           OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 35)
        """,
    ),
    (
        # q22: inventory-style rollup of quantity-on-hand averages.
        "tpcds_q22_inventory_rollup",
        ["lineitem", "part", "supplier"],
        """
        SELECT p.p_brand, s.s_name,
               floor(sum(CAST(round(l.l_quantity) AS BIGINT)) * 1e2
                     / count(l.l_quantity) + 0.5) / 1e2 AS avg_qoh
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE p.p_size <= 10
        GROUP BY ROLLUP(p.p_brand, s.s_name)
        """,
    ),
    (
        # q42/q52/q55: the simple dim-grouped fact aggregate.
        "tpcds_q42_dim_group_agg",
        ["lineitem", "part"],
        """
        SELECT year(l.l_shipdate) AS yr, p.p_type,
               round(sum(l.l_extendedprice), 2) AS rev
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE year(l.l_shipdate) = 1995
        GROUP BY year(l.l_shipdate), p.p_type
        """,
    ),
    (
        # q50: latency buckets (order→ship gap in 30-day bands) per
        # period — the returns-latency grid.
        "tpcds_q50_latency_buckets",
        ["lineitem", "orders"],
        """
        WITH j AS (
          SELECT year(o.o_orderdate) AS yr,
                 CAST(l.l_shipdate AS DATE) AS ship,
                 CAST(o.o_orderdate AS DATE) AS ord
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        SELECT yr,
               CAST(sum(CASE WHEN ship <= ord + 30
                             THEN 1 ELSE 0 END) AS BIGINT) AS d30,
               CAST(sum(CASE WHEN ship > ord + 30 AND ship <= ord + 60
                             THEN 1 ELSE 0 END) AS BIGINT) AS d60,
               CAST(sum(CASE WHEN ship > ord + 60 AND ship <= ord + 90
                             THEN 1 ELSE 0 END) AS BIGINT) AS d90,
               CAST(sum(CASE WHEN ship > ord + 90
                             THEN 1 ELSE 0 END) AS BIGINT) AS d_more
        FROM j
        GROUP BY yr
        """,
    ),
    (
        # q71: per-period breakdown union re-aggregated by dim
        # (three sub-periods of the year unioned, grouped by brand).
        "tpcds_q71_period_breakdown_union",
        ["lineitem", "part"],
        """
        SELECT p_brand, period, round(sum(rev), 2) AS rev
        FROM (
          SELECT p.p_brand, 'h1' AS period, l.l_extendedprice AS rev
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          WHERE month(l.l_shipdate) <= 6
          UNION ALL
          SELECT p.p_brand, 'h2', l.l_extendedprice
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          WHERE month(l.l_shipdate) >= 7) u
        GROUP BY p_brand, period
        """,
    ),
    (
        # q74: year-over-year with MAX (not SUM) per customer, joined
        # across years with a growth-ratio gate on the pair.
        "tpcds_q74_yoy_max_ratio",
        ["orders"],
        """
        WITH y AS (SELECT o_custkey, year(o_orderdate) AS yr,
                          max(o_totalprice) AS m
                   FROM orders GROUP BY o_custkey, year(o_orderdate))
        SELECT a.o_custkey AS custkey,
               round(a.m, 2) AS max_a, round(b.m, 2) AS max_b
        FROM y a JOIN y b ON a.o_custkey = b.o_custkey AND a.yr + 1 = b.yr
        WHERE a.yr = 1995 AND b.m > a.m * 1.5
        """,
    ),
    (
        # q84: projection-shaped multi-dim lookup with string assembly
        # (customer || location chain), no aggregation.
        "tpcds_q84_concat_lookup",
        ["customer", "nation", "region"],
        """
        SELECT c.c_custkey AS custkey,
               c.c_name || ' : ' || n.n_name || ' / ' || r.r_name AS customer_loc
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE c.c_acctbal < 0
        """,
    ),
    (
        # q91: the narrow loss-funnel — multi-dim join chain collapsing
        # to a small two-dim grouped total of returned revenue.
        "tpcds_q91_two_dim_loss",
        ["lineitem", "orders", "customer", "nation"],
        """
        SELECT n.n_name, o.o_orderpriority,
               round(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                    * 10000) AS BIGINT)) / 1e4, 2) AS returned_loss
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R' AND c.c_acctbal < 1000
        GROUP BY n.n_name, o.o_orderpriority
        """,
    ),
    (
        # q26: demographic-filtered average grid (q7's catalog-channel
        # sibling — filter pushed through the dim side).
        "tpcds_q26_urgent_avg_grid",
        ["lineitem", "orders", "part"],
        """
        SELECT p.p_brand,
               round(sum(CAST(round(l.l_quantity) AS BIGINT)) * 1e0
                     / count(l.l_quantity), 2) AS avg_qty,
               round(sum(CAST(round(l.l_extendedprice * 1e2) AS BIGINT)) / 1e2
                     / count(l.l_extendedprice), 2)
                 AS avg_price,
               round(sum(CAST(round(l.l_discount * 1e2) AS BIGINT)) / 1e2
                     / count(l.l_discount), 4) AS avg_disc
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE o.o_orderpriority = '1-URGENT'
        GROUP BY p.p_brand
        """,
    ),
    (
        # q29/q40: before/after-pivot quantity comparison per key (the
        # catalog_sales-before / catalog_returns-after family).
        "tpcds_q40_before_after_pivot",
        ["lineitem", "part"],
        """
        SELECT p.p_brand,
               round(sum(CASE WHEN month(l.l_shipdate) <= 6
                              THEN l.l_quantity ELSE 0 END), 2) AS qty_before,
               round(sum(CASE WHEN month(l.l_shipdate) > 6
                              THEN l.l_quantity ELSE 0 END), 2) AS qty_after
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_retailprice BETWEEN 500 AND 1500
        GROUP BY p.p_brand
        """,
    ),
    (
        # q73/q79: order-size band — count lines per order, keep orders
        # in the band, list the buying segments (agg-then-join-then-agg).
        "tpcds_q73_order_size_band",
        ["lineitem", "orders", "customer"],
        """
        WITH per_order AS (
          SELECT l_orderkey, count(*) AS n_lines
          FROM lineitem GROUP BY l_orderkey
          HAVING count(*) BETWEEN 5 AND 7)
        SELECT c.c_mktsegment, count(*) AS n_orders,
               round(sum(CAST(round(o.o_totalprice * 1e2) AS BIGINT)) / 1e2
                     / count(o.o_totalprice), 2) AS avg_price
        FROM per_order po
        JOIN orders o ON po.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        """,
    ),
    (
        # q96: the bare multi-predicate count.
        "tpcds_q96_filtered_count",
        ["lineitem"],
        """
        SELECT count(*) AS cnt
        FROM lineitem
        WHERE l_quantity BETWEEN 10 AND 20
          AND l_discount BETWEEN 0.02 AND 0.08
          AND l_returnflag = 'N'
        """,
    ),
]


def _make(name: str, tables: list[str], sql: str) -> None:
    @register(name, oracle=sql)
    def q(spark: SparkSession, sf_dir: str, _tables=tables, _sql=sql) -> DataFrame:
        V(spark, sf_dir, *_tables)
        return spark.sql(_sql)

    q.__name__ = name
    q.__doc__ = (
        f"TPC-DS long-tail shape battery: dialect-shared SQL, see "
        f"_SHAPES['{name}']."
    )


for _name, _tables, _sql in _SHAPES:
    _make(_name, _tables, _sql)
