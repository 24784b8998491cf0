"""Lineage-aware ROUND-over-order-dependent-SUM guard (round 8).

The r6 verdict ordered a sweep of the ROUND(SUM(double)) class; the r7
textual `round(sum(` sweep converted direct sites but provably missed
sums routed through a CTE alias — `tpcds_q1_returns_above_avg` went
driver-red in round 7 (6 of its 453 output sums sit exactly on a
half-cent boundary, so Spark's partial-agg order flips cents vs
DuckDB), with q58/q14/q24 latent.  The r7 empirical net
(scripts/audit_order_sensitivity.py, DuckDB 1-thread vs 8-thread)
structurally cannot catch these: both DuckDB orderings can land on the
same side of the boundary while Spark lands on the other.

This is the static guard the verdict mandated: resolve every oracle's
ROUND argument through SELECT-list aliases and CTE columns, and flag
any round over an aggregate whose accumulation is order-dependent
(raw double SUM/AVG of 2-decimal money columns) when the true value
can sit exactly on a rounding boundary (summand digits > round scale,
or the value passes through a non-power-of-ten division / an AVG and
leaves every decimal grid).  Exact idioms pass: integer-units
`SUM(CAST(ROUND(x * 10^d) AS BIGINT))` and decimal-typed
`SUM(CAST(x AS DECIMAL(p,s)))` — both accumulate order-independently.
"""

from __future__ import annotations

from scripts.audit_round_lineage import find_offenders

# Pre-fix round-7 shapes (verbatim history): each went — or was latent
# to go — driver hash-red.  The analyzer must flag every one, or it
# has regressed below the class that burned round 7.
_KNOWN_BAD = {
    # tpcds_q1 as shipped in r7: CTE sums a 4-digit money product, the
    # outer query rounds the CTE column at scale 2 (driver-red in r7).
    "r7_tpcds_q1_cte_round": """
        WITH cust_returns AS (
          SELECT c.c_custkey AS custkey, c.c_nationkey AS nationkey,
                 sum(l.l_extendedprice * (1 - l.l_discount)) AS ret_amt
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE l.l_returnflag = 'R'
          GROUP BY c.c_custkey, c.c_nationkey)
        SELECT cr.custkey, round(cr.ret_amt, 2) AS ret_amt
        FROM cust_returns cr
        WHERE cr.ret_amt > (SELECT avg(cr2.ret_amt) * 1.2
                            FROM cust_returns cr2
                            WHERE cr2.nationkey = cr.nationkey)
    """,
    # the direct form the r6 sweep targeted (tpch_q9's original bug)
    "r6_direct_round_sum": """
        SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS amt
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    """,
    # ratio of raw double sums (r7 tpcds_q11 shape): off-grid, every
    # boundary reachable once the sums are order-dependent
    "r7_ratio_of_raw_sums": """
        WITH y95 AS (SELECT o_custkey, sum(o_totalprice) AS t
                     FROM orders WHERE year(o_orderdate) = 1995 GROUP BY o_custkey),
             y96 AS (SELECT o_custkey, sum(o_totalprice) AS t
                     FROM orders WHERE year(o_orderdate) = 1996 GROUP BY o_custkey)
        SELECT y95.o_custkey AS custkey, round(y96.t / y95.t, 4) AS ratio
        FROM y95 JOIN y96 ON y95.o_custkey = y96.o_custkey
    """,
    # avg over raw money (r7 tpcds_q35 shape): S/(100N) sits exactly on
    # a half-10^-n boundary whenever N divides 200k with odd quotient
    "r7_avg_of_money": """
        SELECT c_mktsegment, round(avg(c_acctbal), 4) AS bal_avg
        FROM customer GROUP BY c_mktsegment
    """,
}

# Safe idioms that must NOT be flagged (false-positive guards).
_KNOWN_GOOD = {
    # integer-units sum through a CTE alias (the round-8 fix shape)
    "units_sum_via_cte": """
        WITH cr AS (
          SELECT c_custkey AS k,
                 sum(CAST(round(l_extendedprice * (1 - l_discount) * 1e4)
                          AS BIGINT)) AS u
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          GROUP BY c_custkey)
        SELECT k, round(u / 1e4, 2) AS amt FROM cr
    """,
    # 2-digit money summed raw but rounded at its own grid: the true
    # value is ON the 10^-2 grid, never on a half-boundary
    "grid_safe_round": """
        SELECT o_orderpriority, round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY o_orderpriority
    """,
    # decimal-typed accumulation (tpcds_q64's idiom): exact in both
    # engines regardless of order
    "decimal_sum": """
        WITH s AS (
          SELECT p_brand, sum(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,6))) AS revenue
          FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand)
        SELECT p_brand, CAST(CAST(round(revenue, 2) AS DECIMAL(18,2)) AS DOUBLE)
               AS rev FROM s
    """,
    # integral-valued double column (l_quantity): exact double sums
    "integral_sum": """
        SELECT l_returnflag, round(sum(l_quantity), 2) AS qty
        FROM lineitem GROUP BY l_returnflag
    """,
    # avg over integer units: bigint accumulation is exact below 2^53
    "avg_of_units": """
        SELECT l_suppkey, round(avg(CAST(round(l_discount * 1e2) AS BIGINT))
                                / 1e2, 6) AS ad
        FROM lineitem GROUP BY l_suppkey
    """,
}


def test_analyzer_flags_known_bad_shapes():
    findings = find_offenders(_KNOWN_BAD)
    flagged = {name for name, _, _ in findings}
    missed = set(_KNOWN_BAD) - flagged
    assert not missed, (
        f"lineage analyzer regressed below the class that burned round 7 — "
        f"failed to flag: {sorted(missed)}"
    )


def test_analyzer_passes_known_good_shapes():
    findings = find_offenders(_KNOWN_GOOD)
    assert not findings, (
        f"lineage analyzer false-positives on proven-safe idioms: {findings}"
    )


def test_registry_has_no_order_sensitive_rounds():
    """Every registered oracle must be free of rounds over
    order-dependent money aggregates.  A hit here WILL go driver
    hash-red when rotated into the window — convert the sum site to
    the integer-units idiom (queries/_util.money_sum docstring)."""
    import flink_1_20_spark.queries  # noqa: F401 - registers everything
    from flink_1_20_spark.registry import get_oracles

    findings = find_offenders(get_oracles())
    assert not findings, (
        "order-sensitive ROUND sites (driver hash-red class, see "
        f"scripts/audit_round_lineage.py): {findings}"
    )


def test_analyzer_resolves_arbitrary_cte_nesting():
    """Property: the flag must survive ANY depth of alias indirection —
    the exact failure mode that slipped past round 7's textual sweep.
    Builds chains of k CTEs (k = 1..4), each forwarding the previous
    one's sum under a fresh alias, with the ROUND at the outermost
    level; every chain must flag, and the exact-idiom variant of the
    same chain must not."""
    for k in range(1, 5):
        ctes = []
        for i in range(k):
            if i == 0:
                ctes.append(
                    f"c0 AS (SELECT o_custkey AS k0, "
                    f"sum(o_totalprice * (1 - l_discount)) AS v0 "
                    f"FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
                    f"GROUP BY o_custkey)"
                )
            else:
                ctes.append(
                    f"c{i} AS (SELECT k{i-1} AS k{i}, v{i-1} AS v{i} FROM c{i-1})"
                )
        bad = (
            "WITH " + ", ".join(ctes)
            + f" SELECT k{k-1}, round(v{k-1}, 2) AS amt FROM c{k-1}"
        )
        found = find_offenders({f"chain_{k}": bad})
        assert found, f"lineage chain of depth {k} not flagged"
        exact = bad.replace(
            "sum(o_totalprice * (1 - l_discount))",
            "sum(CAST(round(o_totalprice * (1 - l_discount) * 1e4) AS BIGINT))",
        ).replace(f"round(v{k-1}, 2)", f"round(v{k-1} / 1e4, 2)")
        assert not find_offenders({f"exact_{k}": exact}), (
            f"exact-idiom chain of depth {k} false-positived"
        )
