"""Pinned-seed run of the dialect fuzz harness (scripts/dialect_fuzz.py):
grammar-generated SQL through executeSql→Spark AND DuckDB, value-compared
— the property-test upgrade of the per-query oracle discipline (VERDICT
r9 task 2).  The reference's randomized ITCase batteries are the
precedent (SURVEY.md §5).

Seeds 1,2,3,7,11,13,42,99,123,777 × n=80 were swept green at build
time, and 1,2,3,7,11,42,99,123,555,777 × n=60 again after the r10
grammar growth (18 shapes: +HAVING-hidden-agg, correlated scalar
subquery, derived-table union, NULLS FIRST/LAST ordering, lead/lag,
interval+JSON, HOP/CUMULATE/SESSION TVFs, chained/commented CTEs,
regexp-replace g-flag + TRUNCATE builtin pairs).  The r11 growth took
the grammar to 22 shapes (+UNNEST/lateral over inline ARRAY, LISTAGG/
JSON_OBJECTAGG via order-invariant CHAR_LENGTH projections, FOR
SYSTEM_TIME AS OF vs DuckDB's native ASOF JOIN over the deduped
orders_v snapshot, fixed-length MATCH_RECOGNIZE vs a triple-lag
oracle) and re-swept green: seed 555 × n=40 then fresh seeds
7001-7020 × n=60 (1200/1200).  The r11 second-half growth took it to
26 shapes (+ANSI FILTER(WHERE) aggregates, FULL/RIGHT outer join over
independently filtered derived sides, multi-DISTINCT aggregate mixes,
TIMESTAMPDIFF vs an epoch-floor oracle — DuckDB's date_diff counts
boundary CROSSINGS while TIMESTAMPDIFF counts complete units, so
date_diff would be a wrong oracle), swept green on seeds
4242/777/888/999.  The r11 session-boundary fix (exact-gap
events MERGE — see tests/test_streaming_differential.py) flipped the
session_tvf oracle in the same commit as the lowering, keeping the
battery consistent.  r11's close grew the grammar to 30 shapes
(nested set ops, nested CASE, HAVING-vs-scalar-subquery, IN-over-join)
and r12 to 33 (variable-length MATCH_RECOGNIZE `B+`/`B+?` vs a
run-length oracle — which caught the batch NFA resolving reluctant
quantifiers greedily under single-match skips; OVER RANGE INTERVAL
frames; correlated EXISTS over set ops), soaked 10 fresh seeds × 40.
The r12 second half added bounded-quantifier MATCH_RECOGNIZE
(`A B{m,n} C` greedy/reluctant vs the k-ranged run-length oracle) and
UNNEST WITH ORDINALITY (vs DuckDB's zipped unnest +
generate_subscripts), taking the grammar to 35 shapes — swept green on
seeds 424242/7001/7002/7003 (shape-only batteries) and fresh seeds
8101-8105 × n=40 over the full grammar (200/200).  The pinned seed
here is the CLI default so a future regression reproduces with a bare
`python scripts/dialect_fuzz.py`.

Soak history (what the harness itself caught, beyond the grouping-sets
engine divergence): a 30-seed soak found the fixture's lineitem
(l_orderkey, l_linenumber) key is NOT unique (lead/lag flapped on the
ties — generator keys now use the full column list; FIXTURES.md
documents the caveat), and a later 20-seed soak found the generator
rounding a 4-decimal money product to 2 digits (the half-grid
cross-engine flip the registry's money() rule bans — now rounds
on-grid).  Both were HARNESS bugs; no engine defect has survived any
soak.
"""

from __future__ import annotations

import os


def test_dialect_fuzz_pinned_seed(spark, sf_dir):
    from scripts.dialect_fuzz import run_battery

    # gate mode sweeps 40 pinned cases (every historical find here
    # reproduced within the first 40 of its seed); SPARK_GRAFT_SOAK=1
    # restores the 120-case battery (r14 suite-throughput cut)
    n = 120 if os.environ.get("SPARK_GRAFT_SOAK") == "1" else 40
    fails = run_battery(seed=20260815, n=n, sf_dir=sf_dir, spark=spark)
    assert not fails, "\n".join(
        f"{name}: {msg}\n  spark: {s}\n  duck: {d}" for name, s, d, msg in fails[:5]
    )


def test_grouping_sets_empty_input_matches_reference(spark, sf_dir):
    """The harness's first find (r10, seed 20260815): over an EMPTY
    input, ANSI (and DuckDB) emit the grand-total grouping-set row, but
    the REFERENCE does not — Flink lowers grouping sets through
    DecomposeGroupingSetsRule (flink-table-planner .../logical/
    DecomposeGroupingSetsRule.scala:159) into Expand + one aggregate
    over (keys, $e), and Expand over zero rows yields zero groups.
    Spark's Expand lowering behaves identically, so the engine is
    reference-correct BY CONSTRUCTION; this test pins the behavior so a
    future Spark upgrade that silently goes ANSI gets noticed (the fuzz
    generator's DuckDB equalizer would then hide the flip).  A plain
    global aggregate still emits its standard one row."""
    from flink_1_20_spark.catalog import register_views
    from flink_1_20_spark.sql_ddl import TableEnvironment

    register_views(spark, sf_dir)
    env = TableEnvironment(spark)
    rollup = env.execute_sql(
        "SELECT o_orderstatus AS g, count(*) AS cnt FROM orders "
        "WHERE o_orderkey < 0 GROUP BY ROLLUP(o_orderstatus)"
    )
    assert rollup.collect() == []
    sets = env.execute_sql(
        "SELECT o_orderstatus AS g, count(*) AS cnt FROM orders "
        "WHERE o_orderkey < 0 GROUP BY GROUPING SETS ((o_orderstatus), ())"
    )
    assert sets.collect() == []
    # the non-grouping-sets global aggregate keeps its ANSI one-row form
    plain = env.execute_sql(
        "SELECT count(*) AS cnt FROM orders WHERE o_orderkey < 0"
    ).collect()
    assert [r.cnt for r in plain] == [0]
