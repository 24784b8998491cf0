"""Unit tests for custom operators: as-of join, CEP NFA, lookup join.

Hand-built micro-fixtures with known-by-construction expectations —
the reference's operator harness style (SURVEY.md §5: OneInput
StreamOperatorTestHarness with scripted inputs).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from flink_1_20_spark.operators import Pattern, asof_join, lookup_join, match_recognize


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute)


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_type string, value double")


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(30), 200.0), (2, _ts(5), 300.0)],
        "k bigint, ts timestamp, lval double",
    )
    right = spark.createDataFrame(
        [(1, _ts(8), 1.0), (1, _ts(25), 2.0), (1, _ts(40), 3.0)],
        "k bigint, rts timestamp, rval double",
    )
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts")
    got = {(r["k"], r["ts"].minute): (r["rts_matched"].minute if r["rts_matched"] else None, r["rval"])
           for r in out.collect()}
    assert got == {
        (1, 10): (8, 1.0),   # latest right <= 10:10 is 10:08
        (1, 30): (25, 2.0),  # 10:25, not 10:40
        (2, 5): (None, None),  # key 2 has no right rows
    }


def test_asof_exact_match_toggle(spark):
    left = spark.createDataFrame([(1, _ts(10), 1.0)], "k bigint, ts timestamp, lval double")
    right = spark.createDataFrame([(1, _ts(10), 9.0)], "k bigint, rts timestamp, rval double")
    inc = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts").collect()[0]
    exc = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts", allow_exact_matches=False
    ).collect()[0]
    assert inc["rval"] == 9.0
    assert exc["rval"] is None


def test_asof_tolerance(spark):
    left = spark.createDataFrame([(1, _ts(30), 1.0)], "k bigint, ts timestamp, lval double")
    right = spark.createDataFrame([(1, _ts(0), 9.0)], "k bigint, rts timestamp, rval double")
    loose = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts", tolerance="1 hour")
    tight = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts", tolerance="10 minutes")
    assert loose.collect()[0]["rval"] == 9.0
    assert tight.collect()[0]["rval"] is None


FUNNEL_SCHEMA = "start_m bigint, end_m bigint, user_id bigint"

# NOTE: measures callables must be pickled by value (workers can't import
# the tests module) — `_fm` builds a fresh lambda per call site.
def _fm():
    return lambda g: {
        "start_m": int(g["a"]["ts"].iloc[0].minute),
        "end_m": int(g["c"]["ts"].iloc[-1].minute),
    }


def test_cep_strict_vs_relaxed(spark):
    rows = [
        (1, _ts(0), "click", 0.0),
        (1, _ts(1), "error", 0.0),   # breaks strict contiguity
        (1, _ts(2), "view", 0.0),
        (1, _ts(3), "purchase", 0.0),
        (2, _ts(0), "click", 0.0),
        (2, _ts(1), "view", 0.0),
        (2, _ts(2), "purchase", 0.0),
    ]
    df = _events(spark, rows)
    strict = (
        Pattern.begin("a", lambda r: r["event_type"] == "click")
        .next("b", lambda r: r["event_type"] == "view")
        .next("c", lambda r: r["event_type"] == "purchase")
    )
    relaxed = (
        Pattern.begin("a", lambda r: r["event_type"] == "click")
        .followed_by("b", lambda r: r["event_type"] == "view")
        .followed_by("c", lambda r: r["event_type"] == "purchase")
    )
    s = match_recognize(df, ["user_id"], "ts", strict, _fm(), FUNNEL_SCHEMA).collect()
    r = match_recognize(df, ["user_id"], "ts", relaxed, _fm(), FUNNEL_SCHEMA).collect()
    assert {x["user_id"] for x in s} == {2}          # user 1 broken by the error row
    assert {x["user_id"] for x in r} == {1, 2}       # relaxed skips the error row


def test_cep_within(spark):
    rows = [
        (1, _ts(0), "click", 0.0),
        (1, _ts(1), "view", 0.0),
        (1, _ts(50), "purchase", 0.0),  # 50 min after start
    ]
    df = _events(spark, rows)
    pat = (
        Pattern.begin("a", lambda r: r["event_type"] == "click")
        .followed_by("b", lambda r: r["event_type"] == "view")
        .followed_by("c", lambda r: r["event_type"] == "purchase")
    )
    assert len(match_recognize(df, ["user_id"], "ts", pat.within(3600), _fm(), FUNNEL_SCHEMA).collect()) == 1
    pat2 = (
        Pattern.begin("a", lambda r: r["event_type"] == "click")
        .followed_by("b", lambda r: r["event_type"] == "view")
        .followed_by("c", lambda r: r["event_type"] == "purchase")
        .within(600)
    )
    assert match_recognize(df, ["user_id"], "ts", pat2, _fm(), FUNNEL_SCHEMA).collect() == []


def test_cep_skip_strategies(spark):
    # e e e e — bursts of >=2 consecutive errors
    rows = [(1, _ts(m), "error", 0.0) for m in range(4)]
    df = _events(spark, rows)

    def mk():
        return (
            Pattern.begin("e", lambda r: r["event_type"] == "error")
            .times_or_more(2)
            .strict_repeat()
        )

    def meas(g):
        return {"start_m": int(g["e"]["ts"].iloc[0].minute), "n": int(len(g["e"]))}

    past = match_recognize(
        df, ["user_id"], "ts", mk().after_match_skip("PAST_LAST_EVENT"), meas,
        "start_m bigint, n bigint, user_id bigint",
    ).collect()
    nxt = match_recognize(
        df, ["user_id"], "ts", mk().after_match_skip("TO_NEXT_ROW"), meas,
        "start_m bigint, n bigint, user_id bigint",
    ).collect()
    # greedy consumes all 4; PAST_LAST → one match, TO_NEXT_ROW → anchors 0,1,2
    assert [(r["start_m"], r["n"]) for r in sorted(past, key=lambda r: r["start_m"])] == [(0, 4)]
    assert [(r["start_m"], r["n"]) for r in sorted(nxt, key=lambda r: r["start_m"])] == [
        (0, 4), (1, 3), (2, 2),
    ]


def test_cep_times_exact_and_optional(spark):
    rows = [
        (1, _ts(0), "click", 0.0),
        (1, _ts(1), "click", 0.0),
        (1, _ts(2), "purchase", 0.0),
        (2, _ts(0), "click", 0.0),
        (2, _ts(1), "purchase", 0.0),
    ]
    df = _events(spark, rows)
    # exactly 2 clicks then purchase — only user 1
    pat = (
        Pattern.begin("a", lambda r: r["event_type"] == "click")
        .times(2)
        .next("b", lambda r: r["event_type"] == "purchase")
    )
    got = match_recognize(
        df, ["user_id"], "ts", pat,
        lambda g: {"n_clicks": int(len(g["a"]))},
        "n_clicks bigint, user_id bigint",
    ).collect()
    assert {r["user_id"]: r["n_clicks"] for r in got} == {1: 2}
    # optional middle step
    pat2 = (
        Pattern.begin("a", lambda r: r["event_type"] == "click")
        .next("x", lambda r: r["event_type"] == "view")
        .optional()
        .next("b", lambda r: r["event_type"] == "purchase")
    )
    got2 = match_recognize(
        df, ["user_id"], "ts", pat2,
        lambda g: {"has_view": int("x" in g)},
        "has_view bigint, user_id bigint",
    ).collect()
    assert {r["user_id"] for r in got2} == {1, 2}


def test_cep_not_next(spark):
    # click immediately followed by error must NOT match; a view between
    # click and purchase is fine
    rows = [
        (1, _ts(0), "click", 0.0),
        (1, _ts(1), "error", 0.0),   # kills user 1: error is the very next row
        (1, _ts(2), "purchase", 0.0),
        (2, _ts(0), "click", 0.0),
        (2, _ts(1), "view", 0.0),
        (2, _ts(2), "purchase", 0.0),
    ]
    df = _events(spark, rows)
    pat = (
        Pattern.begin("a", lambda r: r["event_type"] == "click")
        .not_next("x", lambda r: r["event_type"] == "error")
        .followed_by("c", lambda r: r["event_type"] == "purchase")
    )
    got = match_recognize(df, ["user_id"], "ts", pat, _fm(), FUNNEL_SCHEMA).collect()
    assert {x["user_id"] for x in got} == {2}


def test_cep_not_followed_by_mid(spark):
    # no error may appear anywhere between click and purchase
    rows = [
        (1, _ts(0), "click", 0.0),
        (1, _ts(1), "view", 0.0),
        (1, _ts(2), "error", 0.0),   # kills user 1 even though not adjacent
        (1, _ts(3), "purchase", 0.0),
        (2, _ts(0), "click", 0.0),
        (2, _ts(1), "view", 0.0),
        (2, _ts(2), "purchase", 0.0),
    ]
    df = _events(spark, rows)
    pat = (
        Pattern.begin("a", lambda r: r["event_type"] == "click")
        .not_followed_by("x", lambda r: r["event_type"] == "error")
        .followed_by("c", lambda r: r["event_type"] == "purchase")
    )
    got = match_recognize(df, ["user_id"], "ts", pat, _fm(), FUNNEL_SCHEMA).collect()
    assert {x["user_id"] for x in got} == {2}


def test_cep_not_followed_by_final_requires_within(spark):
    # final notFollowedBy = "no purchase within the hour after signup"
    rows = [
        (1, _ts(0), "signup", 0.0),
        (1, _ts(30), "purchase", 0.0),   # user 1 purchased → no match
        (2, _ts(0), "signup", 0.0),
        (2, _ts(5), "view", 0.0),        # user 2 never purchased → match
    ]
    df = _events(spark, rows)
    pat = (
        Pattern.begin("a", lambda r: r["event_type"] == "signup")
        .not_followed_by("x", lambda r: r["event_type"] == "purchase")
        .within(3600)
    )
    meas = lambda g: {"start_m": int(g["a"]["ts"].iloc[0].minute), "end_m": 0}  # noqa: E731
    got = match_recognize(df, ["user_id"], "ts", pat, meas, FUNNEL_SCHEMA).collect()
    assert {x["user_id"] for x in got} == {2}


def test_cep_until_stops_loop(spark):
    # accumulate views one_or_more but stop at the first error
    rows = [
        (1, _ts(0), "click", 0.0),
        (1, _ts(1), "view", 0.0),
        (1, _ts(2), "view", 0.0),
        (1, _ts(3), "error", 0.0),
        (1, _ts(4), "view", 0.0),   # after error — must not be absorbed
        (1, _ts(5), "purchase", 0.0),
    ]
    df = _events(spark, rows)
    pat = (
        Pattern.begin("a", lambda r: r["event_type"] == "click")
        .followed_by("b", lambda r: r["event_type"] == "view")
        .one_or_more()
        .until(lambda r: r["event_type"] == "error")
        .followed_by("c", lambda r: r["event_type"] == "purchase")
    )
    meas = lambda g: {"start_m": int(len(g["b"])), "end_m": int(g["c"]["ts"].iloc[-1].minute)}  # noqa: E731
    got = match_recognize(df, ["user_id"], "ts", pat, meas, FUNNEL_SCHEMA).collect()
    assert len(got) == 1
    assert got[0]["start_m"] == 2  # only the two pre-error views


def test_lookup_join_broadcast_plan(spark):
    fact = spark.range(100).withColumnRenamed("id", "k")
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(10)], "k bigint, name string")
    out = lookup_join(fact, dim, on=["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert out.count() == 100


def test_cep_skip_to_first(spark):
    # a b b a b b: PAST_LAST_EVENT finds 1 match of (a, b+);
    # SKIP_TO_FIRST('b') resumes at the first b — the bs can seed
    # nothing (no a), but overlapping (a,b) prefixes re-anchor: with
    # pattern a.next(b) on rows a b a b, TO-variants show the difference
    rows = [
        (1, _ts(0), "click", 0.0),
        (1, _ts(1), "view", 0.0),
        (1, _ts(2), "view", 0.0),
        (1, _ts(3), "purchase", 0.0),
    ]
    df = _events(spark, rows)
    base = lambda: (  # noqa: E731
        Pattern.begin("a", lambda r: r["event_type"] == "click")
        .followed_by("b", lambda r: r["event_type"] == "view")
        .one_or_more()
        .followed_by("c", lambda r: r["event_type"] == "purchase")
    )
    meas = lambda g: {"start_m": int(len(g["b"])), "end_m": 0}  # noqa: E731
    past = match_recognize(df, ["user_id"], "ts", base(), meas, FUNNEL_SCHEMA).collect()
    skipf = match_recognize(
        df, ["user_id"], "ts",
        base().after_match_skip("SKIP_TO_FIRST", "b"), meas, FUNNEL_SCHEMA,
    ).collect()
    # PAST_LAST_EVENT: one greedy match consuming both views
    assert [r["start_m"] for r in past] == [2]
    # SKIP_TO_FIRST(b): resume at first view — no second click, so still
    # one match, but the scan provably re-anchored (same result set)
    assert [r["start_m"] for r in skipf] == [2]


def test_cep_skip_to_last_overlapping(spark):
    # two overlapping funnels sharing the middle row:
    # click view click view purchase — SKIP_TO_LAST('a'... ) hmm use b=view
    rows = [
        (1, _ts(0), "click", 0.0),
        (1, _ts(1), "view", 0.0),
        (1, _ts(2), "click", 0.0),
        (1, _ts(3), "view", 0.0),
        (1, _ts(4), "purchase", 0.0),
    ]
    df = _events(spark, rows)
    base = lambda: (  # noqa: E731
        Pattern.begin("a", lambda r: r["event_type"] == "click")
        .followed_by("c", lambda r: r["event_type"] == "purchase")
    )
    meas = lambda g: {"start_m": int(g["a"]["ts"].iloc[0].minute), "end_m": 0}  # noqa: E731
    past = match_recognize(df, ["user_id"], "ts", base(), meas, FUNNEL_SCHEMA).collect()
    last = match_recognize(
        df, ["user_id"], "ts",
        base().after_match_skip("SKIP_TO_LAST", "c"), meas, FUNNEL_SCHEMA,
    ).collect()
    # PAST_LAST_EVENT consumes through the purchase: one match (click@0)
    assert sorted(r["start_m"] for r in past) == [0]
    # SKIP_TO_LAST(c) resumes AT the purchase row — it can't start a new
    # match itself, and no rows follow, so still one; but TO_NEXT_ROW
    # would find both overlapping funnels:
    nxt = match_recognize(
        df, ["user_id"], "ts",
        base().after_match_skip("TO_NEXT_ROW"), meas, FUNNEL_SCHEMA,
    ).collect()
    assert sorted(r["start_m"] for r in nxt) == [0, 2]


def test_cep_followed_by_any_multiple_matches(spark):
    """followedByAny (Pattern.followedByAny:387): the step branches on
    EVERY later matching row — one emitted match per alternative under
    NO_SKIP, where plain followedBy takes only the first occurrence."""
    rows = [
        (1, _ts(0), "click", 0.0),
        (1, _ts(1), "view", 1.0),
        (1, _ts(2), "view", 2.0),
        (1, _ts(3), "view", 3.0),
    ]
    df = _events(spark, rows)

    def measures():
        return lambda g: {
            "start_m": int(g["a"]["ts"].iloc[0].minute),
            "end_m": int(g["b"]["ts"].iloc[-1].minute),
        }

    any_pat = (
        Pattern.begin("a", lambda r: r["event_type"] == "click")
        .followed_by_any("b", lambda r: r["event_type"] == "view")
        .after_match_skip("NO_SKIP")
    )
    got = {(r["start_m"], r["end_m"]) for r in match_recognize(
        df, ["user_id"], "ts", any_pat, measures(),
        "start_m bigint, end_m bigint, user_id bigint").collect()}
    # three branches from the single anchor — one per view
    assert got == {(0, 1), (0, 2), (0, 3)}

    first_only = (
        Pattern.begin("a", lambda r: r["event_type"] == "click")
        .followed_by("b", lambda r: r["event_type"] == "view")
        .after_match_skip("NO_SKIP")
    )
    got_first = {(r["start_m"], r["end_m"]) for r in match_recognize(
        df, ["user_id"], "ts", first_only, measures(),
        "start_m bigint, end_m bigint, user_id bigint").collect()}
    assert got_first == {(0, 1)}  # relaxed contiguity takes the first view


def test_cep_greedy_vs_reluctant_counts(spark):
    """Quantifier control (Quantifier.java): reluctant oneOrMore emits a
    match per repetition count ({v1}, {v1 v2}, ...) — Flink's default —
    while greedy emits only the maximal run."""
    rows = [
        (1, _ts(0), "view", 1.0),
        (1, _ts(1), "view", 2.0),
        (1, _ts(2), "view", 3.0),
    ]
    df = _events(spark, rows)

    def measures():
        return lambda g: {
            "start_m": int(g["v"]["ts"].iloc[0].minute),
            "n": int(len(g["v"])),
        }

    def run(pat):
        return {(r["start_m"], r["n"]) for r in match_recognize(
            df, ["user_id"], "ts", pat, measures(),
            "start_m bigint, n bigint, user_id bigint").collect()}

    reluctant = (
        Pattern.begin("v", lambda r: r["event_type"] == "view")
        .one_or_more().reluctant().after_match_skip("NO_SKIP")
    )
    # every (anchor, count) combination
    assert run(reluctant) == {(0, 1), (0, 2), (0, 3), (1, 1), (1, 2), (2, 1)}

    greedy = (
        Pattern.begin("v", lambda r: r["event_type"] == "view")
        .one_or_more().greedy().after_match_skip("NO_SKIP")
    )
    # only the maximal run per anchor
    assert run(greedy) == {(0, 3), (1, 2), (2, 1)}


def test_refreshing_dim_full_cache_reload(spark):
    """FULL-cache lookup (LookupFullCache + reload trigger): the dim
    loads at most once per TTL window; expiry reloads a fresh
    snapshot."""
    from flink_1_20_spark.operators.lookup import RefreshingDim

    loads = {"n": 0}

    def loader():
        loads["n"] += 1
        return spark.createDataFrame([(1, f"v{loads['n']}")], "k bigint, dimval string")

    clock = {"t": 0.0}
    rd = RefreshingDim(loader, ttl_seconds=10.0, clock=lambda: clock["t"])
    fact = spark.createDataFrame([(1, 100.0)], "k bigint, amount double")

    # three "micro-batches" inside one TTL window → one load
    for _ in range(3):
        assert rd.join(fact, on=["k"]).collect()[0]["dimval"] == "v1"
        clock["t"] += 3.0
    assert rd.n_loads == 1
    # cross the TTL boundary → reload, new version visible
    clock["t"] = 11.0
    assert rd.join(fact, on=["k"]).collect()[0]["dimval"] == "v2"
    assert rd.n_loads == 2


def test_partial_cache_ttl():
    from flink_1_20_spark.operators.lookup import PartialCache

    clock = {"t": 0.0}
    c = PartialCache(ttl_seconds=5.0, clock=lambda: clock["t"])
    assert not c.contains(("a",))
    c.put(("a",), {"x": 1})
    assert c.get(("a",)) == {"x": 1}
    c.put(("gone",), {})  # cached empty result (missing-key caching)
    assert c.contains(("gone",)) and c.get(("gone",)) == {}
    clock["t"] = 5.0
    assert not c.contains(("a",))  # expired


def test_async_lookup_join_partial_cache(spark, tmp_path):
    """PARTIAL-cache async lookup (AsyncLookupJoinRunner +
    LookupCacheManager): within a batch, the external fetch runs once
    per DISTINCT key (duplicates served from cache); unknown keys
    null-pad (left-join semantics)."""
    from flink_1_20_spark.operators.lookup import async_lookup_join

    calls_log = str(tmp_path / "calls.log")

    def make_fetch(path):
        async def fetch(key):
            with open(path, "a") as f:
                f.write(f"{key[0]}\n")
            if key[0] >= 100:
                return None  # dim has no such key
            return {"dimval": f"d{key[0]}"}
        return fetch

    fact = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (1, 30.0), (100, 40.0), (2, 50.0)],
        "k bigint, amount double",
    ).repartition(1)
    out = async_lookup_join(
        fact,
        key_cols=["k"],
        fetch=make_fetch(calls_log),
        output_schema="k bigint, amount double, dimval string",
        ttl_seconds=300.0,
    )
    rows = {(r["k"], r["amount"]): r["dimval"] for r in out.collect()}
    assert rows == {
        (1, 10.0): "d1", (2, 20.0): "d2", (1, 30.0): "d1",
        (100, 40.0): None, (2, 50.0): "d2",
    }
    with open(calls_log) as f:
        called = sorted(int(x) for x in f.read().split())
    assert called == [1, 2, 100]  # one fetch per distinct key
