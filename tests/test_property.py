"""Property-based tests (hypothesis): NFA invariants in pure Python and
the distributed as-of join against a brute-force reference.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import given, settings, strategies as st

from flink_1_20_spark.operators.cep import Pattern, _match_at, _precompute

EVENTS = ["a", "b", "c"]


def _frame(seq: list[str]) -> pd.DataFrame:
    base = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {"event_type": seq, "ts": [base + dt.timedelta(minutes=i) for i in range(len(seq))]}
    )
    pdf["__ts"] = pdf["ts"]
    return pdf


def _scan(pat: Pattern, pdf: pd.DataFrame) -> list[list[tuple[str, int]]]:
    pre = _precompute(pat, pdf)
    out, i = [], 0
    while i < len(pdf):
        m = _match_at(pat, pdf, i, pre)
        if m:
            out.append(m)
            last = max(idx for _, idx in m)
            i = last + 1 if pat.skip == "PAST_LAST_EVENT" else i + 1
        else:
            i += 1
    return out


@settings(max_examples=60, deadline=None)
@given(st.lists(st.sampled_from(EVENTS), min_size=0, max_size=24))
def test_cep_strict_pair_equals_bruteforce(seq):
    """a NEXT b with TO_NEXT_ROW skip == the set of adjacent (a, b) pairs."""
    pat = (
        Pattern.begin("x", lambda r: r["event_type"] == "a")
        .next("y", lambda r: r["event_type"] == "b")
        .after_match_skip("TO_NEXT_ROW")
    )
    got = {tuple(idx for _, idx in m) for m in _scan(pat, _frame(seq))}
    expected = {(i, i + 1) for i in range(len(seq) - 1) if seq[i] == "a" and seq[i + 1] == "b"}
    assert got == expected


@settings(max_examples=60, deadline=None)
@given(st.lists(st.sampled_from(EVENTS), min_size=0, max_size=24))
def test_cep_match_invariants(seq):
    """Relaxed a...b...c matches: predicates hold, indices increase, and
    PAST_LAST_EVENT matches never overlap."""
    pat = (
        Pattern.begin("x", lambda r: r["event_type"] == "a")
        .followed_by("y", lambda r: r["event_type"] == "b")
        .followed_by("z", lambda r: r["event_type"] == "c")
    )
    matches = _scan(pat, _frame(seq))
    prev_end = -1
    for m in matches:
        idxs = [idx for _, idx in m]
        assert idxs == sorted(idxs)
        assert [seq[i] for i in idxs] == ["a", "b", "c"]
        assert idxs[0] > prev_end  # non-overlap under PAST_LAST_EVENT
        prev_end = idxs[-1]
    # completeness: if any a precedes a b that precedes a c, ≥1 match
    has = any(
        seq[i] == "a" and seq[j] == "b" and seq[k] == "c"
        for i in range(len(seq)) for j in range(i + 1, len(seq)) for k in range(j + 1, len(seq))
    )
    assert bool(matches) == has


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.sampled_from(EVENTS), min_size=1, max_size=24),
    st.integers(min_value=1, max_value=4),
)
def test_cep_times_or_more_greedy(seq, k):
    """a{k,} strict: every match is a maximal run of 'a' of length >= k."""
    pat = (
        Pattern.begin("x", lambda r: r["event_type"] == "a")
        .times_or_more(k)
        .strict_repeat()
    )
    matches = _scan(pat, _frame(seq))
    # brute-force maximal runs
    runs, i = [], 0
    while i < len(seq):
        if seq[i] == "a":
            j = i
            while j < len(seq) and seq[j] == "a":
                j += 1
            if j - i >= k:
                runs.append((i, j - 1))
            i = j
        else:
            i += 1
    got = [(min(i for _, i in m), max(i for _, i in m)) for m in matches]
    assert got == runs


def test_asof_join_matches_bruteforce(spark):
    """Distributed as-of join == per-row brute-force on a random-ish
    fixed seed dataset (multiple keys, duplicate/boundary timestamps)."""
    import random

    from flink_1_20_spark.operators.asof import asof_join

    rnd = random.Random(42)
    base = dt.datetime(2024, 1, 1)
    left = [
        (k, base + dt.timedelta(minutes=rnd.randint(0, 120)), float(i))
        for i, k in enumerate(rnd.choices([1, 2, 3], k=40))
    ]
    right = [
        (k, base + dt.timedelta(minutes=rnd.randint(0, 120)), float(100 + i))
        for i, k in enumerate(rnd.choices([1, 2, 3, 4], k=40))
    ]
    ldf = spark.createDataFrame(left, "k bigint, ts timestamp, lval double")
    rdf = spark.createDataFrame(right, "k bigint, rts timestamp, rval double")
    out = asof_join(ldf, rdf, on=["k"], left_ts="ts", right_ts="rts")

    def expected(k, ts):
        cand = [(rts, rv) for (rk, rts, rv) in right if rk == k and rts <= ts]
        if not cand:
            return None
        best_rts = max(c[0] for c in cand)
        # tie on rts: the window keeps the last row in (ts, side) order —
        # among equal rts the max rval is not guaranteed; collect all
        return {rv for rts2, rv in cand if rts2 == best_rts}

    for r in out.collect():
        exp = expected(r["k"], r["ts"])
        if exp is None:
            assert r["rval"] is None
        else:
            assert r["rval"] in exp
