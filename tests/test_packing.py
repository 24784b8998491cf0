"""Training-prep operators: greedy sequence packing, sliding chunking,
SemDeDup semantic dedup, and the LSH recall query."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flink_1_20_spark.operators.packing import greedy_pack, sliding_chunks
from flink_1_20_spark.operators.simsearch import semantic_dedup


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # (grp, id, tok)
        ("a", 1, 300),
        ("a", 2, 200),  # 300+200 = 500 <= 512 → seq 1
        ("a", 3, 100),  # 500+100 > 512 → seq 2
        ("a", 4, 600),  # oversized → own seq 3 (never split)
        ("a", 5, 10),   # 600+10 > 512 → seq 4
        ("b", 6, 512),  # exactly the budget → seq 1
        ("b", 7, 1),    # 512+1 > 512 → seq 2
    ]
    return spark.createDataFrame(rows, "grp string, doc_id long, tok long")


def test_greedy_pack_first_fit(docs):
    out = greedy_pack(docs, ["grp"], "doc_id", "tok", 512)
    got = {r["doc_id"]: r["seq_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 3, 5: 4, 6: 1, 7: 2}


def test_greedy_pack_fill_invariant(spark):
    # randomized-ish corpus: no sequence exceeds the budget unless it is
    # a single oversized document, and seq ids are dense from 1
    rows = [("g", i, (i * 37) % 300 + 1) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "grp string, doc_id long, tok long")
    out = greedy_pack(df, ["grp"], "doc_id", "tok", 400)
    fills = (
        out.groupBy("seq_id")
        .agg(F.sum("tok").alias("fill"), F.count("*").alias("n"))
        .collect()
    )
    for r in fills:
        assert r["fill"] <= 400 or r["n"] == 1
    seqs = sorted(r["seq_id"] for r in fills)
    assert seqs == list(range(1, len(seqs) + 1))


def test_sliding_chunks_cover_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(7))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = sliding_chunks(df, "doc_id", "text", size=4, stride=2).collect()
    # starts 0,2,4,6 → sizes 4,4,3,1
    assert [r["chunk_idx"] for r in sorted(out, key=lambda r: r["chunk_idx"])] == [
        0,
        1,
        2,
        3,
    ]
    assert sorted(r["chunk_tokens"] for r in out) == [1, 3, 4, 4]


def test_sliding_chunks_empty_doc_kept(spark):
    df = spark.createDataFrame([(1, "   ")], "doc_id long, text string")
    out = sliding_chunks(df, "doc_id", "text", size=4, stride=2).collect()
    assert len(out) == 1 and out[0]["chunk_idx"] == 0


def test_sliding_chunks_no_shuffle(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = sliding_chunks(df, "doc_id", "text", 4, 2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_semantic_dedup_keeps_lowest_id(spark):
    # two identical vectors + one orthogonal: the higher-id duplicate is
    # dropped, everything else kept
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),
        (2, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["keep"] for r in semantic_dedup(
        df, "vec_id", "embedding", threshold=0.99, n_centroids=2
    ).collect()}
    assert out == {0: True, 1: False, 2: True}


def test_semantic_dedup_plan_single_shuffle_no_join(spark):
    rows = [(i, [float(i % 3), 1.0]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    plan = semantic_dedup(df, "vec_id", "embedding", 0.9, n_centroids=3)
    s = plan._jdf.queryExecution().executedPlan().toString()
    # one corpus scan (broadcast-centroid assignment) + one shuffle on
    # cell + per-cell verdict GEMM: no join of any kind in the plan
    assert "Join" not in s, s
    assert "hashpartitioning(cell" in s, s
    # every corpus row survives with a verdict
    assert plan.count() == 12


# ------------------------------------------------- property tests (pure)

from hypothesis import given, settings, strategies as st  # noqa: E402

from flink_1_20_spark.operators.packing import pack_tokens  # noqa: E402


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=700), max_size=60),
    st.integers(min_value=1, max_value=512),
)
def test_pack_tokens_invariants(tokens, budget):
    seqs = pack_tokens(tokens, budget)
    assert len(seqs) == len(tokens)
    # seq ids are non-decreasing and dense from 1
    if seqs:
        assert seqs[0] == 1
        assert all(b - a in (0, 1) for a, b in zip(seqs, seqs[1:]))
    # each sequence fits the budget unless it is a single oversized doc
    fills: dict[int, list[int]] = {}
    for t, s in zip(tokens, seqs):
        fills.setdefault(s, []).append(t)
    for docs in fills.values():
        assert sum(docs) <= budget or len(docs) == 1
    # greedy = first-fit: a doc only opens a new sequence when it would
    # not have fit in the previous one
    for (t, s), prev in zip(list(zip(tokens, seqs))[1:], seqs):
        if s == prev + 1:
            assert sum(fills[prev]) + t > budget


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=1, max_value=10),
)
def test_chunk_arithmetic_covers_every_token(n_tokens, size, stride):
    # replicate the operator's start generation: multiples of stride
    # from 0 through n-1 inclusive
    starts = list(range(0, n_tokens, stride))
    covered = set()
    for s in starts:
        covered.update(range(s, min(s + size, n_tokens)))
    if stride <= size:
        # overlapping (or abutting) config: every token is covered
        assert covered == set(range(n_tokens))
    else:
        # sampling config (stride > size): exactly the strided windows
        assert covered == {
            i for s in starts for i in range(s, min(s + size, n_tokens))
        }
    # overlap between consecutive full chunks is exactly size - stride
    for a, b in zip(starts, starts[1:]):
        if b + size <= n_tokens:
            assert len(set(range(a, a + size)) & set(range(b, b + size))) == max(
                0, size - stride
            )
