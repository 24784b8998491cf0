"""Connected components on constructed graphs."""

from __future__ import annotations

from flink_1_20_spark.operators.components import connected_components, dedup_assignment


def test_chain_clique_isolated(spark):
    # chain 1-2-3-4 (diameter > 1 forces multiple rounds), clique 10-11-12,
    # pair 20-21; docs 30, 31 isolated
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21)],
        "id_a bigint, id_b bigint",
    )
    cc = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    docs = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 12, 20, 21, 30, 31]], "doc_id bigint"
    )
    out = {r["doc"]: (r["cluster"], r["is_duplicate"]) for r in
           dedup_assignment(docs, pairs, "doc_id").collect()}
    assert out[30] == (30, False) and out[31] == (31, False)  # singletons
    assert out[4] == (1, True)
    assert sum(1 for c, d in out.values() if not d) == 5  # 3 components + 2 singletons


def test_long_chain_converges(spark):
    n = 20  # diameter 19 — exercises multi-round convergence + checkpoint
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n)], "id_a bigint, id_b bigint")
    cc = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert set(cc.values()) == {0}
    assert len(cc) == n + 1
