"""Changelog join: incremental delta output must track the full
recomputed join after every batch (the StreamingJoinOperator invariant —
downstream materialization equals join-of-materializations)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_1_20_spark.operators.changelog_join import (
    CNT_COL,
    ChangelogJoin,
    _consolidate,
    changelog_to_counts,
    counts_to_changelog,
)

L_SCHEMA = "k bigint, amount double, op string"
R_SCHEMA = "k bigint, name string, op string"


def _counts(spark, rows, schema):
    return changelog_to_counts(spark.createDataFrame(rows, schema))


def _as_set(df):
    return {tuple(r) for r in df.collect()}


def test_changelog_join_tracks_recompute(spark):
    j = ChangelogJoin(on=["k"])
    acc = None  # accumulated output deltas = downstream materialization

    def step(dl_rows, dr_rows):
        nonlocal acc
        delta = j.process(
            _counts(spark, dl_rows, L_SCHEMA), _counts(spark, dr_rows, R_SCHEMA)
        )
        acc = delta if acc is None else _consolidate(acc.unionByName(delta))
        assert _as_set(acc) == _as_set(j.materialized()), "delta drifted from recompute"

    # batch 1: two orders, one customer → join has exactly (1, 10.0, x)
    step(
        [(1, 10.0, "+I"), (2, 20.0, "+I")],
        [(1, "x", "+I")],
    )
    assert _as_set(acc) == {(1, 10.0, "x", 1)}

    # batch 2: customer 2 appears (late-arriving right side joins the
    # RETAINED left state), customer 1 renamed via -D/+I, order 2 retracted
    step(
        [(2, 20.0, "-D")],
        [(2, "y", "+I"), (1, "x", "-D"), (1, "x2", "+I")],
    )
    assert _as_set(acc) == {(1, 10.0, "x2", 1)}

    # batch 3: duplicate insert → multiset count 2 for the same row
    step([(1, 10.0, "+I")], [])
    assert _as_set(acc) == {(1, 10.0, "x2", 2)}


def test_counts_changelog_roundtrip(spark):
    log = spark.createDataFrame(
        [(1, "a", "+I"), (1, "a", "+I"), (1, "a", "-D"), (2, "b", "+U"), (3, "c", "-U")],
        "k bigint, v string, op string",
    )
    net = _consolidate(changelog_to_counts(log))
    assert _as_set(net) == {(1, "a", 1), (2, "b", 1), (3, "c", -1)}
    ops = counts_to_changelog(net)
    got = sorted((r["k"], r["v"], r["op"]) for r in ops.collect())
    assert got == [(1, "a", "+I"), (2, "b", "+I"), (3, "c", "-D")]


def test_counts_to_changelog_expands_multiplicity(spark):
    two = spark.createDataFrame([(1, "a", 2), (2, "b", -2)], f"k bigint, v string, {CNT_COL} int")
    got = sorted((r["k"], r["op"]) for r in counts_to_changelog(two).collect())
    assert got == [(1, "+I"), (1, "+I"), (2, "-D"), (2, "-D")]


def test_changelog_left_outer_pad_retraction(spark):
    """The outer-join state machine (OuterJoinRecordStateViews): an
    unmatched left row emits a null-padded result; its first match
    retracts the pad and emits the joined row; retracting the last
    match re-emits the pad."""
    j = ChangelogJoin(on=["k"], how="left")
    acc = None

    def step(dl_rows, dr_rows):
        nonlocal acc
        delta = j.process(
            _counts(spark, dl_rows, L_SCHEMA), _counts(spark, dr_rows, R_SCHEMA)
        )
        acc = delta if acc is None else _consolidate(acc.unionByName(delta))
        assert _as_set(acc) == _as_set(j.materialized())
        return delta

    # order 1 arrives with no customer → null-padded
    step([(1, 10.0, "+I")], [])
    assert _as_set(acc) == {(1, 10.0, None, 1)}

    # customer 1 arrives → pad retracted, joined row emitted
    d = step([], [(1, "x", "+I")])
    assert _as_set(d) == {(1, 10.0, "x", 1), (1, 10.0, None, -1)}
    assert _as_set(acc) == {(1, 10.0, "x", 1)}

    # customer 1 retracted → joined row retracted, pad comes back
    step([], [(1, "x", "-D")])
    assert _as_set(acc) == {(1, 10.0, None, 1)}


def test_changelog_join_foreachbatch_streaming(spark, tmp_path):
    """The documented streaming wiring: deltas arrive per micro-batch
    through foreachBatch; the join state carries across batches."""
    import json
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    src = str(tmp_path / "cdc")
    os.makedirs(src, exist_ok=True)

    def write(batch_no, rows):
        with open(os.path.join(src, f"b{batch_no}.json"), "w") as f:
            for side, k, payload, op in rows:
                f.write(json.dumps(
                    {"side": side, "k": k, "payload": payload, "op": op}) + "\n")

    schema = StructType([
        StructField("side", StringType()),
        StructField("k", LongType()),
        StructField("payload", StringType()),
        StructField("op", StringType()),
    ])
    write(0, [("L", 1, "a10", "+I"), ("R", 1, "x", "+I"), ("L", 2, "a20", "+I")])

    j = ChangelogJoin(on=["k"])
    out_deltas = []

    def step(batch, _bid):
        # split the tagged CDC stream into the two join inputs
        dl = changelog_to_counts(
            batch.filter(F.col("side") == "L").select("k", F.col("payload").alias("lv"), "op"))
        dr = changelog_to_counts(
            batch.filter(F.col("side") == "R").select("k", F.col("payload").alias("rv"), "op"))
        out_deltas.extend(j.process(dl, dr).collect())

    stream = (
        spark.readStream.schema(schema).json(src)
    )
    q = stream.writeStream.foreachBatch(step).start()
    try:
        q.processAllAvailable()
        # batch 2: right row for k=2 arrives late; k=1 right retracted
        write(1, [("R", 2, "y", "+I"), ("R", 1, "x", "-D")])
        q.processAllAvailable()
    finally:
        q.stop()

    acc = {}
    for r in out_deltas:
        key = (r["k"], r["lv"], r["rv"])
        acc[key] = acc.get(key, 0) + r[CNT_COL]
    net = {k: v for k, v in acc.items() if v != 0}
    # k=1 joined then retracted; k=2 joined against retained left state
    assert net == {(2, "a20", "y"): 1}


def test_changelog_join_random_sequences(spark):
    """IVM invariant under randomized batches: for arbitrary op
    sequences split arbitrarily into batches, accumulated deltas ==
    join-of-materialized-states after every batch. Deterministic seed —
    a pocket-sized model check of StreamingJoinOperator."""
    import random

    rng = random.Random(7)
    # gate mode runs one trial (the sequences are seeded, so trial 0 is
    # the same model check every round); SPARK_GRAFT_SOAK=1 restores
    # the full battery (r14 suite-throughput cut, VERDICT r13 task 1)
    n_trials = 3 if os.environ.get("SPARK_GRAFT_SOAK") == "1" else 1
    for trial in range(n_trials):
        # build a random but WELL-FORMED changelog per side (deletes only
        # of rows currently present — Flink's input contract)
        sides = {"L": [], "R": []}
        live = {"L": [], "R": []}
        for _ in range(30):
            side = rng.choice("LR")
            if live[side] and rng.random() < 0.35:
                row = rng.choice(live[side])
                live[side].remove(row)
                sides[side].append((*row, "-D"))
            else:
                row = (rng.randint(1, 4), rng.choice("abc") if side == "R" else float(rng.randint(1, 9)))
                live[side].append(row)
                sides[side].append((*row, "+I"))
        # split each side's ops into 3 ordered batches (thirds)
        j = ChangelogJoin(on=["k"])
        acc = None
        for b in range(3):
            def third(ops):
                n = len(ops)
                return ops[b * n // 3:(b + 1) * n // 3]
            dl = _counts(spark, [(k, v, op) for k, v, op in third(sides["L"])], L_SCHEMA)
            dr = _counts(spark, [(k, v, op) for k, v, op in third(sides["R"])], R_SCHEMA)
            delta = j.process(dl, dr)
            acc = delta if acc is None else _consolidate(acc.unionByName(delta))
            assert _as_set(acc) == _as_set(j.materialized()), f"trial {trial} batch {b}"


def test_changelog_semi_join_existence_transitions(spark):
    """StreamingSemiAntiJoinOperator semantics: left rows emit iff the
    right side has ≥1 matching row; the right count crossing zero
    emits/retracts the associated left rows."""
    j = ChangelogJoin(on=["k"], how="semi")
    acc = None

    def step(dl_rows, dr_rows):
        nonlocal acc
        delta = j.process(
            _counts(spark, dl_rows, L_SCHEMA), _counts(spark, dr_rows, R_SCHEMA)
        )
        acc = delta if acc is None else _consolidate(acc.unionByName(delta))
        assert _as_set(acc) == _as_set(j.materialized())
        return delta

    # left rows arrive with no right match → nothing
    step([(1, 10.0, "+I"), (2, 20.0, "+I")], [])
    assert _as_set(acc) == set()

    # right key 1 appears (0→1) → retained left row for k=1 emits
    d = step([], [(1, "x", "+I")])
    assert _as_set(d) == {(1, 10.0, 1)}

    # second right row same key (1→2): existence unchanged → no delta
    d = step([], [(1, "x2", "+I")])
    assert _as_set(d) == set()

    # one of the two right rows retracted (2→1): still present → no delta
    d = step([], [(1, "x", "-D")])
    assert _as_set(d) == set()

    # last right row retracted (1→0) → left row retracts
    d = step([], [(1, "x2", "-D")])
    assert _as_set(d) == {(1, 10.0, -1)}
    assert _as_set(acc) == set()


def test_changelog_anti_join_existence_transitions(spark):
    """NOT EXISTS over changelogs: left rows emit while the right side
    has NO matching key; a first right match retracts them."""
    j = ChangelogJoin(on=["k"], how="anti")
    acc = None

    def step(dl_rows, dr_rows):
        nonlocal acc
        delta = j.process(
            _counts(spark, dl_rows, L_SCHEMA), _counts(spark, dr_rows, R_SCHEMA)
        )
        acc = delta if acc is None else _consolidate(acc.unionByName(delta))
        assert _as_set(acc) == _as_set(j.materialized())
        return delta

    # unmatched left rows emit immediately
    step([(1, 10.0, "+I"), (2, 20.0, "+I")], [])
    assert _as_set(acc) == {(1, 10.0, 1), (2, 20.0, 1)}

    # right key 1 appears → k=1 left row retracts
    d = step([], [(1, "x", "+I")])
    assert _as_set(d) == {(1, 10.0, -1)}
    assert _as_set(acc) == {(2, 20.0, 1)}

    # right key 1 vanishes → k=1 left row comes back
    d = step([], [(1, "x", "-D")])
    assert _as_set(d) == {(1, 10.0, 1)}

    # new left row for matched key 1? (no right rows now) — emits; then
    # right reappears and retracts BOTH k=1 rows
    step([(1, 11.0, "+I")], [])
    d = step([], [(1, "z", "+I")])
    assert _as_set(d) == {(1, 10.0, -1), (1, 11.0, -1)}
    assert _as_set(acc) == {(2, 20.0, 1)}


def test_changelog_semi_anti_random_sequences(spark):
    """Same randomized IVM model check as the inner join, for semi and
    anti: accumulated deltas == semi/anti of materialized states after
    every batch."""
    import random

    n_trials = 2 if os.environ.get("SPARK_GRAFT_SOAK") == "1" else 1
    for how in ("semi", "anti"):
        rng = random.Random(11)
        for trial in range(n_trials):
            sides = {"L": [], "R": []}
            live = {"L": [], "R": []}
            for _ in range(30):
                side = rng.choice("LR")
                if live[side] and rng.random() < 0.35:
                    row = rng.choice(live[side])
                    live[side].remove(row)
                    sides[side].append((*row, "-D"))
                else:
                    row = (rng.randint(1, 4), rng.choice("abc") if side == "R" else float(rng.randint(1, 9)))
                    live[side].append(row)
                    sides[side].append((*row, "+I"))
            j = ChangelogJoin(on=["k"], how=how)
            acc = None
            for b in range(3):
                def third(ops):
                    n = len(ops)
                    return ops[b * n // 3:(b + 1) * n // 3]
                dl = _counts(spark, [(k, v, op) for k, v, op in third(sides["L"])], L_SCHEMA)
                dr = _counts(spark, [(k, v, op) for k, v, op in third(sides["R"])], R_SCHEMA)
                delta = j.process(dl, dr)
                acc = delta if acc is None else _consolidate(acc.unionByName(delta))
                assert _as_set(acc) == _as_set(j.materialized()), f"{how} trial {trial} batch {b}"


def test_changelog_join_checkpoint_interval_bounds_plan(spark):
    """r13: state lineage is truncated every CHECKPOINT_INTERVAL batches
    so a long-running drive's per-batch plan stays bounded instead of
    re-embedding the whole input history. Invariant (delta-accumulation
    == materialized view) must hold across the checkpoint boundary, and
    the state plan must actually be cut at the interval (an RDD scan
    root instead of the union+consolidate chain)."""
    interval = ChangelogJoin.CHECKPOINT_INTERVAL
    j = ChangelogJoin(on=["k"])
    acc = None
    for b in range(2 * interval):
        dl = _counts(spark, [(b, float(b), "+I")], L_SCHEMA)
        dr = _counts(spark, [(b, "x", "+I"), (max(b - 1, 0), "x", "-D")], R_SCHEMA)
        delta = j.process(dl, dr)
        acc = delta if acc is None else _consolidate(acc.unionByName(delta))
        assert _as_set(acc) == _as_set(j.materialized()), f"batch {b}"
        plan = j.state_left._jdf.queryExecution().optimizedPlan().toString()
        if (b + 1) % interval == 0:
            # checkpointed: the state root is a materialized RDD scan
            assert "LogicalRDD" in plan or "ExistingRDD" in plan
        else:
            # plan depth stays bounded by the interval: at most
            # `interval` folds since the last truncation, not b folds
            assert plan.count("Union") <= interval
