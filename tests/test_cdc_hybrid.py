"""Tests: Debezium CDC decoding → changelog materialization, and the
hybrid (backfill + live) source split."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from flink_1_20_spark.operators.changelog import materialize_changelog
from flink_1_20_spark.sources.cdc import parse_debezium
from flink_1_20_spark.sources.hybrid import hybrid_source
from flink_1_20_spark.streaming import run_to_memory


def _dbz(op, before, after, ts):
    return json.dumps({"before": before, "after": after, "op": op, "ts_ms": ts})


def test_debezium_roundtrip_to_materialized_table(spark):
    events = [
        _dbz("c", None, {"id": 1, "name": "alice"}, 100),
        _dbz("c", None, {"id": 2, "name": "bob"}, 200),
        _dbz("u", {"id": 1, "name": "alice"}, {"id": 1, "name": "alice2"}, 300),
        _dbz("d", {"id": 2, "name": "bob"}, None, 400),
        _dbz("r", None, {"id": 3, "name": "carol"}, 50),  # snapshot read
    ]
    raw = spark.createDataFrame([(e,) for e in events], "value string")
    log = parse_debezium(raw, "value", "id bigint, name string")
    kinds = sorted((r["row_kind"], r["id"]) for r in log.collect())
    assert kinds == [
        ("+I", 1), ("+I", 2), ("+I", 3), ("+U", 1), ("-D", 2), ("-U", 1),
    ]
    final = materialize_changelog(log, keys=["id"], seq_col="ts_ms", op_col="row_kind")
    got = {r["id"]: r["name"] for r in final.collect()}
    assert got == {1: "alice2", 3: "carol"}  # bob deleted, alice updated


def test_canal_batched_rows_and_partial_old(spark):
    from flink_1_20_spark.sources.cdc import parse_canal

    events = [
        json.dumps({"data": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
                    "old": None, "type": "INSERT", "ts": 100}),
        # old[] carries only the changed column (name) — id must be
        # filled in from the after image
        json.dumps({"data": [{"id": 1, "name": "a2"}],
                    "old": [{"name": "a"}], "type": "UPDATE", "ts": 200}),
        json.dumps({"data": [{"id": 2, "name": "b"}],
                    "old": None, "type": "DELETE", "ts": 300}),
    ]
    raw = spark.createDataFrame([(e,) for e in events], "value string")
    log = parse_canal(raw, "value", "id bigint, name string")
    rows = sorted((r["row_kind"], r["id"], r["name"]) for r in log.collect())
    assert rows == [
        ("+I", 1, "a"), ("+I", 2, "b"), ("+U", 1, "a2"),
        ("-D", 2, "b"), ("-U", 1, "a"),
    ]
    final = materialize_changelog(log, keys=["id"], seq_col="ts_ms", op_col="row_kind")
    assert {r["id"]: r["name"] for r in final.collect()} == {1: "a2"}


def test_maxwell_single_row_envelope(spark):
    from flink_1_20_spark.sources.cdc import parse_maxwell

    events = [
        json.dumps({"data": {"id": 1, "name": "x"}, "old": None,
                    "type": "insert", "ts": 10}),
        json.dumps({"data": {"id": 1, "name": "y"}, "old": {"name": "x"},
                    "type": "update", "ts": 20}),
        json.dumps({"data": {"id": 1, "name": "y"}, "old": None,
                    "type": "delete", "ts": 30}),
    ]
    raw = spark.createDataFrame([(e,) for e in events], "value string")
    log = parse_maxwell(raw, "value", "id bigint, name string")
    rows = sorted((r["row_kind"], r["id"], r["name"]) for r in log.collect())
    assert rows == [("+I", 1, "x"), ("+U", 1, "y"), ("-D", 1, "y"), ("-U", 1, "x")]
    final = materialize_changelog(log, keys=["id"], seq_col="ts_ms", op_col="row_kind")
    assert final.count() == 0  # inserted, updated, then deleted


def test_hybrid_source_no_gap_no_overlap(spark, tmp_path):
    hist, live = str(tmp_path / "hist"), str(tmp_path / "live")
    os.makedirs(hist)
    os.makedirs(live)
    # history file contains rows 1-5; live dir starts with rows 4-8
    # (overlapping 4,5 — the cutoff must dedupe them)
    with open(os.path.join(hist, "h.json"), "w") as f:
        for i in range(1, 6):
            f.write(json.dumps({"seq": i, "v": f"h{i}"}) + "\n")
    with open(os.path.join(live, "l.json"), "w") as f:
        for i in range(4, 9):
            f.write(json.dumps({"seq": i, "v": f"l{i}"}) + "\n")
    batch, stream = hybrid_source(
        spark, hist, live, "seq bigint, v string", cutoff_col="seq", cutoff=5
    )
    assert not batch.isStreaming and stream.isStreaming
    q = run_to_memory(stream, "hybrid_live")
    try:
        q.processAllAvailable()
        live_rows = {r["seq"] for r in spark.table("hybrid_live").collect()}
    finally:
        q.stop()
    hist_rows = {r["seq"] for r in batch.collect()}
    assert hist_rows == {1, 2, 3, 4, 5}
    assert live_rows == {6, 7, 8}          # > cutoff only
    assert hist_rows | live_rows == set(range(1, 9))
    assert hist_rows & live_rows == set()  # no double-count


def test_ogg_envelope(spark):
    """Ogg JSON (OggJsonFormatFactory.java:58): op_type I/U/D with
    before/after images → +I / -U,+U / -D changelog."""
    from flink_1_20_spark.sources.cdc import parse_ogg

    def ogg(op, before, after, ts):
        return json.dumps(
            {"before": before, "after": after, "op_type": op, "op_ts": ts})

    events = [
        ogg("I", None, {"id": 1, "name": "alice"}, "2020-05-13 15:40:06.000000"),
        ogg("I", None, {"id": 2, "name": "bob"}, "2020-05-13 15:40:07.000000"),
        ogg("U", {"id": 1, "name": "alice"}, {"id": 1, "name": "alice2"},
            "2020-05-13 15:40:08.000000"),
        ogg("D", {"id": 2, "name": "bob"}, None, "2020-05-13 15:40:09.000000"),
    ]
    raw = spark.createDataFrame([(e,) for e in events], "value string")
    log = parse_ogg(raw, "value", "id bigint, name string")
    rows = sorted((r["row_kind"], r["id"], r["name"]) for r in log.collect())
    assert rows == [
        ("+I", 1, "alice"), ("+I", 2, "bob"), ("+U", 1, "alice2"),
        ("-D", 2, "bob"), ("-U", 1, "alice"),
    ]
    final = materialize_changelog(
        log, keys=["id"], seq_col="op_ts", op_col="row_kind")
    got = {r["id"]: r["name"] for r in final.collect()}
    assert got == {1: "alice2"}


def test_cdc_stream_end_to_end_materialization(spark, tmp_path):
    """Production slice across three layers: a 'scan.streaming' CDC
    table declared through executeSql feeds a foreachBatch that applies
    each micro-batch's net effect (last op per key wins; -D deletes,
    +I/+U upsert) onto a parquet state table — the streaming version of
    materialize_changelog, asserted across two file drops."""
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flink_1_20_spark.sql_ddl import TableEnvironment
    from flink_1_20_spark.streaming.sinks import foreach_batch_sink

    src = tmp_path / "cdc_e2e"
    src.mkdir()
    (src / "b0.jsonl").write_text(
        '{"op":"c","ts_ms":1,"before":null,"after":{"id":1,"name":"a"}}\n'
        '{"op":"c","ts_ms":2,"before":null,"after":{"id":2,"name":"b"}}\n'
    )
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE cdc_e2e (id BIGINT, name STRING)
        WITH ('connector'='filesystem','path'='{src}',
              'format'='debezium-json','scan.streaming'='true')
    """)
    state = str(tmp_path / "mat_state")

    def merge(batch, _bid):
        if batch.isEmpty():  # limit-1 probe, not a full count job
            return
        # DropUpdateBefore: -U carries no new state and shares its
        # ts with the +U after-image, so it must not win the tie
        batch = batch.filter(F.col("row_kind") != "-U")
        w = Window.partitionBy("id").orderBy(F.col("ts_ms").desc())
        net = (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        s = batch.sparkSession
        if os.path.exists(state):
            cur = s.read.parquet(state)
            cur = cur.join(net.select("id"), "id", "left_anti")
        else:
            cur = None
        live = net.filter(F.col("row_kind") != "-D").select("id", "name")
        merged = cur.unionByName(live) if cur is not None else live
        tmp_out = state + ".__stage__"
        merged.write.mode("overwrite").parquet(tmp_out)
        import shutil

        if os.path.exists(state):
            shutil.rmtree(state)
        os.rename(tmp_out, state)

    q = foreach_batch_sink(spark.table("cdc_e2e"), merge)
    try:
        q.processAllAvailable()
        assert {(r.id, r.name) for r in spark.read.parquet(state).collect()} == {
            (1, "a"),
            (2, "b"),
        }
        # second drop: update id=1, delete id=2 — net state follows
        (src / "b1.jsonl").write_text(
            '{"op":"u","ts_ms":3,"before":{"id":1,"name":"a"},"after":{"id":1,"name":"a2"}}\n'
            '{"op":"d","ts_ms":4,"before":{"id":2,"name":"b"},"after":null}\n'
        )
        q.processAllAvailable()
        assert {(r.id, r.name) for r in spark.read.parquet(state).collect()} == {
            (1, "a2"),
        }
    finally:
        q.stop()
