"""DataStream API facade: fluent topology calls execute as DataFrame
plans (DataStream.java / KeyedStream.java parity, SURVEY §3.3)."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from flink_1_20_spark.datastream_api import StreamExecutionEnvironment
from flink_1_20_spark.streaming import file_source, run_to_memory


def test_map_filter_flatmap_union(spark):
    env = StreamExecutionEnvironment(spark)
    s = env.from_collection(
        [(1, "a b"), (2, "c"), (3, "d e f")], "id bigint, words string"
    )
    # string-expression map stays JVM-side
    doubled = s.map("id * 2 AS id2").filter("id2 > 2")
    rows = doubled.select("id", "id2").execute_and_collect()
    assert sorted((r.id, r.id2) for r in rows) == [(2, 4), (3, 6)]

    # flat_map: one row -> N via explode
    tokens = s.flat_map("split(words, ' ')", "tok")
    assert sorted(r.tok for r in tokens.select("tok").execute_and_collect()) == [
        "a", "b", "c", "d", "e", "f",
    ]

    u = s.select("id").union(s.select("id"))
    assert len(u.execute_and_collect()) == 6


def test_python_map_runs_as_arrow_batches(spark):
    env = StreamExecutionEnvironment(spark)
    s = env.from_collection([(1,), (2,), (3,)], "x bigint")

    def plus_ten(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"y": pdf["x"] + 10})

    out = s.map(plus_ten, schema="y bigint").execute_and_collect()
    assert sorted(r.y for r in out) == [11, 12, 13]

    with pytest.raises(ValueError):
        s.map(plus_ten)  # schema required for python maps


def test_key_by_reduce_and_window_aggregate(spark):
    env = StreamExecutionEnvironment(spark)
    s = env.from_collection(
        [
            ("2024-01-01 10:00:10", "a", 1.0),
            ("2024-01-01 10:01:00", "a", 2.0),
            ("2024-01-01 10:06:00", "a", 4.0),
            ("2024-01-01 10:00:30", "b", 10.0),
        ],
        "ts_s string, k string, v double",
    ).map("cast(ts_s as timestamp) AS ts")

    reduced = s.key_by("k").reduce("sum(v) AS total", "count(*) AS n")
    got = {(r.k): (r.total, r.n) for r in reduced.execute_and_collect()}
    assert got == {"a": (7.0, 3), "b": (10.0, 1)}

    winned = (
        s.key_by("k")
        .window("ts", "5 minutes")
        .aggregate("sum(v) AS total")
        .execute_and_collect()
    )
    got = {(r.k, str(r.w_start)): r.total for r in winned}
    assert got == {
        ("a", "2024-01-01 10:00:00"): 3.0,
        ("a", "2024-01-01 10:05:00"): 4.0,
        ("b", "2024-01-01 10:00:00"): 10.0,
    }


def test_keyed_process_on_stream(spark, tmp_path):
    """KeyedStream.process = applyInPandasWithState: running per-key
    count across micro-batches with managed state."""
    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)
    schema = StructType(
        [StructField("k", StringType()), StructField("v", LongType())]
    )
    with open(os.path.join(src_dir, "b1.json"), "w") as f:
        for rec in [{"k": "a", "v": 1}, {"k": "a", "v": 2}, {"k": "b", "v": 5}]:
            f.write(json.dumps(rec) + "\n")

    env = StreamExecutionEnvironment(spark)
    stream = env.from_source(file_source(spark, src_dir, schema))

    def fn(key, batches, state):
        n = state.get[0] if state.exists else 0
        for pdf in batches:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame([{"k": key[0], "n": n}])

    out = stream.key_by("k").process(
        fn, output_schema="k string, n bigint", state_schema="n bigint"
    )
    q = run_to_memory(out.to_data_frame(), "ds_process", output_mode="update")
    try:
        q.processAllAvailable()
        # second file exercises state carried across micro-batches
        with open(os.path.join(src_dir, "b2.json"), "w") as f:
            f.write(json.dumps({"k": "a", "v": 3}) + "\n")
        q.processAllAvailable()
        rows = spark.table("ds_process").collect()
    finally:
        q.stop()
    latest = {}
    for r in rows:  # update mode: last emit per key wins
        latest[r.k] = max(latest.get(r.k, 0), r.n)
    assert latest == {"a": 3, "b": 1}
