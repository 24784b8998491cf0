"""DataStream API facade: fluent topology calls execute as DataFrame
plans (DataStream.java / KeyedStream.java parity, SURVEY §3.3)."""

from __future__ import annotations

import json
import os
from datetime import datetime

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


# ----------------------------------------------- window assigner family
# windowing/assigners/: sliding, session, global; DataStream.join:756 /
# coGroup:748 windowed two-stream ops.


def test_sliding_window_assigner(spark):
    from flink_1_20_spark.datastream_api import (
        SlidingEventTimeWindows,
        StreamExecutionEnvironment,
    )

    env = StreamExecutionEnvironment(spark)
    s = env.from_collection(
        [("a", datetime(2024, 1, 1, 10, 7), 1.0), ("a", datetime(2024, 1, 1, 10, 20), 2.0)],
        "k string, ts timestamp, v double",
    )
    rows = (
        s.key_by("k")
        .window(SlidingEventTimeWindows.of("30 minutes", "15 minutes"), "ts")
        .aggregate("sum(v) AS total")
        .execute_and_collect()
    )
    # each row lands in 2 sliding windows; 10:07 and 10:20 share one
    by_start = {r.w_start.strftime("%H:%M"): r.total for r in rows}
    assert by_start == {"09:45": 1.0, "10:00": 3.0, "10:15": 2.0}


def test_session_window_assigner(spark):
    from flink_1_20_spark.datastream_api import (
        EventTimeSessionWindows,
        StreamExecutionEnvironment,
    )

    env = StreamExecutionEnvironment(spark)
    s = env.from_collection(
        [
            ("a", datetime(2024, 1, 1, 10, 0), 1.0),
            ("a", datetime(2024, 1, 1, 10, 4), 2.0),  # same session (gap 5m)
            ("a", datetime(2024, 1, 1, 11, 0), 4.0),  # new session
        ],
        "k string, ts timestamp, v double",
    )
    rows = (
        s.key_by("k")
        .window(EventTimeSessionWindows.with_gap("5 minutes"), "ts")
        .aggregate("sum(v) AS total", "count(*) AS n")
        .execute_and_collect()
    )
    assert sorted((r.total, r.n) for r in rows) == [(3.0, 2), (4.0, 1)]


def test_global_window_assigner(spark):
    from flink_1_20_spark.datastream_api import (
        GlobalWindows,
        StreamExecutionEnvironment,
    )

    env = StreamExecutionEnvironment(spark)
    s = env.from_collection(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], "k string, v double"
    )
    rows = (
        s.key_by("k")
        .window(GlobalWindows.create())
        .aggregate("sum(v) AS total")
        .execute_and_collect()
    )
    assert sorted((r.k, r.total) for r in rows) == [("a", 3.0), ("b", 5.0)]


def test_windowed_join(spark):
    from flink_1_20_spark.datastream_api import (
        StreamExecutionEnvironment,
        TumblingEventTimeWindows,
    )

    env = StreamExecutionEnvironment(spark)
    l = env.from_collection(
        [("a", datetime(2024, 1, 1, 10, 5), 1), ("a", datetime(2024, 1, 1, 11, 5), 2)],
        "k string, lts timestamp, lv bigint",
    )
    r = env.from_collection(
        [("a", datetime(2024, 1, 1, 10, 40), 10), ("b", datetime(2024, 1, 1, 10, 10), 20)],
        "rk string, rts timestamp, rv bigint",
    )
    rows = (
        l.join(r)
        .where("k")
        .equal_to("rk")
        .window(TumblingEventTimeWindows.of("1 hour"), "lts", "rts")
        .apply("k", "lv", "rv", "window_start")
        .execute_and_collect()
    )
    # only ('a', 10:05) × ('a', 10:40) share key AND hour window
    assert [(x.k, x.lv, x.rv) for x in rows] == [("a", 1, 10)]


def test_windowed_cogroup(spark):
    from flink_1_20_spark.datastream_api import (
        StreamExecutionEnvironment,
        TumblingEventTimeWindows,
    )

    env = StreamExecutionEnvironment(spark)
    l = env.from_collection(
        [("a", datetime(2024, 1, 1, 10, 5), 1), ("a", datetime(2024, 1, 1, 10, 6), 2)],
        "k string, lts timestamp, lv bigint",
    )
    r = env.from_collection(
        [("b", datetime(2024, 1, 1, 10, 10), 20)],
        "rk string, rts timestamp, rv bigint",
    )
    rows = (
        l.co_group(r)
        .where("k")
        .equal_to("rk")
        .window(TumblingEventTimeWindows.of("1 hour"), "lts", "rts")
        .apply("k", "size(left_rows) AS nl", "size(right_rows) AS nr")
        .execute_and_collect()
    )
    got = sorted((x.k, x.nl, x.nr) for x in rows)
    assert got == [("a", 2, 0), ("b", 0, 1)]  # outer: both lone groups emit


def test_count_window(spark):
    from flink_1_20_spark.datastream_api import StreamExecutionEnvironment

    env = StreamExecutionEnvironment(spark)
    s = env.from_collection(
        [("a", i) for i in range(5)], "k string, seq bigint"
    )
    rows = (
        s.key_by("k")
        .count_window(2, "seq")
        .to_data_frame()
        .groupBy("window_id")
        .count()
        .collect()
    )
    assert sorted((r.window_id, r["count"]) for r in rows) == [(0, 2), (1, 2), (2, 1)]


def test_interval_join_facade(spark):
    from flink_1_20_spark.datastream_api import StreamExecutionEnvironment

    env = StreamExecutionEnvironment(spark)
    l = env.from_collection(
        [("a", datetime(2024, 1, 1, 10, 0), 1), ("a", datetime(2024, 1, 1, 12, 0), 2)],
        "k string, lts timestamp, lv bigint",
    )
    r = env.from_collection(
        [("a", datetime(2024, 1, 1, 10, 20), 10),  # within +30m of 10:00
         ("a", datetime(2024, 1, 1, 11, 0), 20)],  # outside both bounds
        "rk string, rts timestamp, rv bigint",
    )
    rows = (
        l.key_by("k")
        .interval_join(r.key_by("rk"))
        .between("5 minutes", "30 minutes")
        .on("lts", "rts", "k", "lv", "rv")
        .execute_and_collect()
    )
    assert [(x.k, x.lv, x.rv) for x in rows] == [("a", 1, 10)]


def test_windowed_join_session_assigner(spark):
    """Session-window join: sessions MERGE across the two inputs (Flink
    runs the assigner over the tagged union), so a left row and a right
    row within the gap share a session even when either side alone
    would have split."""
    from flink_1_20_spark.datastream_api import (
        EventTimeSessionWindows,
        StreamExecutionEnvironment,
    )

    env = StreamExecutionEnvironment(spark)
    l = env.from_collection(
        [
            ("a", datetime(2024, 1, 1, 10, 0), 1),
            ("a", datetime(2024, 1, 1, 10, 8), 2),   # bridged by right 10:04
            ("a", datetime(2024, 1, 1, 12, 0), 3),   # own session, no right row
        ],
        "k string, lts timestamp, lv bigint",
    )
    r = env.from_collection(
        [
            ("a", datetime(2024, 1, 1, 10, 4), 10),  # bridges 10:00 and 10:08
            ("b", datetime(2024, 1, 1, 10, 0), 20),  # other key
        ],
        "rk string, rts timestamp, rv bigint",
    )
    rows = (
        l.join(r)
        .where("k")
        .equal_to("rk")
        .window(EventTimeSessionWindows.with_gap("5 minutes"), "lts", "rts")
        .apply("k", "lv", "rv", "window_start", "window_end")
        .execute_and_collect()
    )
    # merged session {10:00, 10:04, 10:08}: both left rows pair with rv=10
    assert sorted((x.k, x.lv, x.rv) for x in rows) == [("a", 1, 10), ("a", 2, 10)]
    # window_end = last ts + gap
    assert all(x.window_end == datetime(2024, 1, 1, 10, 13) for x in rows)


def test_windowed_cogroup_session_assigner(spark):
    from flink_1_20_spark.datastream_api import (
        EventTimeSessionWindows,
        StreamExecutionEnvironment,
    )

    env = StreamExecutionEnvironment(spark)
    l = env.from_collection(
        [("a", datetime(2024, 1, 1, 10, 0), 1), ("a", datetime(2024, 1, 1, 12, 0), 3)],
        "k string, lts timestamp, lv bigint",
    )
    r = env.from_collection(
        [("a", datetime(2024, 1, 1, 10, 4), 10)],
        "rk string, rts timestamp, rv bigint",
    )
    rows = (
        l.co_group(r)
        .where("k")
        .equal_to("rk")
        .window(EventTimeSessionWindows.with_gap("5 minutes"), "lts", "rts")
        .apply()
        .execute_and_collect()
    )
    by_start = {x.window_start: (len(x.left_rows), len(x.right_rows)) for x in rows}
    assert by_start == {
        datetime(2024, 1, 1, 10, 0): (1, 1),
        datetime(2024, 1, 1, 12, 0): (1, 0),
    }
