"""Salted aggregation correctness + window-offset alignment."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_1_20_spark.operators.skew import salted_agg, salted_count_distinct
from flink_1_20_spark.streaming import tumble_window_agg


def test_salted_agg_matches_plain(spark, tables):
    e = tables["events"]
    plain = {
        (r["user_id"],): (r["n"], r["total"], r["mx"])
        for r in e.groupBy("user_id")
        .agg(F.count("value").alias("n"), F.sum("value").alias("total"), F.max("value").alias("mx"))
        .collect()
    }
    salted = {
        (r["user_id"],): (r["n"], r["total"], r["mx"])
        for r in salted_agg(
            e, ["user_id"],
            {"n": ("count", "value"), "total": ("sum", "value"), "mx": ("max", "value")},
            num_salts=8,
        ).collect()
    }
    assert salted.keys() == plain.keys()
    for k in plain:
        assert salted[k][0] == plain[k][0]
        assert abs(salted[k][1] - plain[k][1]) < 1e-6
        assert salted[k][2] == plain[k][2]


def test_salted_count_distinct_matches_plain(spark, tables):
    e = tables["events"]
    plain = {
        r["event_type"]: r["d"]
        for r in e.groupBy("event_type").agg(F.count_distinct("user_id").alias("d")).collect()
    }
    salted = {
        r["event_type"]: r["n_distinct"]
        for r in salted_count_distinct(e, ["event_type"], "user_id", num_salts=8).collect()
    }
    assert salted == plain


def test_tumble_offset_alignment(spark):
    import datetime as dt

    rows = [(dt.datetime(2024, 1, 1, 10, 7), 1.0), (dt.datetime(2024, 1, 1, 10, 22), 1.0)]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    # 15-min windows offset by 5 min → [10:05, 10:20), [10:20, 10:35)
    out = tumble_window_agg(df, "ts", "15 minutes", aggs={"n": F.count("*")}, offset="5 minutes")
    got = sorted(r["window_start"].isoformat() for r in out.collect())
    assert got == ["2024-01-01T10:05:00", "2024-01-01T10:20:00"]


def test_salted_skew_join_matches_plain(spark):
    """Salted join == plain join row set (inner + left), including a
    very hot key, and the join stays an equi join on (key, salt)."""
    import pandas as pd

    from flink_1_20_spark.operators.skew import salted_skew_join

    hot = [(1, f"h{i}") for i in range(500)] + [(2, "x"), (3, "y"), (5, "only_left")]
    left = spark.createDataFrame(hot, "k long, lv string")
    right = spark.createDataFrame(
        [(1, "dim1"), (2, "dim2"), (4, "only_right")], "rk long, rv string"
    )
    plain = left.join(right, left.k == right.rk, "inner").select("k", "lv", "rv")
    salted = salted_skew_join(left, right, "k", "rk", num_salts=8).select(
        "k", "lv", "rv"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))

    plain_l = left.join(right, left.k == right.rk, "left").select("k", "lv", "rv")
    salted_l = salted_skew_join(left, right, "k", "rk", num_salts=8, how="left").select(
        "k", "lv", "rv"
    )
    assert sorted(map(tuple, salted_l.collect()), key=str) == sorted(
        map(tuple, plain_l.collect()), key=str
    )
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
