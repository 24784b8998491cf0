"""Flink Table API facade: fluent methods + Flink expression strings
execute as DataFrame plans (Table.java parity, SURVEY §3.2)."""

from __future__ import annotations

from flink_1_20_spark.table_api import Table, _translate, from_data_frame


def test_expression_translation():
    assert _translate("price.sum AS total") == "sum(price) AS total"
    assert _translate("name.upperCase()") == "upper(name)"
    assert _translate("a.sum + b.max") == "sum(a) + max(b)"
    # plain SQL untouched
    assert _translate("substring(name, 1, 3)") == "substring(name, 1, 3)"


def test_filter_group_select_pipeline(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 20.0), ("c", 5.0)],
        "k string, v double",
    )
    t = from_data_frame(df)
    rows = (
        t.filter("v > 1")
        .group_by("k")
        .select("k", "v.sum AS total", "v.count AS n")
        .order_by("total.desc")
        .execute()
        .collect()
    )
    assert [(r.k, r.total, r.n) for r in rows] == [("b", 30.0, 2), ("c", 5.0, 1), ("a", 3.0, 1)]


def test_join_union_fetch(spark):
    l = from_data_frame(
        spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "id bigint, s string")
    )
    r = from_data_frame(
        spark.createDataFrame([(1, 10.0), (3, 30.0)], "rid bigint, amt double")
    )
    rows = (
        l.left_outer_join(r, "id = rid")
        .select("id", "s.upperCase() AS u", "amt")
        .order_by("id")
        .execute()
        .collect()
    )
    assert [(x.id, x.u, x.amt) for x in rows] == [
        (1, "X", 10.0), (2, "Y", None), (3, "Z", 30.0),
    ]

    u = l.select("id").union_all(l.select("id")).distinct().order_by("id").fetch(2)
    assert [x.id for x in u.execute().collect()] == [1, 2]


def test_add_rename_drop_columns(spark):
    t = from_data_frame(spark.createDataFrame([(2, 3)], "a bigint, b bigint"))
    out = (
        t.add_columns("a + b AS c")
        .rename_columns("a AS x")
        .drop_columns("b")
        .execute()
        .collect()
    )
    assert out[0].asDict() == {"x": 2, "c": 5}
