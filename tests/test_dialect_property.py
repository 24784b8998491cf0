"""Property tests for the Flink-SQL dialect rewrites: generated
statements must agree with the equivalent library calls (the rewrites
are textual, so systematic variation of sizes/columns/forms catches
parse edge cases a single example test misses)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def env(spark, sf_dir):
    from flink_1_20_spark.catalog import register_views
    from flink_1_20_spark.sql_ddl import TableEnvironment

    register_views(spark, sf_dir)
    return TableEnvironment(spark)


@pytest.mark.parametrize("size,unit", [("1", "HOUR"), ("30", "MINUTES"), ("2", "HOURS")])
def test_tumble_tvf_sizes_match_library(env, spark, size, unit):
    from flink_1_20_spark.streaming.windows import tumble_window_agg

    got = env.execute_sql(f"""
        SELECT window_start, count(*) AS n
        FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '{size}' {unit}))
        GROUP BY window_start
    """)
    unit_word = unit.lower().rstrip("s")
    dur = f"{size} {unit_word}" + ("" if size == "1" else "s")
    want = (
        tumble_window_agg(spark.table("events"), "ts", dur)
        .select(F.col("window_start"), F.col("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


@pytest.mark.parametrize(
    "slide,size", [(("15", "MINUTES"), ("1", "HOUR")), (("1", "HOUR"), ("2", "HOURS"))]
)
def test_hop_tvf_matches_library(env, spark, slide, size):
    from flink_1_20_spark.streaming.windows import hop_window_agg

    got = env.execute_sql(f"""
        SELECT window_start, window_end, count(*) AS n
        FROM TABLE(HOP(TABLE events, DESCRIPTOR(ts),
                       INTERVAL '{slide[0]}' {slide[1]},
                       INTERVAL '{size[0]}' {size[1]}))
        GROUP BY window_start, window_end
    """)

    def dur(p):
        w = p[1].lower().rstrip("s")
        return f"{p[0]} {w}" + ("" if p[0] == "1" else "s")

    want = hop_window_agg(
        spark.table("events"), "ts", size=dur(size), slide=dur(slide)
    ).select("window_start", "window_end", "n")
    assert sorted(map(tuple, got.collect()), key=str) == sorted(
        map(tuple, want.collect()), key=str
    )


@pytest.mark.parametrize("n_elems", [0, 1, 3, 7])
def test_unnest_row_counts(env, spark, n_elems):
    """CROSS JOIN drops empty arrays, LEFT ... ON TRUE keeps them, and
    ordinality is a 1..n sequence — for any array size."""
    arr = [f"e{i}" for i in range(n_elems)]
    spark.createDataFrame([(1, arr)], "id long, xs array<string>") \
        .createOrReplaceTempView("unnest_prop")
    inner = env.execute_sql(
        "SELECT x FROM unnest_prop CROSS JOIN UNNEST(xs) AS u(x)"
    ).collect()
    assert len(inner) == n_elems
    outer = env.execute_sql(
        "SELECT x FROM unnest_prop LEFT JOIN UNNEST(xs) AS u(x) ON TRUE"
    ).collect()
    assert len(outer) == max(n_elems, 1)
    ords = env.execute_sql(
        "SELECT o FROM unnest_prop CROSS JOIN UNNEST(xs) WITH ORDINALITY AS u(x, o)"
    ).collect()
    assert sorted(r.o for r in ords) == list(range(1, n_elems + 1))


@pytest.mark.parametrize(
    "delim", [",", ".", "|", "+", "$", "ab"]
)
def test_split_index_delimiters(env, delim):
    """SPLIT_INDEX treats ANY delimiter literally, regex metachars
    included."""
    payload = delim.join(["x", "y", "z"])
    r = env.execute_sql(
        f"SELECT SPLIT_INDEX('{payload}', '{delim}', 0) AS a, "
        f"SPLIT_INDEX('{payload}', '{delim}', 2) AS c, "
        f"SPLIT_INDEX('{payload}', '{delim}', 5) AS oob"
    ).collect()[0]
    assert (r.a, r.c, r.oob) == ("x", "z", None)
