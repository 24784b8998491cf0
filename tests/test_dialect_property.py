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


def test_session_tvf_tied_timestamps_one_session(env, spark):
    """r10 review finding (latent): the SESSION TVF's gaps-and-islands
    lowering ordered both window passes by `ts` alone — not a total
    order — so TIED timestamps could split one session in two if the
    running-sum pass re-sorted a session-starting row behind its tied
    sibling.  The lowering now pins tie order with a same-window
    row_number; tied rows must always share a session (their gap is 0),
    at a session start and mid-session alike."""
    rows = [
        # session 1: tied pair AT the session start + one follower
        (1, "2024-01-01 10:00:00"),
        (2, "2024-01-01 10:00:00"),
        (3, "2024-01-01 10:02:00"),
        # > 5 min gap → session 2: lone row then a tied pair
        (4, "2024-01-01 10:30:00"),
        (5, "2024-01-01 10:31:00"),
        (6, "2024-01-01 10:31:00"),
    ]
    spark.createDataFrame(
        [(i, ts, 7) for i, ts in rows], "event_id long, ts string, k int"
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "k"
    ).createOrReplaceTempView("sess_ties")
    got = env.execute_sql("""
        SELECT window_start, count(*) AS n
        FROM TABLE(SESSION(TABLE sess_ties PARTITION BY k,
                           DESCRIPTOR(ts), INTERVAL '5' MINUTES))
        GROUP BY k, window_start, window_end
    """)
    out = sorted((str(r.window_start), r.n) for r in got.collect())
    assert out == [
        ("2024-01-01 10:00:00", 3),
        ("2024-01-01 10:30:00", 3),
    ], out


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


def test_collection_literals_and_new_builtins(env):
    """The r7 builtin batch: bracket collection constructors
    (ARRAY[..]/MAP[..] — Calcite's literal forms Spark does not parse),
    STR_TO_MAP pinning Flink's '=' key-value delimiter over Spark's
    ':' default (silent mis-split otherwise), TO_TIMESTAMP_LTZ, the
    array/map aliases, the JSON constructor family, the IS JSON
    predicate, row-syntax OVERLAPS, and CURRENT_WATERMARK's batch NULL
    (BuiltInFunctionDefinitions.java names; SqlJsonArrayFunction /
    SqlJsonObjectFunction ON NULL defaults)."""
    got = env.execute_sql("""
        SELECT
          STR_TO_MAP('a=1,b=2') AS stm,
          STR_TO_MAP('a:1;b:2', ';', ':') AS stm3,
          ARRAY_CONCAT(ARRAY[1,2], ARRAY[3]) AS ac,
          ARRAY_REVERSE(ARRAY[1,2]) AS ar,
          ARRAY_SLICE(ARRAY[1,2,3,4], 2, 3) AS asl,
          ARRAY_SLICE(ARRAY[1,2,3,4], 2) AS asl2,
          MAP_UNION(MAP['a',1,'b',9], MAP['b',2]) AS mu,
          TO_TIMESTAMP_LTZ(1700000000, 0) AS ltz,
          JSON_ARRAY('a', CAST(NULL AS STRING), 'b') AS ja,
          JSON_ARRAY('a', CAST(NULL AS STRING) NULL ON NULL) AS jan,
          JSON_OBJECT('k' VALUE 'v', 'n' VALUE CAST(NULL AS STRING)) AS jo,
          JSON_OBJECT(KEY 'k' VALUE 'v',
                      'n' VALUE CAST(NULL AS STRING) ABSENT ON NULL) AS joa,
          JSON_STRING(12) AS js,
          JSON_STRING(CAST(NULL AS INT)) AS jsn,
          JSON_QUOTE('ab') AS jq,
          JSON_UNQUOTE('"ab"') AS ju,
          JSON_UNQUOTE('ab') AS jub,
          '{"a":1}' IS JSON AS ij,
          'nope{' IS NOT JSON AS inj,
          '[1]' IS JSON ARRAY AS ija,
          '[1]' IS JSON OBJECT AS ijo,
          '12' IS JSON SCALAR AS ijs,
          (TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-01 02:00:00')
            OVERLAPS
          (TIMESTAMP '2024-01-01 01:00:00', TIMESTAMP '2024-01-01 03:00:00') AS ovt,
          (TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-01 01:00:00')
            OVERLAPS
          (TIMESTAMP '2024-01-01 01:00:00', TIMESTAMP '2024-01-01 03:00:00') AS ovf,
          CURRENT_WATERMARK(CAST(NULL AS TIMESTAMP)) AS cw,
          'ARRAY[kept, as, data]' AS lit
    """).collect()[0]
    assert got.stm == {"a": "1", "b": "2"}
    assert got.stm3 == {"a": "1", "b": "2"}
    assert got.ac == [1, 2, 3]
    assert got.ar == [2, 1]
    assert got.asl == [2, 3]
    assert got.asl2 == [2, 3, 4]
    assert got.mu == {"a": 1, "b": 2}  # MAP_UNION: last map wins on dups
    assert got.ltz is not None
    assert got.ja == '["a","b"]'          # ABSENT ON NULL is the default
    assert got.jan == '["a",null]'
    assert got.jo == '{"k":"v","n":null}'  # NULL ON NULL is the default
    assert got.joa == '{"k":"v"}'
    assert got.js == "12"
    assert got.jsn is None
    assert got.jq == '"ab"'
    assert got.ju == "ab"
    assert got.jub == "ab"
    assert got.ij and got.inj and got.ija and got.ijs and not got.ijo
    assert got.ovt is True and got.ovf is False
    assert got.cw is None
    assert got.lit == "ARRAY[kept, as, data]"  # literals never rewritten


def test_builtin_tail_review_fixes(env):
    """Review fixes on the r7 builtin batch: negative ARRAY_SLICE
    offsets (from-the-end, ArraySliceFunction), nested JSON
    constructors splice RAW (variant parse, not double-encoded
    strings), mixed-type JSON_ARRAY keeps each element's JSON type,
    zero-length OVERLAPS periods inside the other period, IS JSON on
    the literal 'null' and on NULL operands, keyword text inside
    string literals never rewritten, quote-aware JSON_OBJECT VALUE
    split, and 1-arg TO_TIMESTAMP_LTZ rejected."""
    got = env.execute_sql("""
        SELECT
          ARRAY_SLICE(ARRAY[1,2,3,4,5], 2, -1) AS neg_end,
          ARRAY_SLICE(ARRAY[1,2,3,4,5], -3, 4) AS neg_start,
          JSON_OBJECT(KEY 'n' VALUE JSON_OBJECT(KEY 'v' VALUE 42)) AS nested_obj,
          JSON_ARRAY(JSON_ARRAY(1)) AS nested_arr,
          JSON_ARRAY('a', 1) AS mixed,
          JSON_OBJECT('my value key' VALUE 'v') AS kv_lit,
          (TIMESTAMP '2024-01-01 03:00:00', TIMESTAMP '2024-01-01 03:00:00')
            OVERLAPS
          (TIMESTAMP '2024-01-01 01:00:00', TIMESTAMP '2024-01-01 05:00:00') AS point_in,
          'null' IS JSON AS null_lit,
          CAST(NULL AS STRING) IS JSON AS null_op,
          CAST(NULL AS STRING) IS NOT JSON AS null_op_neg,
          'payload IS JSON' AS lit1,
          'use STR_TO_MAP(a=1)' AS lit2
    """).collect()[0]
    assert got.neg_end == [2, 3, 4, 5]
    assert got.neg_start == [3, 4]
    assert got.nested_obj == '{"n":{"v":42}}'
    assert got.nested_arr == "[[1]]"
    assert got.mixed == '["a",1]'
    assert got.kv_lit == '{"my value key":"v"}'
    assert got.point_in is True
    assert got.null_lit is True
    assert got.null_op is None and got.null_op_neg is None
    assert got.lit1 == "payload IS JSON"
    assert got.lit2 == "use STR_TO_MAP(a=1)"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="precision"):
        env.execute_sql("SELECT TO_TIMESTAMP_LTZ(1700000000000) AS x")


def test_overlaps_scan_edges(env):
    """The scan-based OVERLAPS matcher: operands with top-level commas
    inside nested calls (the case the regex form could not match),
    call argument lists and identifier-prefixed groups left intact,
    and unmatched parens after the keyword degrade to a no-op instead
    of raising."""
    from flink_1_20_spark.sql_flink import rewrite_flink_builtins

    got = env.execute_sql("""
        SELECT (timestampadd(MINUTE, 10 + 20, TIMESTAMP '2024-01-01 00:00:00'),
                timestampadd(HOUR, 2, TIMESTAMP '2024-01-01 00:00:00'))
               OVERLAPS
               (TIMESTAMP '2024-01-01 01:00:00',
                timestampadd(MINUTE, 30, TIMESTAMP '2024-01-01 01:00:00')) AS x
    """).collect()[0]
    assert got.x is True  # 00:30-02:00 vs 01:00-01:30
    # a call's 2-arg list before the keyword is NOT a row constructor
    s = rewrite_flink_builtins("SELECT foo(a,b) OVERLAPS (c,d) FROM t")
    assert "foo(a,b)" in s and "least" not in s
    # unmatched '(' after the keyword (comment text): no crash, no edit
    frag = "SELECT x FROM t -- (a,b) OVERLAPS (see docs\nWHERE x > 1"
    assert rewrite_flink_builtins(frag) == frag


def test_array_slice_end_zero_normalizes_to_one(env):
    """ArraySliceFunction.java normalizes endIndex == 0 to 1: with
    start <= 1 the slice keeps the first element; with start > 1 the
    range is empty (r8 advice fix — the rewrite previously computed a
    zero length and always returned [])."""
    got = env.execute_sql("""
        SELECT ARRAY_SLICE(ARRAY[1,2,3,4], 1, 0) AS from1,
               ARRAY_SLICE(ARRAY[1,2,3,4], -4, 0) AS from_neg,
               ARRAY_SLICE(ARRAY[1,2,3,4], 2, 0) AS from2,
               ARRAY_SLICE(ARRAY[1,2,3,4], 1, -5) AS neg_to_zero
    """).collect()[0]
    assert got.from1 == [1]
    assert got.from_neg == [1]
    assert got.from2 == []
    # negative ends normalize BEFORE the 0 -> 1 rule: -5 + (4+1) = 0 -> 1
    assert got.neg_to_zero == [1]


def test_builtin_function_sweep_residuals(env):
    """r8 closure of the BuiltInFunctionDefinitions diff residuals:
    the JSON aggregate forms with their ON NULL variants (ABSENT is the
    JSON_ARRAYAGG default, NULL the JSON_OBJECTAGG default), SHA224 via
    Spark's sha2 family, ELEMENT's 0/1-element contract (the >1 error
    degrades to NULL — documented), CURRENT_ROW_TIMESTAMP (per-query in
    Spark — documented drift), and native passthroughs COT / TYPEOF /
    MAP_ENTRIES."""
    got = env.execute_sql("""
      SELECT JSON_ARRAYAGG(v) AS j_absent,
             JSON_ARRAYAGG(v NULL ON NULL) AS j_null,
             JSON_OBJECTAGG(KEY k VALUE v) AS o_null,
             JSON_OBJECTAGG(k VALUE v ABSENT ON NULL) AS o_absent
      FROM (VALUES ('a', 1),('b', 2),('c', CAST(NULL AS INT))) t(k, v)
    """).collect()[0]
    assert got.j_absent == "[1,2]"
    assert got.j_null == "[1,2,null]"
    assert got.o_null == '{"a":1,"b":2,"c":null}'
    assert got.o_absent == '{"a":1,"b":2}'
    got = env.execute_sql("""
      SELECT SHA224('x') AS h,
             ELEMENT(ARRAY[7]) AS e1,
             ELEMENT(ARRAY[1,2]) AS e_many,
             COT(1.0) AS c,
             TYPEOF(1) AS ty,
             MAP_ENTRIES(MAP['a',1]) AS me,
             CURRENT_ROW_TIMESTAMP() IS NOT NULL AS crt
    """).collect()[0]
    import hashlib

    assert got.h == hashlib.sha224(b"x").hexdigest()
    assert got.e1 == 7 and got.e_many is None
    assert abs(got.c - 0.6420926159343306) < 1e-12
    assert got.ty == "int"
    assert got.me == [("a", 1)]
    assert got.crt is True
