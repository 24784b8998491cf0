"""Flink-SQL DDL surface: CREATE TABLE ... WITH (connector) executes
against the mapped Spark connectors (TableEnvironmentImpl.executeSql
parity for the §3.1 glue layer)."""

from __future__ import annotations

import os

import pytest

from flink_1_20_spark.sql_ddl import TableEnvironment, flink_type_to_spark


def test_flink_type_mapping():
    assert flink_type_to_spark("STRING") == "string"
    assert flink_type_to_spark("TIMESTAMP(3)") == "timestamp"
    assert flink_type_to_spark("TIMESTAMP_LTZ(3)") == "timestamp"
    assert flink_type_to_spark("TIMESTAMP(3) WITH LOCAL TIME ZONE") == "timestamp"
    assert flink_type_to_spark("DECIMAL(10, 2)") == "decimal(10,2)"
    assert flink_type_to_spark("VARCHAR(255)") == "string"
    assert flink_type_to_spark("BYTES") == "binary"
    assert flink_type_to_spark("ARRAY<INT>") == "array<int>"
    assert flink_type_to_spark("MAP<STRING, DOUBLE>") == "map<string,double>"
    assert flink_type_to_spark("ROW<a INT, b STRING>") == "struct<a:int,b:string>"
    assert flink_type_to_spark("INT NOT NULL") == "int"
    with pytest.raises(ValueError):
        flink_type_to_spark("GEOMETRY")


def test_create_filesystem_table_and_query(spark, tmp_path):
    src = tmp_path / "users.csv"
    src.write_text("uid,name,score\n1,ada,9.5\n2,bob,7.25\n3,eve,8.0\n")
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE users (
            uid BIGINT,
            name STRING,
            score DOUBLE,
            grade AS CASE WHEN score >= 8 THEN 'A' ELSE 'B' END,
            PRIMARY KEY (uid) NOT ENFORCED
        ) WITH (
            'connector' = 'filesystem',
            'path' = '{src}',
            'format' = 'csv'
        )
    """)
    rows = env.execute_sql(
        "SELECT grade, count(*) AS n FROM users GROUP BY grade ORDER BY grade"
    ).collect()
    assert [(r["grade"], r["n"]) for r in rows] == [("A", 2), ("B", 1)]
    assert env.tables["users"].primary_key == ["uid"]


def test_insert_into_filesystem_roundtrip(spark, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text("k,v\n1,10\n2,20\n")
    out = str(tmp_path / "out_parquet")
    env = TableEnvironment(spark)
    env.execute_sql(
        f"CREATE TABLE src (k BIGINT, v BIGINT) WITH ("
        f"'connector'='filesystem','path'='{src}','format'='csv')"
    )
    env.execute_sql(
        f"CREATE TABLE dst (k BIGINT, doubled BIGINT) WITH ("
        f"'connector'='filesystem','path'='{out}','format'='parquet')"
    )
    env.execute_sql("INSERT INTO dst SELECT k, v * 2 AS doubled FROM src")
    rows = env.execute_sql("SELECT k, doubled FROM dst ORDER BY k").collect()
    assert [(r.k, r.doubled) for r in rows] == [(1, 20), (2, 40)]
    assert os.path.isdir(out)


def test_datagen_and_watermark(spark):
    env = TableEnvironment(spark)
    env.execute_sql("""
        CREATE TABLE gen (
            WATERMARK FOR timestamp AS timestamp - INTERVAL '5' SECOND
        ) WITH ('connector' = 'datagen', 'rows-per-second' = '5')
    """)
    df = spark.table("gen")
    assert df.isStreaming


def test_blackhole_and_print_sinks(spark, tmp_path, capsys):
    src = tmp_path / "s.csv"
    src.write_text("x\n1\n2\n")
    env = TableEnvironment(spark)
    env.execute_sql(
        f"CREATE TABLE s (x BIGINT) WITH ("
        f"'connector'='filesystem','path'='{src}','format'='csv')"
    )
    env.execute_sql("CREATE TABLE sink_bh (x BIGINT) WITH ('connector'='blackhole')")
    env.execute_sql("CREATE TABLE sink_p (x BIGINT) WITH ('connector'='print')")
    env.execute_sql("INSERT INTO sink_bh SELECT x FROM s")
    env.execute_sql("INSERT INTO sink_p SELECT x FROM s ORDER BY x")
    assert "+I[1]" in capsys.readouterr().out

    with pytest.raises(ValueError, match="factory"):
        env.execute_sql(
            "CREATE TABLE k (x INT) WITH ('connector'='kafka')"
        )


def test_streaming_insert_into_blackhole(spark):
    """INSERT INTO a sink from a streaming (datagen) table starts a
    continuous query — executeSql's TableResult-with-running-job
    behavior."""
    env = TableEnvironment(spark)
    env.execute_sql(
        "CREATE TABLE g2 (x BIGINT) WITH "
        "('connector'='datagen','rows-per-second'='50')"
    )
    env.execute_sql("CREATE TABLE bh2 (x BIGINT) WITH ('connector'='blackhole')")
    q = env.execute_sql("INSERT INTO bh2 SELECT value AS x FROM g2")
    try:
        assert q is not None and q.isActive
    finally:
        q.stop()


def test_statement_set_multi_sink(spark, tmp_path):
    """One source fanned out to two filesystem sinks in a statement set
    (EXECUTE STATEMENT SET): both sinks written, source scanned once
    (persisted for the set's duration)."""
    src = tmp_path / "ss.csv"
    src.write_text("k,v\n1,5\n2,50\n3,500\n")
    out_a, out_b = str(tmp_path / "a_pq"), str(tmp_path / "b_pq")
    env = TableEnvironment(spark)
    env.execute_sql(
        f"CREATE TABLE ss_src (k BIGINT, v BIGINT) WITH ("
        f"'connector'='filesystem','path'='{src}','format'='csv')"
    )
    env.execute_sql(
        f"CREATE TABLE ss_a (k BIGINT, v BIGINT) WITH ("
        f"'connector'='filesystem','path'='{out_a}','format'='parquet')"
    )
    env.execute_sql(
        f"CREATE TABLE ss_b (k BIGINT, big BIGINT) WITH ("
        f"'connector'='filesystem','path'='{out_b}','format'='parquet')"
    )
    env.execute_statement_set([
        "INSERT INTO ss_a SELECT k, v FROM ss_src WHERE v < 100",
        "INSERT INTO ss_b SELECT k, v AS big FROM ss_src WHERE v >= 100",
    ])
    assert env.execute_sql("SELECT count(*) AS n FROM ss_a").collect()[0].n == 2
    assert env.execute_sql("SELECT count(*) AS n FROM ss_b").collect()[0].n == 1


def test_drop_table(spark, tmp_path):
    src = tmp_path / "d.csv"
    src.write_text("x\n1\n")
    env = TableEnvironment(spark)
    env.execute_sql(
        f"CREATE TABLE dropme (x BIGINT) WITH ("
        f"'connector'='filesystem','path'='{src}','format'='csv')"
    )
    env.execute_sql("DROP TABLE dropme")
    assert "dropme" not in env.tables
    env.execute_sql("DROP TABLE IF EXISTS dropme")  # no error


# ---------------------------------------------------------------- dialect
# Flink-SQL window TVFs + MATCH_RECOGNIZE parsed onto the library
# operators (FlinkSqlOperatorTable.java:1296-1299, StreamExecMatch.java:59).
# Each statement's result must match the hand-written, oracle-verified
# library query on the same data.


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def fixture_env(spark, sf_dir):
    from flink_1_20_spark.catalog import register_views

    register_views(spark, sf_dir)
    return TableEnvironment(spark)


def test_sql_tumble_tvf(fixture_env, spark, sf_dir):
    from flink_1_20_spark.queries.window_tvf import wtvf_tumble

    got = fixture_env.execute_sql("""
        SELECT window_start, window_end, event_type,
               count(*) AS n_events,
               round(sum(`value`), 4) AS total_value
        FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        GROUP BY window_start, window_end, event_type
    """)
    want = wtvf_tumble(spark, sf_dir)
    cols = ["window_start", "window_end", "event_type", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_sql_hop_tvf(fixture_env, spark, sf_dir):
    from flink_1_20_spark.queries.window_tvf import wtvf_hop

    got = fixture_env.execute_sql("""
        SELECT window_start, window_end,
               count(*) AS n_events, round(sum(`value`), 4) AS total_value
        FROM TABLE(HOP(TABLE events, DESCRIPTOR(ts), INTERVAL '15' MINUTES, INTERVAL '1' HOUR))
        GROUP BY window_start, window_end
    """)
    want = wtvf_hop(spark, sf_dir)
    cols = ["window_start", "window_end", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_sql_cumulate_tvf(fixture_env, spark, sf_dir):
    from flink_1_20_spark.queries.window_tvf import wtvf_cumulate

    got = fixture_env.execute_sql("""
        SELECT window_start, window_end,
               count(*) AS n_events, round(sum(`value`), 4) AS total_value
        FROM TABLE(CUMULATE(TABLE events, DESCRIPTOR(ts), INTERVAL '15' MINUTES, INTERVAL '1' HOUR))
        GROUP BY window_start, window_end
    """)
    want = wtvf_cumulate(spark, sf_dir)
    cols = ["window_start", "window_end", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_sql_session_tvf(fixture_env, spark, sf_dir):
    from flink_1_20_spark.queries.window_tvf import wtvf_session

    got = fixture_env.execute_sql("""
        SELECT user_id, window_start AS session_start, window_end AS session_end,
               count(*) AS n_events, round(sum(`value`), 4) AS total_value
        FROM TABLE(SESSION(TABLE events PARTITION BY user_id, DESCRIPTOR(ts), INTERVAL '10' MINUTES))
        GROUP BY user_id, window_start, window_end
    """)
    want = wtvf_session(spark, sf_dir)
    cols = ["user_id", "session_start", "session_end", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_sql_window_time_column(fixture_env):
    rows = fixture_env.execute_sql("""
        SELECT DISTINCT window_end, window_time
        FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        LIMIT 5
    """).collect()
    for r in rows:  # rowtime convention: window_time = window_end - 1ms
        assert (r.window_end - r.window_time).total_seconds() == 0.001


def test_sql_match_recognize_funnel(fixture_env, spark, sf_dir):
    from flink_1_20_spark.queries.temporal_cep import cep_funnel_strict

    got = fixture_env.execute_sql("""
        SELECT user_id, start_ts, end_ts, round(purchase_value, 4) AS purchase_value
        FROM events MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES
                FIRST(A.ts) AS start_ts,
                C.ts AS end_ts,
                C.`value` AS purchase_value
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A B C)
            DEFINE
                A AS A.event_type = 'click',
                B AS B.event_type = 'view',
                C AS C.event_type = 'purchase'
        ) AS m
    """)
    want = cep_funnel_strict(spark, sf_dir)
    cols = ["user_id", "start_ts", "end_ts", "purchase_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_sql_match_recognize_quantified(fixture_env):
    """B+ with WITHIN and COUNT measure parses and runs (error-burst
    shape: >=2 consecutive errors; strict_repeat + within pruning)."""
    rows = fixture_env.execute_sql("""
        SELECT user_id, n_err
        FROM events MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES COUNT(E.*) AS n_err
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (E{2,}) WITHIN INTERVAL '30' MINUTES
            DEFINE E AS E.event_type = 'error'
        )
    """).collect()
    for r in rows:
        assert r.n_err >= 2


def test_sql_match_recognize_cross_var_define(fixture_env, spark):
    """Cross-variable DEFINE (IterativeCondition): B compares against
    the row bound to A — the canonical V-shape CEP condition. Verified
    against the strict-contiguity lead() rewrite."""
    got = fixture_env.execute_sql("""
        SELECT user_id, start_ts, dip, rebound
        FROM events MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES A.ts AS start_ts,
                     B.`value` AS dip,
                     C.`value` AS rebound
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (A B C)
            DEFINE A AS A.event_type = 'click',
                   B AS B.`value` < A.`value`,
                   C AS C.`value` > LAST(B.`value`)
        ) AS m
    """)
    want = spark.sql("""
        WITH seq AS (
            SELECT user_id, ts, event_id, event_type, `value`,
                   lead(`value`, 1) OVER w AS v1,
                   lead(`value`, 2) OVER w AS v2
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, ts AS start_ts, v1 AS dip, v2 AS rebound
        FROM seq
        WHERE event_type = 'click' AND v1 < `value` AND v2 > v1
    """)
    cols = ["user_id", "start_ts", "dip", "rebound"]
    assert _rows(got, cols) == _rows(want, cols)
    assert got.count() > 0  # non-vacuous on the fixture


def test_sql_match_recognize_reluctant_vs_greedy(spark):
    """B+? must bind the MINIMAL run (Quantifier.java consumingStrategy)
    where B+ binds the maximal — the r12 match_varlen fuzz shape caught
    _match_at resolving reluctant steps greedily under the single-match
    skip strategies (B+? behaved exactly like B+)."""
    from flink_1_20_spark.sql_ddl import TableEnvironment

    spark.createDataFrame(
        [(f"2024-01-01 10:0{i}:00", 1, v) for i, v in
         enumerate([10, 4, 6, 12])],
        "ts string, user_id bigint, v bigint",
    ).selectExpr("CAST(ts AS TIMESTAMP) AS ts", "user_id", "v"
                 ).createOrReplaceTempView("mr_rel_src")
    env = TableEnvironment(spark)

    def run(quant):
        return [
            (r.a_v, r.b_last, r.c_v)
            for r in env.execute_sql(f"""
                SELECT a_v, b_last, c_v
                FROM mr_rel_src MATCH_RECOGNIZE (
                    PARTITION BY user_id ORDER BY ts
                    MEASURES A.v AS a_v, LAST(B.v) AS b_last, C.v AS c_v
                    ONE ROW PER MATCH
                    AFTER MATCH SKIP TO NEXT ROW
                    PATTERN (A {quant} C)
                    DEFINE A AS A.v % 5 = 0, B AS B.v % 2 = 0,
                           C AS C.v % 3 = 0
                ) AS m
            """).collect()
        ]

    # greedy backtracks from the maximal run: B+ = {4, 6}, C = 12
    assert run("B+") == [(10, 6, 12)]
    # reluctant takes the minimal: B+? = {4}, C = 6
    assert run("B+?") == [(10, 4, 6)]


def test_sql_legacy_group_windows(fixture_env, spark, sf_dir):
    """Gen-1 syntax: GROUP BY TUMBLE(ts, ...) + TUMBLE_START/END
    (FlinkSqlOperatorTable.java:1003) — same results as the TVF form."""
    from flink_1_20_spark.queries.window_tvf import wtvf_session, wtvf_tumble

    got = fixture_env.execute_sql("""
        SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS window_start,
               TUMBLE_END(ts, INTERVAL '1' HOUR) AS window_end,
               event_type,
               count(*) AS n_events,
               round(sum(`value`), 4) AS total_value
        FROM events
        GROUP BY TUMBLE(ts, INTERVAL '1' HOUR), event_type
    """)
    want = wtvf_tumble(spark, sf_dir)
    cols = ["window_start", "window_end", "event_type", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)

    got_s = fixture_env.execute_sql("""
        SELECT user_id,
               SESSION_START(ts, INTERVAL '10' MINUTES) AS session_start,
               SESSION_END(ts, INTERVAL '10' MINUTES) AS session_end,
               count(*) AS n_events,
               round(sum(`value`), 4) AS total_value
        FROM events
        GROUP BY SESSION(ts, INTERVAL '10' MINUTES), user_id
    """)
    want_s = wtvf_session(spark, sf_dir)
    cols_s = ["user_id", "session_start", "session_end", "n_events", "total_value"]
    assert _rows(got_s, cols_s) == _rows(want_s, cols_s)


def test_sql_legacy_hop_window(fixture_env, spark, sf_dir):
    from flink_1_20_spark.queries.window_tvf import wtvf_hop

    got = fixture_env.execute_sql("""
        SELECT HOP_START(ts, INTERVAL '15' MINUTES, INTERVAL '1' HOUR) AS window_start,
               HOP_END(ts, INTERVAL '15' MINUTES, INTERVAL '1' HOUR) AS window_end,
               count(*) AS n_events,
               round(sum(`value`), 4) AS total_value
        FROM events
        GROUP BY HOP(ts, INTERVAL '15' MINUTES, INTERVAL '1' HOUR)
    """)
    want = wtvf_hop(spark, sf_dir)
    cols = ["window_start", "window_end", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_sql_create_view_with_dialect(fixture_env):
    """CREATE VIEW over a Flink-dialect body, queried downstream."""
    fixture_env.execute_sql("""
        CREATE VIEW hourly AS
        SELECT window_start, count(*) AS n
        FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        GROUP BY window_start
    """)
    total = fixture_env.execute_sql(
        "SELECT sum(n) AS total FROM hourly"
    ).collect()[0].total
    n_events = fixture_env.execute_sql(
        "SELECT count(*) AS c FROM events"
    ).collect()[0].c
    assert total == n_events
    fixture_env.execute_sql("DROP VIEW hourly")


def test_sql_tumble_tvf_on_streaming_table(spark):
    """The dialect surface is streaming-capable: a TVF window over a
    datagen (rate) table produces a streaming aggregation that runs
    (StreamExecWindowTableFunction parity on the unbounded side)."""
    import time

    from flink_1_20_spark.streaming.sinks import run_to_memory

    env = TableEnvironment(spark)
    env.execute_sql("""
        CREATE TABLE rates (x BIGINT) WITH (
            'connector' = 'datagen', 'rows-per-second' = '200')
    """)
    df = env.execute_sql("""
        SELECT window_start, window_end, count(*) AS n
        FROM TABLE(TUMBLE(TABLE rates, DESCRIPTOR(timestamp), INTERVAL '1' SECOND))
        GROUP BY window_start, window_end
    """)
    assert df.isStreaming
    q = run_to_memory(df, "tvf_stream_out", output_mode="update")
    try:
        deadline = time.time() + 30
        rows = []
        while time.time() < deadline and not rows:
            q.processAllAvailable()
            rows = spark.table("tvf_stream_out").collect()
            if not rows:
                time.sleep(0.5)
    finally:
        q.stop()
    assert rows, "streaming TVF window produced no rows"
    for r in rows:
        assert (r.window_end - r.window_start).total_seconds() == 1.0
        assert r.n >= 1
    env.execute_sql("DROP TABLE rates")


def test_sql_insert_with_dialect_body(fixture_env, spark, tmp_path):
    """INSERT INTO a filesystem sink with a window-TVF body — the full
    Flink script shape: DDL sink + dialect DML in one statement."""
    out = str(tmp_path / "hourly_pq")
    fixture_env.execute_sql(f"""
        CREATE TABLE hourly_sink (window_start TIMESTAMP(3), n BIGINT)
        WITH ('connector' = 'filesystem', 'path' = '{out}',
              'format' = 'parquet')
    """)
    fixture_env.execute_sql("""
        INSERT INTO hourly_sink
        SELECT window_start, count(*) AS n
        FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        GROUP BY window_start
    """)
    total = fixture_env.execute_sql(
        "SELECT sum(n) AS t FROM hourly_sink"
    ).collect()[0].t
    n_events = spark.table("events").count()
    assert total == n_events
    fixture_env.execute_sql("DROP TABLE hourly_sink")


def test_sql_tvf_plan_no_extra_shuffle(fixture_env, spark, sf_dir):
    """The TUMBLE TVF rewrite must produce the same shuffle count as the
    hand-written library query — the lowering is a pure syntax
    transform, not a plan regression (one exchange on the grouping
    key)."""
    from flink_1_20_spark.queries.window_tvf import wtvf_tumble

    def final_plan(df):
        df.collect()
        return df._jdf.queryExecution().executedPlan().toString()

    got = fixture_env.execute_sql("""
        SELECT window_start, window_end, event_type,
               count(*) AS n_events
        FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        GROUP BY window_start, window_end, event_type
    """)
    want = wtvf_tumble(spark, sf_dir)
    n_got = final_plan(got).count("Exchange")
    n_want = final_plan(want).count("Exchange")
    assert n_got <= n_want, (n_got, n_want)


def test_sql_streaming_insert_with_tvf_body(spark):
    """Full Flink streaming script shape: datagen source, window-TVF
    aggregation, INSERT INTO a blackhole sink — the statement returns a
    running StreamingQuery (TableResult.getJobClient analogue)."""
    env = TableEnvironment(spark)
    env.execute_sql("""
        CREATE TABLE r2 (x BIGINT) WITH (
            'connector' = 'datagen', 'rows-per-second' = '100')
    """)
    env.execute_sql("CREATE TABLE bh_tvf (ws TIMESTAMP(3), n BIGINT) WITH ('connector'='blackhole')")
    q = env.execute_sql("""
        INSERT INTO bh_tvf
        SELECT window_start AS ws, count(*) AS n
        FROM TABLE(TUMBLE(TABLE r2, DESCRIPTOR(timestamp), INTERVAL '1' SECOND))
        GROUP BY window_start
    """)
    try:
        assert q.isActive
        q.processAllAvailable()
    finally:
        q.stop()
    env.execute_sql("DROP TABLE bh_tvf")
    env.execute_sql("DROP TABLE r2")


def test_sql_match_recognize_all_rows(fixture_env, spark):
    """ALL ROWS PER MATCH: every matched row is emitted with
    CLASSIFIER() / MATCH_NUMBER() and RUNNING-semantics measures."""
    got = fixture_env.execute_sql("""
        SELECT user_id, event_id, cls, mno, run_last
        FROM events MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES
                CLASSIFIER() AS cls,
                MATCH_NUMBER() AS mno,
                LAST(B.`value`) AS run_last
            ALL ROWS PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A B)
            DEFINE A AS A.event_type = 'click',
                   B AS B.event_type = 'view'
        )
    """).collect()
    assert got, "no matched rows"
    by_match = {}
    for r in got:
        by_match.setdefault((r.user_id, r.mno), []).append(r)
    for (_, _), rows in by_match.items():
        assert [r.cls for r in rows] == ["A", "B"]  # strict 2-step match
        a, b = rows
        assert a.run_last is None  # RUNNING: B unbound at the A row
        assert b.run_last is not None

    # one-row mode count must equal the number of distinct matches
    one = fixture_env.execute_sql("""
        SELECT user_id FROM events MATCH_RECOGNIZE (
            PARTITION BY user_id ORDER BY ts, event_id
            MEASURES A.ts AS t ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A B)
            DEFINE A AS A.event_type = 'click', B AS B.event_type = 'view'
        )
    """).count()
    assert one == len(by_match)


def test_sql_match_recognize_prev_navigation(fixture_env, spark):
    """PREV() physical-offset navigation (the tick-decline idiom):
    D+ where each D is strictly below the previous physical row."""
    spark.createDataFrame(
        [("x", 1, 10.0), ("x", 2, 9.0), ("x", 3, 8.0), ("x", 4, 11.0),
         ("y", 1, 5.0), ("y", 2, 7.0)],
        "sym string, seq bigint, price double",
    ).createOrReplaceTempView("ticks")
    rows = fixture_env.execute_sql("""
        SELECT sym, p0, p1, n
        FROM ticks MATCH_RECOGNIZE (
            PARTITION BY sym
            ORDER BY seq
            MEASURES FIRST(D.price) AS p0,
                     LAST(D.price) AS p1,
                     COUNT(D.price) AS n
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (D{2,})
            DEFINE D AS D.price < PREV(D.price)
        )
    """).collect()
    # only x has a >=2-row strict decline: 9 (below 10), 8 (below 9)
    assert [(r.sym, r.p0, r.p1, r.n) for r in rows] == [("x", 9.0, 8.0, 2)]


def test_sql_insert_overwrite_and_explain(fixture_env, spark, tmp_path):
    out = str(tmp_path / "ow_pq")
    fixture_env.execute_sql(f"""
        CREATE TABLE ow (k BIGINT, v BIGINT) WITH (
            'connector'='filesystem', 'path'='{out}', 'format'='parquet')
    """)
    fixture_env.execute_sql("INSERT INTO ow SELECT 1 AS k, 10 AS v")
    fixture_env.execute_sql("INSERT INTO ow SELECT 2 AS k, 20 AS v")
    assert fixture_env.execute_sql("SELECT count(*) AS n FROM ow").collect()[0].n == 2
    # OVERWRITE replaces the table contents (Flink batch INSERT OVERWRITE)
    fixture_env.execute_sql("INSERT OVERWRITE ow SELECT 3 AS k, 30 AS v")
    rows = fixture_env.execute_sql("SELECT k, v FROM ow").collect()
    assert [(r.k, r.v) for r in rows] == [(3, 30)]
    fixture_env.execute_sql("DROP TABLE ow")

    # EXPLAIN over a dialect body parses and returns a plan row
    plan = fixture_env.execute_sql("""
        EXPLAIN PLAN FOR
        SELECT window_start, count(*) AS n
        FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        GROUP BY window_start
    """).collect()
    assert plan and "Aggregate" in plan[0][0]


def test_sql_match_recognize_multiword_literal(fixture_env):
    """A DEFINE condition with a multi-word string literal must not have
    its interior rewritten to column refs (literals are masked before
    the SQL->predicate translation)."""
    rows = fixture_env.execute_sql("""
        SELECT user_id FROM events MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES A.ts AS t
            ONE ROW PER MATCH
            PATTERN (A)
            DEFINE A AS A.event_type = 'add to cart'
        )
    """).collect()
    assert rows == []  # no such event type, but it parses and runs


def test_sql_match_recognize_last_is_null(fixture_env):
    """LAST(X.col) IS NULL is valid Flink SQL: the IS NULL rewrite runs
    before navigation rewrites so call-form operands translate."""
    rows = fixture_env.execute_sql("""
        SELECT user_id, n FROM events MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES COUNT(A.*) AS n
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A B)
            DEFINE A AS A.event_type = 'click',
                   B AS LAST(B.`value`) IS NULL OR B.`value` >= 0
        )
    """).collect()
    assert len(rows) > 0


def test_sql_match_recognize_rejects_function_calls(fixture_env):
    """The reference's MATCH_RECOGNIZE surface is pure SQL with no
    code-execution path — an unknown function call in DEFINE is a parse
    error, never Python that runs."""
    with pytest.raises(Exception, match="unsupported function"):
        fixture_env.execute_sql("""
            SELECT user_id FROM events MATCH_RECOGNIZE (
                PARTITION BY user_id
                ORDER BY ts, event_id
                MEASURES A.ts AS t
                ONE ROW PER MATCH
                PATTERN (A)
                DEFINE A AS __import__('os').getpid() = 0
            )
        """).collect()


# ----------------------------------------- CREATE FUNCTION / SHOW / DESCRIBE


def test_create_function_pandas_udf(fixture_env, spark, sf_dir):
    """CREATE TEMPORARY FUNCTION registering a pandas UDF by python
    path, used from SQL — result matches the udx_pandas_scalar oracle
    expression evaluated inline."""
    fixture_env.execute_sql(
        "CREATE TEMPORARY FUNCTION my_score AS "
        "'flink_1_20_spark.functions.udfs.score_udf'"
    )
    got = fixture_env.execute_sql("""
        SELECT event_id, my_score(`value`, event_type) AS score
        FROM events WHERE event_id <= 200
    """)
    want = fixture_env.execute_sql("""
        SELECT event_id, round(`value` * 0.5 + length(event_type), 6) AS score
        FROM events WHERE event_id <= 200
    """)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_create_function_eval_class_and_callable(fixture_env):
    fixture_env.execute_sql(
        "CREATE FUNCTION tagged_len AS "
        "'flink_1_20_spark.functions.udfs.TaggedLength'"
    )
    fixture_env.execute_sql(
        "CREATE TEMPORARY SYSTEM FUNCTION clip AS "
        "'flink_1_20_spark.functions.udfs.clip_value' LANGUAGE PYTHON"
    )
    rows = fixture_env.execute_sql(
        "SELECT tagged_len(event_type) AS n, clip(`value` * 1000) AS c "
        "FROM events WHERE event_id = 1"
    ).collect()
    assert len(rows) == 1
    assert isinstance(rows[0]["n"], int) and rows[0]["n"] > 0
    assert 0.0 <= rows[0]["c"] <= 100.0


def test_create_function_udtf(fixture_env):
    fixture_env.execute_sql(
        "CREATE TEMPORARY FUNCTION split_words AS "
        "'flink_1_20_spark.functions.udfs.SplitWords'"
    )
    rows = fixture_env.execute_sql(
        "SELECT * FROM split_words('a bb ccc')"
    ).collect()
    assert [(r.word, r.idx) for r in rows] == [("a", 0), ("bb", 1), ("ccc", 2)]


def test_show_and_describe(fixture_env, spark, tmp_path):
    src = tmp_path / "t.csv"
    src.write_text("a,b\n1,2\n")
    fixture_env.execute_sql(f"""
        CREATE TABLE show_me (
            a BIGINT, b BIGINT,
            c AS a + b,
            PRIMARY KEY (a) NOT ENFORCED
        ) WITH ('connector'='filesystem','path'='{src}','format'='csv')
    """)
    tables = [r.table_name for r in fixture_env.execute_sql("SHOW TABLES").collect()]
    assert "show_me" in tables and "events" in tables
    fixture_env.execute_sql(
        "CREATE TEMPORARY FUNCTION fn_one AS "
        "'flink_1_20_spark.functions.udfs.clip_value'"
    )
    fns = [r.function_name for r in fixture_env.execute_sql("SHOW FUNCTIONS").collect()]
    assert "fn_one" in fns
    fixture_env.execute_sql("DROP FUNCTION fn_one")
    fns = [r.function_name for r in fixture_env.execute_sql("SHOW FUNCTIONS").collect()]
    assert "fn_one" not in fns
    desc = {r.name: r for r in fixture_env.execute_sql("DESCRIBE show_me").collect()}
    assert desc["a"].key == "PRI(NOT ENFORCED)"
    assert desc["c"].type == "COMPUTED" and desc["c"].extras == "AS a + b"
    # DESCRIBE of a plain registered view falls back to the Spark schema
    desc2 = {r.name: r.type for r in fixture_env.execute_sql("DESCRIBE events").collect()}
    assert desc2["event_id"] == "bigint"


def test_sql_window_join_two_tvfs(fixture_env, spark, sf_dir):
    """Window join through the dialect (StreamExecWindowJoin.java:69):
    two TVF-windowed tables joined on (key, window_start, window_end) in
    ONE executeSql statement — result equals the join_window library
    oracle (same per-hour view x purchase pairing)."""
    from flink_1_20_spark.queries.joins import join_window

    got = fixture_env.execute_sql("""
        SELECT l.window_start AS w_start, l.user_id,
               count(*) AS n_pairs
        FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR)) l
        JOIN TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR)) r
        ON l.user_id = r.user_id AND l.window_start = r.window_start
           AND l.window_end = r.window_end
        WHERE l.event_type = 'view' AND r.event_type = 'purchase'
        GROUP BY l.window_start, l.user_id
    """)
    want = join_window(spark, sf_dir)
    cols = ["w_start", "user_id", "n_pairs"]
    assert _rows(got, cols) == _rows(want, cols)


def test_show_create_and_alter_table(spark, tmp_path):
    src = tmp_path / "alter.csv"
    src.write_text("a,b\n1,2\n3,4\n")
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE alt (a BIGINT, b BIGINT, PRIMARY KEY (a) NOT ENFORCED)
        WITH ('connector'='filesystem','path'='{src}','format'='csv')
    """)
    ddl = env.execute_sql("SHOW CREATE TABLE alt").collect()[0].result
    assert "`a` BIGINT" in ddl and "PRIMARY KEY (`a`) NOT ENFORCED" in ddl
    assert "'connector' = 'filesystem'" in ddl
    # SET an option
    env.execute_sql("ALTER TABLE alt SET ('csv.ignore-parse-errors'='true')")
    assert env.tables["alt"].options["csv.ignore-parse-errors"] == "true"
    # RENAME
    env.execute_sql("ALTER TABLE alt RENAME TO alt2")
    assert "alt2" in env.tables and "alt" not in env.tables
    assert env.execute_sql("SELECT count(*) AS n FROM alt2").collect()[0].n == 2
    # ADD / DROP a column
    env.execute_sql("ALTER TABLE alt2 ADD (c STRING)")
    assert ("c", "string") in env.tables["alt2"].columns
    env.execute_sql("ALTER TABLE alt2 DROP c")
    assert all(c != "c" for c, _ in env.tables["alt2"].columns)


def test_flink_only_hints_are_stripped(fixture_env):
    """OPTIONS(...) dynamic-table-option and LOOKUP(...) hints are
    Flink-only syntax — the dialect strips them; Spark-shared hint
    names (BROADCAST) pass through untouched."""
    rows = fixture_env.execute_sql("""
        SELECT /*+ OPTIONS('scan.startup.mode'='earliest-offset') */
               count(*) AS n FROM events
    """).collect()
    assert rows[0].n > 0
    rows2 = fixture_env.execute_sql("""
        SELECT /*+ LOOKUP('table'='n') */ count(*) AS n
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """).collect()
    assert rows2[0].n > 0
    rows3 = fixture_env.execute_sql("""
        SELECT /*+ BROADCAST(c) */ count(*) AS n
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """).collect()
    assert rows3[0].n == rows2[0].n


def test_create_table_like(spark, tmp_path):
    src = tmp_path / "like.csv"
    src.write_text("a,b\n1,2\n3,4\n")
    src2 = tmp_path / "like2.csv"
    src2.write_text("a,b\n5,6\n")
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE base (
            a BIGINT, b BIGINT,
            c AS a + b,
            PRIMARY KEY (a) NOT ENFORCED
        ) WITH ('connector'='filesystem','path'='{src}','format'='csv')
    """)
    # inherit schema + computed + pk, overwrite the path option
    env.execute_sql(f"""
        CREATE TABLE derived WITH ('path'='{src2}')
        LIKE base (OVERWRITING OPTIONS)
    """)
    meta = env.tables["derived"]
    assert meta.primary_key == ["a"] and meta.computed == [("c", "a + b")]
    rows = env.execute_sql("SELECT a, b, c FROM derived").collect()
    assert [(r.a, r.b, r.c) for r in rows] == [(5, 6, 11)]
    # EXCLUDING strips the copied features; extra column appends
    env.execute_sql(f"""
        CREATE TABLE bare (d BIGINT) WITH ('path'='{src2}')
        LIKE base (EXCLUDING CONSTRAINTS, EXCLUDING GENERATED)
    """)
    m2 = env.tables["bare"]
    assert m2.primary_key == [] and m2.computed == []
    assert ("d", "bigint") in m2.columns


def test_databases_use_and_qualified_names(spark, tmp_path):
    a = tmp_path / "a.csv"
    a.write_text("x\n1\n2\n")
    b = tmp_path / "b.csv"
    b.write_text("x\n10\n")
    env = TableEnvironment(spark)
    env.execute_sql("CREATE DATABASE marketing")
    dbs = [r.database_name for r in env.execute_sql("SHOW DATABASES").collect()]
    assert dbs == ["default_database", "marketing"]
    env.execute_sql(f"""
        CREATE TABLE t (x BIGINT)
        WITH ('connector'='filesystem','path'='{a}','format'='csv')
    """)
    env.execute_sql("USE marketing")
    assert env.execute_sql("SHOW CURRENT DATABASE").collect()[0][0] == "marketing"
    env.execute_sql(f"""
        CREATE TABLE t (x BIGINT)
        WITH ('connector'='filesystem','path'='{b}','format'='csv')
    """)
    # same unqualified name, two databases: current resolves to marketing
    assert env.execute_sql("SELECT sum(x) AS s FROM t").collect()[0].s == 10
    # qualified reference reaches the other database
    got = env.execute_sql(
        "SELECT sum(x) AS s FROM default_database.t"
    ).collect()[0].s
    assert got == 3
    env.execute_sql("USE default_database")
    assert env.execute_sql("SELECT sum(x) AS s FROM t").collect()[0].s == 3
    assert env.execute_sql("SELECT sum(x) AS s FROM marketing.t").collect()[0].s == 10
    # RESTRICT refuses to drop a non-empty db; CASCADE drops it
    with pytest.raises(ValueError, match="not empty"):
        env.execute_sql("DROP DATABASE marketing")
    env.execute_sql("DROP DATABASE marketing CASCADE")
    assert [r.database_name for r in env.execute_sql("SHOW DATABASES").collect()] == [
        "default_database"
    ]


def test_create_table_cdc_format(spark, tmp_path):
    """CREATE TABLE ... WITH ('format'='debezium-json') decodes the CDC
    envelope into a RowKind changelog — the DDL wiring of Flink's
    DebeziumJsonFormatFactory onto the sources/cdc.py decoder."""
    src = tmp_path / "cdc"
    src.mkdir()
    (src / "events.jsonl").write_text(
        '{"op":"c","ts_ms":1,"before":null,"after":{"id":1,"name":"a"}}\n'
        '{"op":"u","ts_ms":2,"before":{"id":1,"name":"a"},"after":{"id":1,"name":"b"}}\n'
        '{"op":"d","ts_ms":3,"before":{"id":1,"name":"b"},"after":null}\n'
    )
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE changes (id BIGINT, name STRING)
        WITH ('connector'='filesystem','path'='{src}','format'='debezium-json')
    """)
    rows = env.execute_sql(
        "SELECT row_kind, id, name FROM changes ORDER BY ts_ms, row_kind"
    ).collect()
    assert [(r.row_kind, r.id, r.name) for r in rows] == [
        ("+I", 1, "a"),
        ("+U", 1, "b"),
        ("-U", 1, "a"),
        ("-D", 1, "b"),
    ]


def test_create_table_cdc_streaming(spark, tmp_path):
    """'scan.streaming'='true' turns the CDC table into a monitored-
    directory changelog stream (FileSource continuous-monitoring mode +
    the CDC decoder)."""
    from flink_1_20_spark.streaming import run_to_memory

    src = tmp_path / "cdcs"
    src.mkdir()
    (src / "b0.jsonl").write_text(
        '{"op":"c","ts_ms":1,"before":null,"after":{"id":1,"name":"a"}}\n'
    )
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE live_changes (id BIGINT, name STRING)
        WITH ('connector'='filesystem','path'='{src}',
              'format'='debezium-json','scan.streaming'='true')
    """)
    stream = spark.table("live_changes")
    assert stream.isStreaming
    q = run_to_memory(stream, "cdc_stream_out", output_mode="append")
    try:
        q.processAllAvailable()
        (src / "b1.jsonl").write_text(
            '{"op":"d","ts_ms":2,"before":{"id":1,"name":"a"},"after":null}\n'
        )
        q.processAllAvailable()
        rows = spark.table("cdc_stream_out").collect()
        kinds = sorted((r.row_kind, r.id) for r in rows)
        assert kinds == [("+I", 1), ("-D", 1)]
    finally:
        q.stop()


def test_changelog_source_retract_aggregation(spark, tmp_path):
    """Retract-aware streaming GROUP BY over a CDC changelog source
    (StreamExecGroupAggregate retract path, ChangelogSourceITCase):
    -U/-D subtract, an update MOVES a row between groups, and a group
    whose live count reaches zero is DELETED from the PK upsert sink
    (GroupAggFunction emits DELETE at count 0)."""
    import json as _json

    src = tmp_path / "clagg"
    src.mkdir()
    out = str(tmp_path / "clagg_out")
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE cl_src (id BIGINT, grp BIGINT, amt BIGINT)
        WITH ('connector'='filesystem','path'='{src}',
              'format'='debezium-json','scan.streaming'='true')
    """)
    env.execute_sql(f"""
        CREATE TABLE cl_sink (grp BIGINT, total BIGINT, cnt BIGINT,
                              PRIMARY KEY (grp) NOT ENFORCED)
        WITH ('connector'='filesystem','path'='{out}','format'='parquet')
    """)
    q = env.execute_sql(
        "INSERT INTO cl_sink SELECT grp, sum(amt) AS total, "
        "count(*) AS cnt FROM cl_src GROUP BY grp"
    )

    def drop(n, ops):
        (src / f"b{n}.jsonl").write_text(
            "\n".join(_json.dumps(o) for o in ops) + "\n"
        )

    def snap():
        return sorted(
            (r.grp, r.total, r.cnt)
            for r in spark.read.parquet(out).collect()
        )

    try:
        drop(0, [
            {"op": "c", "ts_ms": 1, "before": None,
             "after": {"id": 1, "grp": 1, "amt": 10}},
            {"op": "c", "ts_ms": 2, "before": None,
             "after": {"id": 2, "grp": 1, "amt": 5}},
            {"op": "c", "ts_ms": 3, "before": None,
             "after": {"id": 3, "grp": 2, "amt": 7}},
        ])
        q.processAllAvailable()
        assert snap() == [(1, 15, 2), (2, 7, 1)]
        # update moves id=2 from grp 1 to grp 2; delete id=3
        drop(1, [
            {"op": "u", "ts_ms": 4,
             "before": {"id": 2, "grp": 1, "amt": 5},
             "after": {"id": 2, "grp": 2, "amt": 6}},
            {"op": "d", "ts_ms": 5,
             "before": {"id": 3, "grp": 2, "amt": 7}, "after": None},
        ])
        q.processAllAvailable()
        assert snap() == [(1, 10, 1), (2, 6, 1)]
        # full retraction: grp 2's last row deleted -> group DISAPPEARS
        drop(2, [
            {"op": "d", "ts_ms": 6,
             "before": {"id": 2, "grp": 2, "amt": 6}, "after": None},
        ])
        q.processAllAvailable()
        assert snap() == [(1, 10, 1)]
    finally:
        q.stop()
    # bare streaming SELECT agg over a changelog source is silently
    # wrong under plain streaming aggregation -> loud rejection...
    with pytest.raises(ValueError, match="retraction-aware"):
        env.execute_sql("SELECT grp, count(*) FROM cl_src GROUP BY grp")
    # ...unless the query references row_kind (rows-as-data opt-in)
    assert (
        env.execute_sql(
            "SELECT row_kind, count(*) AS n FROM cl_src GROUP BY row_kind"
        ).isStreaming
    )
    # non-decomposable aggregates need retractable accumulators this
    # engine does not keep (MIN/MAX have the multiset path, STDDEV/VAR
    # the signed sum-of-squares path; an HLL sketch genuinely cannot
    # retract — removing an element from the sketch is undefined)
    with pytest.raises(ValueError, match="retractable accumulator"):
        env.execute_sql(
            "INSERT INTO cl_sink SELECT grp, "
            "approx_count_distinct(amt) AS total, "
            "count(*) AS cnt FROM cl_src GROUP BY grp"
        )


def test_changelog_retractable_min_max_avg(spark, tmp_path):
    """Retractable MIN/MAX over a CDC changelog source: the per-group
    multiset state (Flink's Min/MaxWithRetractAggFunction MapState)
    must expose the NEXT-BEST value when the current extreme is
    retracted — the case no signed decomposition can answer.  AVG rides
    along on the same statement (mixed decomposable + multiset
    aggregates share one stateful fold), and a fully-retracted group is
    DELETED from the PK upsert sink."""
    import json as _json

    src = tmp_path / "clmm"
    src.mkdir()
    out = str(tmp_path / "clmm_out")
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE mm_src (id BIGINT, grp BIGINT, amt BIGINT)
        WITH ('connector'='filesystem','path'='{src}',
              'format'='debezium-json','scan.streaming'='true')
    """)
    env.execute_sql(f"""
        CREATE TABLE mm_sink (grp BIGINT, mn BIGINT, mx BIGINT,
                              av DOUBLE, cnt BIGINT,
                              PRIMARY KEY (grp) NOT ENFORCED)
        WITH ('connector'='filesystem','path'='{out}','format'='parquet')
    """)
    q = env.execute_sql(
        "INSERT INTO mm_sink SELECT grp, min(amt) AS mn, max(amt) AS mx, "
        "avg(amt) AS av, count(*) AS cnt FROM mm_src GROUP BY grp"
    )

    def drop(n, ops):
        (src / f"b{n}.jsonl").write_text(
            "\n".join(_json.dumps(o) for o in ops) + "\n"
        )

    def snap():
        return sorted(
            (r.grp, r.mn, r.mx, r.av, r.cnt)
            for r in spark.read.parquet(out).collect()
        )

    try:
        drop(0, [
            {"op": "c", "ts_ms": 1, "before": None,
             "after": {"id": 1, "grp": 1, "amt": 10}},
            {"op": "c", "ts_ms": 2, "before": None,
             "after": {"id": 2, "grp": 1, "amt": 2}},
            {"op": "c", "ts_ms": 3, "before": None,
             "after": {"id": 3, "grp": 1, "amt": 30}},
            {"op": "c", "ts_ms": 4, "before": None,
             "after": {"id": 4, "grp": 2, "amt": 7}},
        ])
        q.processAllAvailable()
        assert snap() == [(1, 2, 30, 14.0, 3), (2, 7, 7, 7.0, 1)]
        # retract the current MIN (id=2, amt=2) and the current MAX
        # (id=3 moves to grp 2 with a new amt): grp 1's extremes must
        # fall back to the multiset's next-best values
        drop(1, [
            {"op": "d", "ts_ms": 5,
             "before": {"id": 2, "grp": 1, "amt": 2}, "after": None},
            {"op": "u", "ts_ms": 6,
             "before": {"id": 3, "grp": 1, "amt": 30},
             "after": {"id": 3, "grp": 2, "amt": 40}},
        ])
        q.processAllAvailable()
        assert snap() == [(1, 10, 10, 10.0, 1), (2, 7, 40, 23.5, 2)]
        # duplicate values: two rows share amt=10 in grp 1; retracting
        # ONE keeps min/max at 10 (count-based multiset, not a set)
        drop(2, [
            {"op": "c", "ts_ms": 7, "before": None,
             "after": {"id": 5, "grp": 1, "amt": 10}},
        ])
        q.processAllAvailable()
        drop(3, [
            {"op": "d", "ts_ms": 8,
             "before": {"id": 1, "grp": 1, "amt": 10}, "after": None},
        ])
        q.processAllAvailable()
        assert snap() == [(1, 10, 10, 10.0, 1), (2, 7, 40, 23.5, 2)]
        # full retraction deletes the group from the sink — and CLEARS
        # the group's keyed state (Flink GroupAggFunction count-0
        # cleanup; r12 ADVICE: dead-group state must not persist)
        drop(4, [
            {"op": "d", "ts_ms": 9,
             "before": {"id": 5, "grp": 1, "amt": 10}, "after": None},
        ])
        q.processAllAvailable()
        assert snap() == [(2, 7, 40, 23.5, 2)]
        # a later insert for the cleared key re-creates fresh state and
        # the group reappears with exactly the new row's values
        drop(5, [
            {"op": "c", "ts_ms": 10, "before": None,
             "after": {"id": 6, "grp": 1, "amt": 99}},
        ])
        q.processAllAvailable()
        assert snap() == [(1, 99, 99, 99.0, 1), (2, 7, 40, 23.5, 2)]
    finally:
        q.stop()


def test_changelog_retractable_stddev_var(spark, tmp_path):
    """Retractable STDDEV/VAR over a CDC changelog source (r12 verdict
    task 5; Flink's VarPopAggFunction / VarSampAggFunction retract
    methods): signed (count, sum, sum-of-squares) is the standard
    retract form — no multiset needed.  Covers the pure signed SQL path
    (no MIN/MAX in the statement), n<2 → NULL for the _SAMP variants,
    retraction exposing the recomputed moments, and a cross-group
    UPDATE move."""
    import json as _json
    import math

    src = tmp_path / "clsd"
    src.mkdir()
    out = str(tmp_path / "clsd_out")
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE sd_src (id BIGINT, grp BIGINT, amt BIGINT)
        WITH ('connector'='filesystem','path'='{src}',
              'format'='debezium-json','scan.streaming'='true')
    """)
    env.execute_sql(f"""
        CREATE TABLE sd_sink (grp BIGINT, sd DOUBLE, vp DOUBLE,
                              cnt BIGINT,
                              PRIMARY KEY (grp) NOT ENFORCED)
        WITH ('connector'='filesystem','path'='{out}','format'='parquet')
    """)
    q = env.execute_sql(
        "INSERT INTO sd_sink SELECT grp, stddev(amt) AS sd, "
        "var_pop(amt) AS vp, count(*) AS cnt FROM sd_src GROUP BY grp"
    )

    def drop(n, ops):
        (src / f"b{n}.jsonl").write_text(
            "\n".join(_json.dumps(o) for o in ops) + "\n"
        )

    def snap():
        return sorted(
            (r.grp, r.sd, r.vp, r.cnt)
            for r in spark.read.parquet(out).collect()
        )

    def close(a, b):
        assert len(a) == len(b)
        for ra, rb in zip(a, b):
            assert len(ra) == len(rb)
            for va, vb in zip(ra, rb):
                if isinstance(vb, float):
                    assert va is not None and abs(va - vb) < 1e-9, (a, b)
                else:
                    assert va == vb, (a, b)

    try:
        drop(0, [
            {"op": "c", "ts_ms": 1, "before": None,
             "after": {"id": 1, "grp": 1, "amt": 2}},
            {"op": "c", "ts_ms": 2, "before": None,
             "after": {"id": 2, "grp": 1, "amt": 4}},
            {"op": "c", "ts_ms": 3, "before": None,
             "after": {"id": 3, "grp": 1, "amt": 6}},
            {"op": "c", "ts_ms": 4, "before": None,
             "after": {"id": 4, "grp": 2, "amt": 10}},
        ])
        q.processAllAvailable()
        # grp1 [2,4,6]: stddev_samp 2.0, var_pop 8/3; grp2 [10]:
        # stddev_samp NULL (n<2), var_pop 0
        rows = snap()
        close(rows[:1], [(1, 2.0, 8.0 / 3.0, 3)])
        assert rows[1][0] == 2 and rows[1][1] is None and rows[1][3] == 1
        assert abs(rows[1][2]) < 1e-9
        # retract the middle value: grp1 [2,6] → var_samp 8
        drop(1, [
            {"op": "d", "ts_ms": 5,
             "before": {"id": 2, "grp": 1, "amt": 4}, "after": None},
        ])
        q.processAllAvailable()
        rows = snap()
        close(rows[:1], [(1, math.sqrt(8.0), 4.0, 2)])
        # update MOVES id=3 to grp2 with a new amt: grp1 [2] → NULL
        # stddev; grp2 [10,8] → var_samp 2
        drop(2, [
            {"op": "u", "ts_ms": 6,
             "before": {"id": 3, "grp": 1, "amt": 6},
             "after": {"id": 3, "grp": 2, "amt": 8}},
        ])
        q.processAllAvailable()
        rows = snap()
        assert rows[0][0] == 1 and rows[0][1] is None and rows[0][3] == 1
        close(rows[1:], [(2, math.sqrt(2.0), 1.0, 2)])
    finally:
        q.stop()


def test_changelog_retractable_stddev_with_minmax(spark, tmp_path):
    """Mixed MIN + STDDEV statement routes through the multiset fold
    (streaming/changelog_agg.py) — the stddev accumulator there is the
    same signed (sum, count, sum-of-squares) triple."""
    import json as _json

    src = tmp_path / "clsm"
    src.mkdir()
    out = str(tmp_path / "clsm_out")
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE sm_src (id BIGINT, grp BIGINT, amt BIGINT)
        WITH ('connector'='filesystem','path'='{src}',
              'format'='debezium-json','scan.streaming'='true')
    """)
    env.execute_sql(f"""
        CREATE TABLE sm_sink (grp BIGINT, mn BIGINT, sd DOUBLE,
                              PRIMARY KEY (grp) NOT ENFORCED)
        WITH ('connector'='filesystem','path'='{out}','format'='parquet')
    """)
    q = env.execute_sql(
        "INSERT INTO sm_sink SELECT grp, min(amt) AS mn, "
        "stddev_samp(amt) AS sd FROM sm_src GROUP BY grp"
    )

    def drop(n, ops):
        (src / f"b{n}.jsonl").write_text(
            "\n".join(_json.dumps(o) for o in ops) + "\n"
        )

    try:
        drop(0, [
            {"op": "c", "ts_ms": 1, "before": None,
             "after": {"id": 1, "grp": 1, "amt": 2}},
            {"op": "c", "ts_ms": 2, "before": None,
             "after": {"id": 2, "grp": 1, "amt": 4}},
            {"op": "c", "ts_ms": 3, "before": None,
             "after": {"id": 3, "grp": 1, "amt": 6}},
        ])
        q.processAllAvailable()
        rows = spark.read.parquet(out).collect()
        assert len(rows) == 1
        assert (rows[0].grp, rows[0].mn) == (1, 2)
        assert abs(rows[0].sd - 2.0) < 1e-9
        # retract the MIN: multiset exposes next-best, stddev recomputes
        drop(1, [
            {"op": "d", "ts_ms": 4,
             "before": {"id": 1, "grp": 1, "amt": 2}, "after": None},
        ])
        q.processAllAvailable()
        rows = spark.read.parquet(out).collect()
        assert len(rows) == 1
        assert (rows[0].grp, rows[0].mn) == (1, 4)
        assert abs(rows[0].sd - 2.0 ** 0.5) < 1e-9
    finally:
        q.stop()


def test_temporal_join_for_system_time(spark, tmp_path):
    """FOR SYSTEM_TIME AS OF through executeSql: each order joins the
    rate version valid at its timestamp (versioned side's rowtime =
    its declared WATERMARK column); INNER drops rows before the first
    version, LEFT keeps them with NULLs."""
    rates = tmp_path / "rates.csv"
    rates.write_text(
        "cur,rate,valid_from\n"
        "EUR,1.0,2024-01-01T00:00:00\n"
        "EUR,2.0,2024-01-02T00:00:00\n"
        "USD,5.0,2024-01-01T12:00:00\n"
    )
    orders = tmp_path / "ords.csv"
    orders.write_text(
        "oid,cur,amount,ots\n"
        "1,EUR,10.0,2024-01-01T06:00:00\n"
        "2,EUR,10.0,2024-01-03T00:00:00\n"
        "3,USD,10.0,2024-01-01T00:00:00\n"
    )
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE rates (
            cur STRING, rate DOUBLE, valid_from TIMESTAMP,
            WATERMARK FOR valid_from AS valid_from - INTERVAL '0' SECOND,
            PRIMARY KEY (cur) NOT ENFORCED
        ) WITH ('connector'='filesystem','path'='{rates}','format'='csv')
    """)
    env.execute_sql(f"""
        CREATE TABLE ords (oid BIGINT, cur STRING, amount DOUBLE, ots TIMESTAMP)
        WITH ('connector'='filesystem','path'='{orders}','format'='csv')
    """)
    got = env.execute_sql("""
        SELECT o.oid, o.amount * r.rate AS converted
        FROM ords o
        JOIN rates FOR SYSTEM_TIME AS OF o.ots AS r
        ON o.cur = r.cur
    """).collect()
    # order 1: EUR rate 1.0; order 2: EUR rate 2.0; order 3: USD has no
    # version yet at 00:00 -> dropped by INNER
    assert sorted((r.oid, r.converted) for r in got) == [(1, 10.0), (2, 20.0)]
    got_left = env.execute_sql("""
        SELECT o.oid, r.rate
        FROM ords o
        LEFT JOIN rates FOR SYSTEM_TIME AS OF o.ots AS r
        ON o.cur = r.cur
    """).collect()
    assert sorted([(r.oid, r.rate) for r in got_left], key=str) == sorted(
        [(1, 1.0), (2, 2.0), (3, None)], key=str
    )


def test_unnest_rewrite(fixture_env, spark):
    """Flink CROSS JOIN UNNEST forms lower onto LATERAL VIEW: scalar
    arrays (explode), WITH ORDINALITY (posexplode), arrays of rows
    (inline), and LEFT JOIN ... ON TRUE (OUTER)."""
    spark.createDataFrame(
        [(1, ["a", "b"], [(10, "x")]), (2, [], [])],
        "id long, tags array<string>, pairs array<struct<n:long,s:string>>",
    ).createOrReplaceTempView("unnest_src")
    rows = fixture_env.execute_sql("""
        SELECT id, tag FROM unnest_src CROSS JOIN UNNEST(tags) AS u(tag)
    """).collect()
    assert sorted((r.id, r.tag) for r in rows) == [(1, "a"), (1, "b")]
    rows = fixture_env.execute_sql("""
        SELECT id, tag, ord
        FROM unnest_src CROSS JOIN UNNEST(tags) WITH ORDINALITY AS u(tag, ord)
    """).collect()
    # SQL-standard / Flink ordinality is 1-BASED
    assert sorted((r.id, r.tag, r.ord) for r in rows) == [(1, "a", 1), (1, "b", 2)]
    rows = fixture_env.execute_sql("""
        SELECT id, n, s FROM unnest_src CROSS JOIN UNNEST(pairs) AS p(n, s)
    """).collect()
    assert [(r.id, r.n, r.s) for r in rows] == [(1, 10, "x")]
    rows = fixture_env.execute_sql("""
        SELECT id, tag FROM unnest_src LEFT JOIN UNNEST(tags) AS u(tag) ON TRUE
    """).collect()
    assert sorted([(r.id, r.tag) for r in rows], key=str) == sorted(
        [(1, "a"), (1, "b"), (2, None)], key=str
    )


def test_flink_builtin_name_rewrites(fixture_env):
    """Flink function names Spark lacks rewrite to codegen-pure Spark
    SQL: SPLIT_INDEX, TO/FROM_BASE64, TRUNCATE, RAND_INTEGER,
    CONVERT_TZ, JSON_EXISTS/VALUE/QUERY (2-arg, lax/strict prefixes)."""
    r = fixture_env.execute_sql("""
        SELECT SPLIT_INDEX('a,b,c', ',', 1) AS s1,
               SPLIT_INDEX('a,b,c', ',', 9) AS s_oob,
               TO_BASE64(CAST('x' AS BINARY)) AS b64,
               CAST(FROM_BASE64('eA==') AS STRING) AS x,
               TRUNCATE(3.14159, 2) AS t2,
               TRUNCATE(-2.79, 1) AS tn,
               RAND_INTEGER(10) AS ri,
               CONVERT_TZ(TIMESTAMP '2024-06-01 12:00:00',
                          'UTC', 'America/New_York') AS ctz,
               JSON_EXISTS('{"a": 1}', 'lax $.a') AS je,
               JSON_VALUE('{"a": {"b": 2}}', '$.a.b') AS jv,
               JSON_VALUE('{"a": {"b": 2}}', '$.a') AS jv_struct,
               JSON_QUERY('{"a": [1, 2]}', 'strict $.a') AS jq
    """).collect()[0]
    assert r.s1 == "b" and r.s_oob is None
    assert r.b64 == "eA==" and r.x == "x"
    assert abs(r.t2 - 3.14) < 1e-9 and abs(r.tn - (-2.7)) < 1e-9
    assert 0 <= r.ri < 10
    assert str(r.ctz).startswith("2024-06-01 08:00:00")
    assert r.je is True and r.jv == "2" and r.jv_struct is None
    assert r.jq == "[1, 2]" or r.jq == "[1,2]"


def test_filesystem_scan_streaming(spark, tmp_path):
    """'scan.streaming'='true' on a plain filesystem table gives the
    continuous-monitoring FileSource for any format, with the declared
    schema and WATERMARK applied."""
    import json as _json

    from flink_1_20_spark.streaming import run_to_memory

    src = tmp_path / "mon"
    src.mkdir()
    (src / "b0.jsonl").write_text(
        _json.dumps({"ts": "2024-01-01T10:00:00", "v": 1.0}) + "\n"
    )
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE monitored (
            ts TIMESTAMP(3), v DOUBLE,
            WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
        ) WITH ('connector'='filesystem','path'='{src}',
                'format'='json','scan.streaming'='true')
    """)
    stream = spark.table("monitored")
    assert stream.isStreaming
    q = run_to_memory(stream, "mon_out", output_mode="append")
    try:
        q.processAllAvailable()
        (src / "b1.jsonl").write_text(
            _json.dumps({"ts": "2024-01-01T10:01:00", "v": 2.0}) + "\n"
        )
        q.processAllAvailable()
        assert spark.table("mon_out").count() == 2
    finally:
        q.stop()


def test_review_fixes_dialect(fixture_env, spark, tmp_path):
    """Round-5 review regressions: SPLIT_INDEX with a regex-metachar
    delimiter is literal; alias-less UNNEST is rejected loudly; the
    qualified-name rewrite never rewrites inside string literals; DROP
    TABLE removes the qualified-access view too."""
    r = fixture_env.execute_sql(
        "SELECT SPLIT_INDEX('a.b.c', '.', 0) AS s0, "
        "SPLIT_INDEX('x|y', '|', 1) AS s1"
    ).collect()[0]
    assert r.s0 == "a" and r.s1 == "y"
    spark.createDataFrame([(1, ["a"])], "id long, tags array<string>") \
        .createOrReplaceTempView("unnest_src2")
    with pytest.raises(Exception, match="alias"):
        fixture_env.execute_sql(
            "SELECT id FROM unnest_src2 CROSS JOIN UNNEST(tags) WHERE id > 0"
        )
    # literal containing a registered db.table pattern stays untouched
    env = TableEnvironment(spark)
    env.execute_sql("CREATE DATABASE x")
    src = tmp_path / "lit.csv"
    src.write_text("a\n1\n")
    env.execute_sql("USE x")
    env.execute_sql(f"""
        CREATE TABLE csv (a BIGINT)
        WITH ('connector'='filesystem','path'='{src}','format'='csv')
    """)
    env.execute_sql("USE default_database")
    got = env.execute_sql("SELECT 'path to x.csv here' AS p").collect()[0].p
    assert got == "path to x.csv here"
    assert env.execute_sql("SELECT count(*) AS n FROM x.csv").collect()[0].n == 1
    env.execute_sql("USE x")
    env.execute_sql("DROP TABLE csv")
    env.execute_sql("USE default_database")
    with pytest.raises(Exception):
        env.execute_sql("SELECT * FROM x.csv").collect()


def test_review_fixes_session_and_nulls(spark):
    """Events exactly `gap` apart land in the SAME session in the
    merged session-window join (r11 differential-harness adjudication:
    TimeWindow.intersects is INCLUSIVE — its javadoc says "or if this
    window is just after or before the given window",
    flink-streaming-java .../windows/TimeWindow.java:113 — so abutting
    windows merge; the earlier review pinned the opposite and was
    wrong); NULL comparisons in CEP conditions are non-matches, not
    errors."""
    from datetime import datetime

    from flink_1_20_spark.datastream_api import (
        EventTimeSessionWindows,
        StreamExecutionEnvironment,
    )

    env = StreamExecutionEnvironment(spark)
    l = env.from_collection(
        [("a", datetime(2024, 1, 1, 10, 0), 1)], "k string, lts timestamp, lv bigint"
    )
    r = env.from_collection(
        [("a", datetime(2024, 1, 1, 10, 5), 10)], "rk string, rts timestamp, rv bigint"
    )
    rows = (
        l.join(r)
        .where("k")
        .equal_to("rk")
        .window(EventTimeSessionWindows.with_gap("5 minutes"), "lts", "rts")
        .apply("k", "lv", "rv")
        .execute_and_collect()
    )
    # exactly-gap apart: abutting per-event windows MERGE into one
    # session, so the join pairs them
    assert [tuple(r) for r in rows] == [("a", 1, 10)]

    from flink_1_20_spark.operators.cep import Pattern, match_recognize

    df = spark.createDataFrame(
        [(1, 1, "x", None), (1, 2, "y", "q")],
        "user_id long, event_id long, label string, other string",
    ).selectExpr("user_id", "event_id", "timestamp(event_id) AS ts", "label", "other")
    pat = Pattern.begin("a", lambda r: True).next(
        "b", lambda r, g: r["other"] > g["a"]["other"].iloc[-1]
    )
    out = match_recognize(
        df,
        keys=["user_id"],
        ts="ts",
        pattern=pat,
        measures=lambda g: {"n": len(g["b"])},
        output_schema="n bigint, user_id bigint",
    )
    assert out.collect() == []  # None comparison -> non-match, no crash


def test_cross_database_insert_and_describe(spark, tmp_path):
    """Qualified names work for DML/metadata too: INSERT INTO db.t,
    DESCRIBE db.t and SHOW CREATE TABLE db.t resolve the other
    database's table."""
    out = str(tmp_path / "xdb_out")
    env = TableEnvironment(spark)
    env.execute_sql("CREATE DATABASE wh")
    env.execute_sql("USE wh")
    env.execute_sql(f"""
        CREATE TABLE sink (a BIGINT, b STRING)
        WITH ('connector'='filesystem','path'='{out}','format'='parquet')
    """)
    env.execute_sql("USE default_database")
    env.execute_sql(
        "INSERT INTO wh.sink SELECT 1 AS a, 'x' AS b UNION ALL SELECT 2, 'y'"
    )
    rows = env.execute_sql("SELECT a, b FROM wh.sink ORDER BY a").collect()
    assert [(r.a, r.b) for r in rows] == [(1, "x"), (2, "y")]
    desc = {r.name: r.type for r in env.execute_sql("DESCRIBE wh.sink").collect()}
    assert desc == {"a": "bigint", "b": "string"}
    ddl = env.execute_sql("SHOW CREATE TABLE wh.sink").collect()[0].result
    assert "`a` BIGINT" in ddl


def test_session_set_reset_and_jars(spark):
    env = TableEnvironment(spark)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # Flink key with a Spark analog actually lands on the session
        env.execute_sql("SET 'table.exec.resource.default-parallelism' = '7'")
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
        # Flink-only key is recorded so scripts run unchanged
        env.execute_sql("SET 'table.exec.mini-batch.enabled' = 'true'")
        got = {r["key"]: r["value"] for r in env.execute_sql("SET").collect()}
        assert got["table.exec.mini-batch.enabled"] == "true"
        assert got["table.exec.resource.default-parallelism"] == "7"
        # RESET drops one key; bare RESET clears the store AND restores
        # the Spark conf the SET had mutated (Flink RESET = back to the
        # pre-SET value, not just forgetting the entry)
        env.execute_sql("RESET 'table.exec.mini-batch.enabled'")
        keys = [r["key"] for r in env.execute_sql("SET").collect()]
        assert "table.exec.mini-batch.enabled" not in keys
        env.execute_sql("RESET")
        assert env.execute_sql("SET").count() == 0
        assert spark.conf.get("spark.sql.shuffle.partitions") == prev
        # jar listing round-trips (REMOVE only affects the listing —
        # documented: a loaded jar cannot be unloaded from a JVM)
        env._jars.append("/tmp/fake-a.jar")
        assert [r["jar"] for r in env.execute_sql("SHOW JARS").collect()] == [
            "/tmp/fake-a.jar"
        ]
        env.execute_sql("REMOVE JAR '/tmp/fake-a.jar'")
        assert env.execute_sql("SHOW JARS").count() == 0
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_programmatic_entry_points(spark, tmp_path):
    env = TableEnvironment(spark)
    # from_elements → Table facade → fluent ops
    t = env.from_elements([(1, "a"), (2, "b"), (3, "a")], "id long, tag string")
    got = (
        t.group_by("tag")
        .select("tag", "id.sum AS total")
        .execute()
        .collect()
    )
    assert {(r["tag"], r["total"]) for r in got} == {("a", 4), ("b", 2)}
    # DDL table → from_path → Table
    src = tmp_path / "fp.csv"
    src.write_text("k,v\n1,10\n2,20\n")
    env.execute_sql(f"""
        CREATE TABLE fp_src (k BIGINT, v BIGINT) WITH (
            'connector' = 'filesystem', 'path' = '{src}', 'format' = 'csv',
            'csv.include-header' = 'true'
        )""")
    assert env.from_path("fp_src").execute().collect()[0]["k"] in (1, 2)
    # sql_query returns a Table; DDL through it raises
    assert env.sql_query("SELECT 41 + 1 AS x").execute().collect()[0]["x"] == 42
    with pytest.raises(ValueError):
        env.sql_query("CREATE DATABASE sq_not_a_query")
    # StatementSet buffers inserts and runs them in one submission
    out_a, out_b = tmp_path / "out_a", tmp_path / "out_b"
    env.execute_sql(f"""
        CREATE TABLE snk_a (k BIGINT, v BIGINT) WITH (
            'connector' = 'filesystem', 'path' = '{out_a}', 'format' = 'parquet'
        )""")
    env.execute_sql(f"""
        CREATE TABLE snk_b (k BIGINT, v BIGINT) WITH (
            'connector' = 'filesystem', 'path' = '{out_b}', 'format' = 'parquet'
        )""")
    ss = env.create_statement_set()
    ss.add_insert_sql("INSERT INTO snk_a SELECT k, v FROM fp_src WHERE k = 1")
    ss.add_insert_sql("INSERT INTO snk_b SELECT k, v * 2 AS v FROM fp_src")
    ss.execute()
    assert spark.read.parquet(str(out_a)).count() == 1
    assert {r["v"] for r in spark.read.parquet(str(out_b)).collect()} == {20, 40}


def test_truncate_table(spark, tmp_path):
    env = TableEnvironment(spark)
    p = tmp_path / "tt"
    env.execute_sql(f"""
        CREATE TABLE tt (k BIGINT, v STRING) WITH (
            'connector' = 'filesystem', 'path' = '{p}', 'format' = 'parquet'
        )""")
    env.execute_sql("INSERT INTO tt SELECT 1 AS k, 'x' AS v")
    assert spark.table("tt").count() >= 1
    env.execute_sql("TRUNCATE TABLE tt")
    assert spark.table("tt").count() == 0
    assert spark.read.parquet(str(p)).count() == 0  # path truly emptied
    # the qualified alias view must not dangle on the deleted files
    assert env.execute_sql("SELECT count(*) AS n FROM default_database.tt").collect()[0]["n"] == 0
    # schema survives the truncate: inserts keep working
    env.execute_sql("INSERT INTO tt SELECT 2 AS k, 'y' AS v")
    assert spark.table("tt").count() == 1
    # qualified truncate resolves through the db.table rewrite
    env.execute_sql("TRUNCATE TABLE default_database.tt")
    assert spark.table("tt").count() == 0
    with pytest.raises(ValueError):
        env.execute_sql("TRUNCATE TABLE no_such_table")


def test_show_columns(spark, tmp_path):
    src = tmp_path / "sc.csv"
    src.write_text("uid,name,score\n1,a,2.0\n")
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE sc_t (uid BIGINT, name STRING, score DOUBLE)
        WITH ('connector'='filesystem','path'='{src}','format'='csv')""")
    all_cols = [r["name"] for r in env.execute_sql("SHOW COLUMNS FROM sc_t").collect()]
    assert all_cols == ["uid", "name", "score"]
    liked = [r["name"] for r in
             env.execute_sql("SHOW COLUMNS IN sc_t LIKE '%e'").collect()]
    assert liked == ["name", "score"]
    notliked = [r["name"] for r in
                env.execute_sql("SHOW COLUMNS FROM sc_t NOT LIKE '%e'").collect()]
    assert notliked == ["uid"]


def test_show_partitions_and_alter_partition(spark, tmp_path):
    """SHOW PARTITIONS + ALTER TABLE ADD/DROP PARTITION over the
    directory-partitioned filesystem layout
    (SqlShowPartitionsConverter.java,
    SqlAlterTableAddPartitionConverter.java parity)."""
    p = tmp_path / "pt"
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE pt (k BIGINT, v STRING, dt STRING)
        PARTITIONED BY (dt)
        WITH ('connector'='filesystem','path'='{p}','format'='parquet')""")
    env.execute_sql(
        "INSERT INTO pt SELECT * FROM (VALUES (1, 'a', '2024-01-01'),"
        " (2, 'b', '2024-01-01'), (3, 'c', '2024-01-02')) AS t(k, v, dt)"
    )
    parts = [r["partition"] for r in env.execute_sql("SHOW PARTITIONS pt").collect()]
    assert parts == ["dt=2024-01-01", "dt=2024-01-02"]
    # filtered by a spec
    one = [r["partition"] for r in env.execute_sql(
        "SHOW PARTITIONS pt PARTITION (dt='2024-01-02')").collect()]
    assert one == ["dt=2024-01-02"]
    # ADD creates a real (empty) partition directory
    env.execute_sql("ALTER TABLE pt ADD PARTITION (dt='2024-01-03')")
    assert (p / "dt=2024-01-03").is_dir()
    parts = [r["partition"] for r in env.execute_sql("SHOW PARTITIONS pt").collect()]
    assert "dt=2024-01-03" in parts
    # un-guarded duplicate ADD errors; IF NOT EXISTS is idempotent
    with pytest.raises(ValueError):
        env.execute_sql("ALTER TABLE pt ADD PARTITION (dt='2024-01-03')")
    env.execute_sql("ALTER TABLE pt ADD IF NOT EXISTS PARTITION (dt='2024-01-03')")
    # DROP removes the directory AND its data from subsequent reads
    env.execute_sql("ALTER TABLE pt DROP PARTITION (dt='2024-01-01')")
    assert not (p / "dt=2024-01-01").exists()
    rows = env.execute_sql("SELECT k, dt FROM pt ORDER BY k").collect()
    assert [(r["k"], r["dt"]) for r in rows] == [(3, "2024-01-02")]
    with pytest.raises(ValueError):
        env.execute_sql("ALTER TABLE pt DROP PARTITION (dt='2024-01-01')")
    env.execute_sql("ALTER TABLE pt DROP IF EXISTS PARTITION (dt='2024-01-01')")
    # multiple specs in one statement (reference grammar allows a list)
    env.execute_sql(
        "ALTER TABLE pt ADD PARTITION (dt='2024-02-01') PARTITION (dt='2024-02-02')"
    )
    parts = [r["partition"] for r in env.execute_sql("SHOW PARTITIONS pt").collect()]
    assert {"dt=2024-02-01", "dt=2024-02-02"} <= set(parts)
    # spec must name exactly the partition keys
    with pytest.raises(ValueError):
        env.execute_sql("ALTER TABLE pt ADD PARTITION (nope='x')")
    # non-partitioned table rejects the whole surface
    env.execute_sql(f"""
        CREATE TABLE np (k BIGINT) WITH (
            'connector'='filesystem','path'='{tmp_path / "np"}','format'='parquet')""")
    with pytest.raises(ValueError):
        env.execute_sql("SHOW PARTITIONS np")


def test_catalog_ddl_and_qualified_resolution(spark, tmp_path):
    """CREATE/DESCRIBE/ALTER/USE CATALOG + catalog.db.table resolution
    through executeSql (SqlCreateCatalogConverter.java,
    SqlAlterCatalogOptionsConverter.java, SqlDescribeCatalogConverter.java
    parity; GenericInMemoryCatalog semantics)."""
    src = tmp_path / "c.csv"
    src.write_text("k,v\n1,10\n2,20\n")
    env = TableEnvironment(spark)
    cats = [r["catalog_name"] for r in env.execute_sql("SHOW CATALOGS").collect()]
    assert cats == ["default_catalog"]
    env.execute_sql(
        "CREATE CATALOG side COMMENT 'aux' WITH "
        "('type'='generic_in_memory', 'default-database'='d1', 'owner'='me')"
    )
    with pytest.raises(ValueError):
        env.execute_sql("CREATE CATALOG side")
    env.execute_sql("CREATE CATALOG IF NOT EXISTS side")  # idempotent
    with pytest.raises(ValueError):  # unknown factory type
        env.execute_sql("CREATE CATALOG bad WITH ('type'='hive')")
    info = {r["info_name"]: r["info_value"]
            for r in env.execute_sql("DESCRIBE CATALOG EXTENDED side").collect()}
    assert info["type"] == "generic_in_memory"
    assert info["comment"] == "aux"
    assert info["option:owner"] == "me"
    env.execute_sql("ALTER CATALOG side SET ('owner'='you')")
    env.execute_sql("ALTER CATALOG side COMMENT 'renamed'")
    info = {r["info_name"]: r["info_value"]
            for r in env.execute_sql("DESCRIBE CATALOG EXTENDED side").collect()}
    assert info["option:owner"] == "you" and info["comment"] == "renamed"
    env.execute_sql("ALTER CATALOG side RESET ('owner')")
    info = {r["info_name"]: r["info_value"]
            for r in env.execute_sql("DESCRIBE CATALOG EXTENDED side").collect()}
    assert "option:owner" not in info

    # register a table inside the side catalog and read it from BOTH
    # catalogs via the fully-qualified 3-part name
    env.execute_sql("USE CATALOG side")
    assert env.execute_sql("SHOW CURRENT CATALOG").collect()[0][0] == "side"
    assert env.execute_sql("SHOW CURRENT DATABASE").collect()[0][0] == "d1"
    env.execute_sql(f"""
        CREATE TABLE ct (k BIGINT, v BIGINT) WITH (
            'connector'='filesystem','path'='{src}','format'='csv')""")
    assert env.execute_sql("SELECT count(*) AS n FROM ct").collect()[0]["n"] == 2
    env.execute_sql("USE CATALOG default_catalog")
    # bare name is gone (different catalog), qualified name resolves
    rows = env.execute_sql(
        "SELECT k, v FROM side.d1.ct ORDER BY k"
    ).collect()
    assert [(r["k"], r["v"]) for r in rows] == [(1, 10), (2, 20)]
    # current catalog cannot be dropped; the other one can
    with pytest.raises(ValueError):
        env.execute_sql("DROP CATALOG default_catalog")
    env.execute_sql("DROP CATALOG side")
    assert [r["catalog_name"] for r in env.execute_sql("SHOW CATALOGS").collect()] == [
        "default_catalog"
    ]


def test_analyze_table_statistics_and_broadcast(spark, tmp_path):
    """ANALYZE TABLE ... COMPUTE STATISTICS (SqlNodeToOperationConversion
    convertAnalyzeTable): stats land on the TableMeta, and a small
    analyzed table becomes the broadcast side of a join even when
    Spark's own size-estimate auto-broadcast is disabled — the
    statistics-informed decision Flink's planner makes against
    table.optimizer.join.broadcast-threshold."""
    env = TableEnvironment(spark)
    p = tmp_path / "fact"
    env.execute_sql(f"""
        CREATE TABLE fact (k BIGINT, v DOUBLE) WITH (
            'connector'='filesystem','path'='{p}','format'='parquet')""")
    env.execute_sql(
        "INSERT INTO fact SELECT id AS k, id * 1.5E0 AS v FROM range(1000)"
    )
    d = tmp_path / "dim"
    env.execute_sql(f"""
        CREATE TABLE dim (k BIGINT, name STRING) WITH (
            'connector'='filesystem','path'='{d}','format'='parquet')""")
    env.execute_sql(
        "INSERT INTO dim SELECT id AS k, concat('n', id) AS name FROM range(10)"
    )
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        join_sql = "SELECT f.k, f.v, d.name FROM fact f JOIN dim d ON f.k = d.k"
        plan = (
            env.execute_sql(join_sql)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" not in plan  # no stats, no auto-broadcast
        env.execute_sql("ANALYZE TABLE dim COMPUTE STATISTICS FOR ALL COLUMNS")
        stats = env.tables["dim"].stats
        assert stats["row_count"] == 10
        assert stats["size_bytes"] > 0
        assert stats["columns"]["k"]["null_count"] == 0
        assert stats["columns"]["k"]["min"] == 0 and stats["columns"]["k"]["max"] == 9
        plan = (
            env.execute_sql(join_sql)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan  # the analyzed size drove it
        # a write invalidates the stats → the broadcast verdict is dropped
        env.execute_sql("INSERT INTO dim SELECT id AS k, 'x' AS name FROM range(5)")
        assert env.tables["dim"].stats is None
        plan = (
            env.execute_sql(join_sql)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    # FOR COLUMNS subset + partition-spec ANALYZE
    env.execute_sql("ANALYZE TABLE fact COMPUTE STATISTICS FOR COLUMNS v")
    st = env.tables["fact"].stats
    assert st["row_count"] == 1000 and list(st["columns"]) == ["v"]
    # a big table stays un-broadcast even when analyzed: threshold respected
    env.execute_sql("SET 'table.optimizer.join.broadcast-threshold' = '1'")
    try:
        env.execute_sql("ANALYZE TABLE fact COMPUTE STATISTICS")
        assert env.tables["fact"].stats is not None
        plan = (
            env.execute_sql("SELECT f.k FROM fact f JOIN dim d ON f.k = d.k")
            ._jdf.queryExecution().executedPlan().toString()
        )
        # fact (over threshold) must not carry a broadcast hint itself
        assert plan.count("BroadcastHashJoin") <= 1
    finally:
        env.execute_sql("RESET 'table.optimizer.join.broadcast-threshold'")


def test_sql_query_rejects_ddl_without_side_effects(spark):
    """sqlQuery validates by shape BEFORE executing (Flink parity): a
    CREATE DATABASE passed to sql_query must fail without creating it."""
    env = TableEnvironment(spark)
    with pytest.raises(ValueError):
        env.sql_query("CREATE DATABASE oops")
    assert "oops" not in env._dbs  # no side effect happened
    assert env.sql_query("SELECT 1 AS one").to_data_frame().collect()[0]["one"] == 1


def test_reset_aliased_session_keys(spark):
    """Two Flink keys map to spark.sql.shuffle.partitions; RESET of one
    must keep the surviving alias applied (ADVICE round-5 item)."""
    env = TableEnvironment(spark)
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        env.execute_sql("SET 'parallelism.default' = '7'")
        env.execute_sql("SET 'table.exec.resource.default-parallelism' = '5'")
        assert spark.conf.get("spark.sql.shuffle.partitions") == "5"
        env.execute_sql("RESET 'table.exec.resource.default-parallelism'")
        # the surviving alias still applies — not the pre-SET value
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
        env.execute_sql("RESET 'parallelism.default'")
        assert spark.conf.get("spark.sql.shuffle.partitions") == orig
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)


def test_sql_match_recognize_subset(fixture_env):
    """SUBSET union variables (MatchSpec.java:70) in MEASURES and
    DEFINE, verified against the subset-free formulation of the same
    pattern: for S = (A, B) with PATTERN (A B+ C),
    COUNT(S.*) == COUNT(A.*) + COUNT(B.*), FIRST(S.v) == FIRST(A.v),
    LAST(S.v) == LAST(B.v), and a DEFINE on LAST(S.`value`) is
    equivalent to one on LAST(B.`value`)."""
    with_subset = fixture_env.execute_sql("""
        SELECT user_id, n_ab, first_s, last_s
        FROM events MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES COUNT(S.*) AS n_ab,
                     FIRST(S.`value`) AS first_s,
                     LAST(S.`value`) AS last_s
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A B+ C)
            SUBSET S = (A, B)
            DEFINE A AS A.event_type = 'click',
                   B AS B.event_type = 'view',
                   C AS C.event_type = 'purchase'
                        AND C.`value` > LAST(S.`value`)
        )
    """).collect()
    oracle = fixture_env.execute_sql("""
        SELECT user_id, na + nb AS n_ab, first_a AS first_s, last_b AS last_s
        FROM events MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES COUNT(A.*) AS na,
                     COUNT(B.*) AS nb,
                     FIRST(A.`value`) AS first_a,
                     LAST(B.`value`) AS last_b
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A B+ C)
            DEFINE A AS A.event_type = 'click',
                   B AS B.event_type = 'view',
                   C AS C.event_type = 'purchase'
                        AND C.`value` > LAST(B.`value`)
        )
    """).collect()
    assert len(with_subset) > 0  # the fixture data must exercise the shape
    key = lambda r: (r["user_id"], r["n_ab"], r["first_s"], r["last_s"])  # noqa: E731
    assert sorted(map(key, with_subset)) == sorted(map(key, oracle))
    # validation: unknown member / colliding name are parse errors
    for bad in (
        "SUBSET S = (A, Z)",
        "SUBSET A = (B)",
    ):
        with pytest.raises(ValueError):
            fixture_env.execute_sql(f"""
                SELECT user_id FROM events MATCH_RECOGNIZE (
                    PARTITION BY user_id ORDER BY ts, event_id
                    MEASURES COUNT(A.*) AS n ONE ROW PER MATCH
                    PATTERN (A B) {bad}
                    DEFINE A AS A.event_type = 'click',
                           B AS B.event_type = 'view'
                )
            """)


def test_describe_alter_database_and_show_create_view(spark, tmp_path):
    env = TableEnvironment(spark)
    env.execute_sql(
        "CREATE DATABASE marts COMMENT 'analytics marts' WITH ('team'='data')"
    )
    info = {r["info_name"]: r["info_value"]
            for r in env.execute_sql("DESCRIBE DATABASE EXTENDED marts").collect()}
    assert info["name"] == "marts"
    assert info["comment"] == "analytics marts"
    assert info["property:team"] == "data"
    env.execute_sql("ALTER DATABASE marts SET ('team'='ml', 'tier'='gold')")
    info = {r["info_name"]: r["info_value"]
            for r in env.execute_sql("DESCRIBE DATABASE EXTENDED marts").collect()}
    assert info["property:team"] == "ml" and info["property:tier"] == "gold"
    with pytest.raises(ValueError):
        env.execute_sql("DESCRIBE DATABASE nope")
    # SHOW CREATE VIEW round-trips the recorded definition
    env.execute_sql("CREATE VIEW v_two AS SELECT 2 AS two")
    ddl = env.execute_sql("SHOW CREATE VIEW v_two").collect()[0]["result"]
    assert ddl.startswith("CREATE VIEW `v_two` AS") and "SELECT 2" in ddl
    env.execute_sql("DROP VIEW v_two")
    with pytest.raises(ValueError):
        env.execute_sql("SHOW CREATE VIEW v_two")
    # module listing surface (module system itself is a documented non-goal)
    mods = env.execute_sql("SHOW MODULES").collect()
    assert [r["module_name"] for r in mods] == ["core"]
    full = env.execute_sql("SHOW FULL MODULES").collect()
    assert [(r["module_name"], r["used"]) for r in full] == [("core", True)]


def test_show_jobs_and_stop_job(spark, tmp_path):
    """SHOW JOBS / STOP JOB over the session's streaming queries
    (FLIP-291 job-lifecycle statements)."""
    env = TableEnvironment(spark)
    assert env.execute_sql("SHOW JOBS").collect() == []
    q = (
        spark.readStream.format("rate").option("rowsPerSecond", "5").load()
        .writeStream.format("memory").queryName("jobs_probe").start()
    )
    try:
        jobs = env.execute_sql("SHOW JOBS").collect()
        mine = [r for r in jobs if r["job_name"] == "jobs_probe"]
        assert len(mine) == 1 and mine[0]["status"] == "RUNNING"
        with pytest.raises(ValueError):
            env.execute_sql(f"STOP JOB '{mine[0]['job_id']}' WITH SAVEPOINT")
        with pytest.raises(ValueError):
            env.execute_sql("STOP JOB 'no-such-id'")
        env.execute_sql(f"STOP JOB '{mine[0]['job_id']}'")
        assert all(
            r["job_name"] != "jobs_probe"
            for r in env.execute_sql("SHOW JOBS").collect()
        )
    finally:
        if q.isActive:
            q.stop()


def test_describe_job(spark, tmp_path):
    """DESCRIBE JOB '<id>' (SqlDescribeJob.java / the gateway's
    callDescribeJobOperation): one row of id/name/status/start_time;
    a missing id raises. Env-started jobs stay describable with a
    recorded start instant after termination."""
    import datetime

    import json as _json

    env = TableEnvironment(spark)
    with pytest.raises(ValueError):
        env.execute_sql("DESCRIBE JOB 'no-such-id'")
    src = tmp_path / "dj_src"
    src.mkdir()
    (src / "b0.jsonl").write_text(_json.dumps({"v": 1}) + "\n")
    env.execute_sql(f"""
        CREATE TABLE dj_src (v INT) WITH (
          'connector' = 'filesystem', 'path' = '{src}',
          'format' = 'json', 'scan.streaming' = 'true')
    """)
    env.execute_sql(f"""
        CREATE TABLE dj_sink (v INT) WITH (
          'connector' = 'filesystem', 'path' = '{tmp_path}/dj_sink',
          'format' = 'parquet')
    """)
    q = env.execute_sql("INSERT INTO dj_sink SELECT v FROM dj_src")
    try:
        row = env.execute_sql(f"DESCRIBE JOB '{q.id}'").collect()[0]
        assert row["job_id"] == q.id
        assert row["status"] == "RUNNING"
        assert isinstance(row["start_time"], datetime.datetime)
    finally:
        if q.isActive:
            q.processAllAvailable()
            q.stop()
    # terminated but env-started: still describable, FINISHED
    row = env.execute_sql(f"DESCRIBE JOB '{q.id}'").collect()[0]
    assert row["status"] == "FINISHED"
    assert isinstance(row["start_time"], datetime.datetime)
    # review fix: a query the env did NOT start (direct writeStream on
    # the shared session) still reports a non-null, stable start_time
    ext = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .writeStream.format("noop")
        .start()
    )
    try:
        r1 = env.execute_sql(f"DESCRIBE JOB '{ext.id}'").collect()[0]
        r2 = env.execute_sql(f"DESCRIBE JOB '{ext.id}'").collect()[0]
        assert isinstance(r1["start_time"], datetime.datetime)
        assert r1["start_time"] == r2["start_time"]
    finally:
        ext.stop()


def test_subset_count_star_not_inflated(fixture_env):
    """COUNT(*) counts match rows (primary variables only) — the SUBSET
    expansion must not double-count rows also bound to a union variable
    (review fix)."""
    rows = fixture_env.execute_sql("""
        SELECT user_id, n_rows, n_ab
        FROM events MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES COUNT(*) AS n_rows, COUNT(S.*) AS n_ab
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A B+ C)
            SUBSET S = (A, B)
            DEFINE A AS A.event_type = 'click',
                   B AS B.event_type = 'view',
                   C AS C.event_type = 'purchase'
        )
    """).collect()
    assert len(rows) > 0
    for r in rows:
        # match = A + B(s) + C; subset S = A + B(s) = all but C
        assert r["n_rows"] == r["n_ab"] + 1


def test_analyze_partition_scoped_stats(spark, tmp_path):
    """Partition-scoped ANALYZE records CatalogPartitionStatistics-style
    per-partition stats and must NOT feed the table-level broadcast
    verdict (review fix: one small partition of a huge table must not
    broadcast the whole table)."""
    env = TableEnvironment(spark)
    p = tmp_path / "ppt"
    env.execute_sql(f"""
        CREATE TABLE ppt (k BIGINT, dt STRING) PARTITIONED BY (dt)
        WITH ('connector'='filesystem','path'='{p}','format'='parquet')""")
    env.execute_sql(
        "INSERT INTO ppt SELECT id AS k, CASE WHEN id < 10 THEN 'a' ELSE 'b' END AS dt"
        " FROM range(1000)"
    )
    env.execute_sql("ANALYZE TABLE ppt PARTITION (dt='a') COMPUTE STATISTICS")
    st = env.tables["ppt"].stats
    assert st["partitions"]["dt=a"]["row_count"] == 10
    assert "size_bytes" not in st  # no table-level verdict material
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (
            env.execute_sql(
                "SELECT a.k FROM ppt a JOIN ppt b ON a.k = b.k"
            )._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" not in plan  # partition stats never hint
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_broadcast_threshold_change_reapplies(spark, tmp_path):
    """Changing table.optimizer.join.broadcast-threshold after ANALYZE
    re-evaluates registered broadcast verdicts at once (review fix —
    Flink reads the threshold at plan time)."""
    env = TableEnvironment(spark)
    d = tmp_path / "dim2"
    env.execute_sql(f"""
        CREATE TABLE dim2 (k BIGINT, v BIGINT) WITH (
            'connector'='filesystem','path'='{d}','format'='parquet')""")
    env.execute_sql("INSERT INTO dim2 SELECT id AS k, id AS v FROM range(50)")
    env.execute_sql("ANALYZE TABLE dim2 COMPUTE STATISTICS")
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    join_sql = "SELECT a.k FROM dim2 a JOIN dim2 b ON a.k = b.k"
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = env.execute_sql(join_sql)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan  # analyzed small table hints
        env.execute_sql("SET 'table.optimizer.join.broadcast-threshold' = '-1'")
        plan = env.execute_sql(join_sql)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan  # verdict re-evaluated NOW
        env.execute_sql("RESET 'table.optimizer.join.broadcast-threshold'")
        plan = env.execute_sql(join_sql)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_create_database_if_not_exists_keeps_meta(spark):
    """Re-running CREATE DATABASE IF NOT EXISTS must not wipe the
    recorded comment/properties (review fix)."""
    env = TableEnvironment(spark)
    env.execute_sql("CREATE DATABASE keepme COMMENT 'kept' WITH ('a'='1')")
    env.execute_sql("CREATE DATABASE IF NOT EXISTS keepme")
    info = {r["info_name"]: r["info_value"]
            for r in env.execute_sql("DESCRIBE DATABASE EXTENDED keepme").collect()}
    assert info["comment"] == "kept" and info["property:a"] == "1"


def test_catalog_double_underscore_names(spark, tmp_path):
    """Catalog/db names containing double underscores resolve correctly
    through the mangled-view reconstruction (review fix: regex splitting
    mis-parsed them)."""
    src = tmp_path / "du.csv"
    src.write_text("k\n7\n")
    env = TableEnvironment(spark)
    env.execute_sql("CREATE CATALOG my__cat WITH ('default-database'='d__1')")
    env.execute_sql("USE CATALOG my__cat")
    env.execute_sql(f"""
        CREATE TABLE t (k BIGINT) WITH (
            'connector'='filesystem','path'='{src}','format'='csv')""")
    env.execute_sql("USE CATALOG default_catalog")
    assert env.execute_sql(
        "SELECT k FROM my__cat.d__1.t"
    ).collect()[0]["k"] == 7
    # DDL through the qualified name exercises _resolve_meta on __ctl_
    env.execute_sql("ANALYZE TABLE my__cat.d__1.t COMPUTE STATISTICS")


def test_stop_job_with_drain_bounded_and_finished_listing(spark, tmp_path):
    """STOP JOB ... WITH DRAIN is bounded even on an unbounded source
    (review fix), and an env-started job stays visible as FINISHED in
    SHOW JOBS after stopping (Flink keeps terminal jobs listed)."""
    env = TableEnvironment(spark)
    env.execute_sql("""
        CREATE TABLE gen (ts TIMESTAMP, `value` BIGINT)
        WITH ('connector'='datagen', 'rows-per-second'='5')""")
    env.execute_sql("""
        CREATE TABLE sink (ts TIMESTAMP, `value` BIGINT)
        WITH ('connector'='blackhole')""")
    env.execute_sql("SET 'stop-job.drain-timeout-sec' = '2'")
    q = env.execute_sql(
        "INSERT INTO sink SELECT `timestamp` AS ts, `value` FROM gen"
    )
    try:
        import time as _time

        t0 = _time.time()
        env.execute_sql(f"STOP JOB '{q.id}' WITH DRAIN")
        assert _time.time() - t0 < 30  # bounded — rate source never quiesces
        assert not q.isActive
        jobs = {r["job_id"]: r["status"]
                for r in env.execute_sql("SHOW JOBS").collect()}
        assert jobs.get(q.id) == "FINISHED"
    finally:
        if q.isActive:
            q.stop()


def test_streaming_window_tvf_insert_end_to_end(spark, tmp_path):
    """Flink's flagship streaming-SQL shape end-to-end through
    executeSql: monitored-directory source with WATERMARK → TUMBLE
    window TVF aggregation → INSERT INTO filesystem sink. The dialect
    lowering (TABLE(TUMBLE(...)) → window()) must compose with the
    streaming scan, the watermark, and the append-mode file sink."""
    import json as _json

    src = tmp_path / "str_src"
    src.mkdir()
    rows0 = [
        {"ts": "2024-01-01T10:00:05", "v": 1.0},
        {"ts": "2024-01-01T10:00:40", "v": 2.0},
        {"ts": "2024-01-01T10:01:10", "v": 10.0},
    ]
    (src / "b0.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in rows0) + "\n"
    )
    out = tmp_path / "str_out"
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE str_src (
            ts TIMESTAMP(3), v DOUBLE,
            WATERMARK FOR ts AS ts - INTERVAL '1' SECOND
        ) WITH ('connector'='filesystem','path'='{src}',
                'format'='json','scan.streaming'='true')
    """)
    env.execute_sql(f"""
        CREATE TABLE str_sink (
            window_start TIMESTAMP(3), window_end TIMESTAMP(3),
            n BIGINT, total DOUBLE
        ) WITH ('connector'='filesystem','path'='{out}','format'='parquet',
                'checkpoint'='{tmp_path / "ckpt"}')
    """)
    q = env.execute_sql("""
        INSERT INTO str_sink
        SELECT window_start, window_end, count(*) AS n, sum(v) AS total
        FROM TABLE(TUMBLE(TABLE str_src, DESCRIPTOR(ts), INTERVAL '1' MINUTE))
        GROUP BY window_start, window_end
    """)
    try:
        q.processAllAvailable()
        # a later file advances the watermark past both earlier windows
        (src / "b1.jsonl").write_text(
            _json.dumps({"ts": "2024-01-01T10:05:00", "v": 0.5}) + "\n"
        )
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (str(r["window_start"]), r["n"], r["total"])
        for r in spark.read.parquet(str(out)).collect()
    }
    assert ("2024-01-01 10:00:00", 2, 3.0) in got
    assert ("2024-01-01 10:01:00", 1, 10.0) in got


def test_streaming_window_join_through_executesql(spark, tmp_path):
    """Streaming window JOIN (StreamExecWindowJoin.java): two
    watermarked monitored-dir streams, each windowed by a TUMBLE TVF,
    joined on key + window_start + window_end — rows pair only within
    the same window. Runs end-to-end through executeSql into a
    filesystem sink."""
    import json as _json

    lsrc, rsrc = tmp_path / "wj_l", tmp_path / "wj_r"
    lsrc.mkdir()
    rsrc.mkdir()
    (lsrc / "b0.jsonl").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"ts": "2024-01-01T10:00:05", "k": 1, "lv": 10.0},
                {"ts": "2024-01-01T10:00:50", "k": 2, "lv": 20.0},
                {"ts": "2024-01-01T10:01:10", "k": 1, "lv": 30.0},
            ]
        )
        + "\n"
    )
    (rsrc / "b0.jsonl").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"ts": "2024-01-01T10:00:20", "k": 1, "rv": 1.0},
                # k=2 in a DIFFERENT window than the left k=2 row
                {"ts": "2024-01-01T10:01:30", "k": 2, "rv": 2.0},
                {"ts": "2024-01-01T10:01:40", "k": 1, "rv": 3.0},
            ]
        )
        + "\n"
    )
    out = tmp_path / "wj_out"
    env = TableEnvironment(spark)
    for name, path, vcol in (("wj_l", lsrc, "lv"), ("wj_r", rsrc, "rv")):
        env.execute_sql(f"""
            CREATE TABLE {name} (
                ts TIMESTAMP(3), k INT, {vcol} DOUBLE,
                WATERMARK FOR ts AS ts - INTERVAL '1' SECOND
            ) WITH ('connector'='filesystem','path'='{path}',
                    'format'='json','scan.streaming'='true')
        """)
    env.execute_sql(f"""
        CREATE TABLE wj_sink (
            k INT, lv DOUBLE, rv DOUBLE, window_start TIMESTAMP(3)
        ) WITH ('connector'='filesystem','path'='{out}','format'='parquet',
                'checkpoint'='{tmp_path / "wj_ckpt"}')
    """)
    q = env.execute_sql("""
        INSERT INTO wj_sink
        SELECT L.k AS k, L.lv AS lv, R.rv AS rv,
               L.window_start AS window_start
        FROM (SELECT * FROM TABLE(TUMBLE(TABLE wj_l, DESCRIPTOR(ts),
                                         INTERVAL '1' MINUTE))) L
        JOIN (SELECT * FROM TABLE(TUMBLE(TABLE wj_r, DESCRIPTOR(ts),
                                         INTERVAL '1' MINUTE))) R
        ON L.k = R.k AND L.window_start = R.window_start
           AND L.window_end = R.window_end
    """)
    try:
        q.processAllAvailable()
        # advance both watermarks so all windows can emit
        for src in (lsrc, rsrc):
            (src / "b1.jsonl").write_text(
                _json.dumps(
                    {"ts": "2024-01-01T10:10:00", "k": 9,
                     ("lv" if src is lsrc else "rv"): 0.0}
                )
                + "\n"
            )
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["k"], r["lv"], r["rv"], str(r["window_start"]))
        for r in spark.read.parquet(str(out)).collect()
    }
    # window 10:00: (k=1, lv=10) x (k=1, rv=1). k=2 pairs nothing
    # (left in 10:00, right in 10:01). window 10:01: (1, 30) x (1, 3).
    assert (1, 10.0, 1.0, "2024-01-01 10:00:00") in got
    assert (1, 30.0, 3.0, "2024-01-01 10:01:00") in got
    assert all(k != 2 for k, *_ in got)
    # the lowering must join on the window STRUCT (state eviction —
    # probed: projected-timestamp equality never evicts join state)
    df = env.execute_sql("""
        SELECT L.k AS k, L.lv AS lv, R.rv AS rv
        FROM (SELECT * FROM TABLE(TUMBLE(TABLE wj_l, DESCRIPTOR(ts),
                                         INTERVAL '1' MINUTE))) L
        JOIN (SELECT * FROM TABLE(TUMBLE(TABLE wj_r, DESCRIPTOR(ts),
                                         INTERVAL '1' MINUTE))) R
        ON L.k = R.k AND L.window_start = R.window_start
           AND L.window_end = R.window_end
    """)
    assert df.isStreaming
    # the JOIN CONDITION itself must equate the window structs — mere
    # __w presence in the plan is satisfied by the EXCEPT projections
    # of the non-upgraded form too (a prior assert passed spuriously)
    import re as _re

    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert _re.search(r"__w#\d+\S* = __w#\d+", analyzed)
    # LEFT window join: Spark rejects outer stream-stream joins without
    # a watermarked join key — the struct upgrade IS that key
    ldf = env.execute_sql("""
        SELECT L.k AS k, L.lv AS lv, R.rv AS rv
        FROM (SELECT * FROM TABLE(TUMBLE(TABLE wj_l, DESCRIPTOR(ts),
                                         INTERVAL '1' MINUTE))) L
        LEFT JOIN (SELECT * FROM TABLE(TUMBLE(TABLE wj_r, DESCRIPTOR(ts),
                                         INTERVAL '1' MINUTE))) R
        ON L.k = R.k AND L.window_start = R.window_start
           AND L.window_end = R.window_end
    """)
    lq = ldf.writeStream.format("memory").queryName("wj_left").start()
    try:
        lq.processAllAvailable()
    finally:
        lq.stop()
    # left rows survive unmatched (k=2 pairs nothing but must appear
    # once its window closes — watermark already advanced by b1)
    left_rows = {
        (r["k"], r["lv"], r["rv"])
        for r in spark.sql("SELECT * FROM wj_left").collect()
    }
    assert (2, 20.0, None) in left_rows
    # review fix: a MULTIPLICATION star in the outermost list is not a
    # projection star — the upgrade still applies (without it, this
    # LEFT join could not start at all)
    mdf = env.execute_sql("""
        SELECT L.k AS k, L.lv * 2 AS dlv, R.rv AS rv
        FROM (SELECT * FROM TABLE(TUMBLE(TABLE wj_l, DESCRIPTOR(ts),
                                         INTERVAL '1' MINUTE))) L
        LEFT JOIN (SELECT * FROM TABLE(TUMBLE(TABLE wj_r, DESCRIPTOR(ts),
                                         INTERVAL '1' MINUTE))) R
        ON L.k = R.k AND L.window_start = R.window_start
           AND L.window_end = R.window_end
    """)
    mq = mdf.writeStream.format("memory").queryName("wj_mult").start()
    try:
        mq.processAllAvailable()
    finally:
        mq.stop()
    assert (2, 40.0, None) in {
        (r["k"], r["dlv"], r["rv"])
        for r in spark.sql("SELECT * FROM wj_mult").collect()
    }
    # review fix: a QUALIFIED star (SELECT L.*) must not take the
    # struct-join upgrade — it would leak the hidden __w column into
    # the output schema; the guard falls back to the EXCEPT(__w) form
    starred = env.execute_sql("""
        SELECT L.*, R.rv
        FROM (SELECT * FROM TABLE(TUMBLE(TABLE wj_l, DESCRIPTOR(ts),
                                         INTERVAL '1' MINUTE))) L
        JOIN (SELECT * FROM TABLE(TUMBLE(TABLE wj_r, DESCRIPTOR(ts),
                                         INTERVAL '1' MINUTE))) R
        ON L.k = R.k AND L.window_start = R.window_start
           AND L.window_end = R.window_end
    """)
    assert "__w" not in starred.columns


def test_distributed_by_bucketed_table(spark, tmp_path):
    """FLIP-376 bucketed tables (SqlDistribution.java): DISTRIBUTED BY
    [HASH|RANGE] (cols) [INTO n BUCKETS] clusters every write by the
    bucket key into the bucket count — same-key rows land in one file
    (co-located reads); SHOW CREATE TABLE renders the clause; ALTER
    TABLE DROP DISTRIBUTION removes it; bucket keys must be physical
    columns."""
    import os

    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE bt (k INT, v DOUBLE)
        DISTRIBUTED BY HASH(k) INTO 2 BUCKETS
        WITH ('connector'='filesystem','path'='{tmp_path}/bt',
              'format'='parquet')
    """)
    env.execute_sql(
        "INSERT INTO bt SELECT id AS k, CAST(id AS DOUBLE) AS v "
        "FROM (SELECT explode(sequence(1, 100)) AS id)"
    )
    files = [
        f for f in os.listdir(tmp_path / "bt")
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    ]
    assert len(files) == 2  # bucket count drives the file count
    # each key lives in exactly ONE file (hash clustering)
    per_file = [
        {r["k"] for r in spark.read.parquet(str(tmp_path / "bt" / f)).collect()}
        for f in files
    ]
    assert per_file[0].isdisjoint(per_file[1])
    assert per_file[0] | per_file[1] == set(range(1, 101))
    ddl = env.execute_sql("SHOW CREATE TABLE bt").collect()[0][0]
    assert "DISTRIBUTED BY HASH(`k`) INTO 2 BUCKETS" in ddl
    env.execute_sql("ALTER TABLE bt DROP DISTRIBUTION")
    assert "DISTRIBUTED" not in env.execute_sql(
        "SHOW CREATE TABLE bt"
    ).collect()[0][0]
    with pytest.raises(ValueError, match="physical columns"):
        env.execute_sql(f"""
            CREATE TABLE bt2 (k INT) DISTRIBUTED BY (nope) WITH (
              'connector'='filesystem','path'='{tmp_path}/bt2',
              'format'='parquet')
        """)
    # review fixes: degenerate specs rejected at CREATE time
    with pytest.raises(ValueError, match="at least 1"):
        env.execute_sql(f"""
            CREATE TABLE bt3 (k INT) DISTRIBUTED BY (k) INTO 0 BUCKETS
            WITH ('connector'='filesystem','path'='{tmp_path}/bt3',
                  'format'='parquet')
        """)
    with pytest.raises(ValueError, match="bucket columns or a bucket count"):
        env.execute_sql(f"""
            CREATE TABLE bt4 (k INT) DISTRIBUTED BY () WITH (
              'connector'='filesystem','path'='{tmp_path}/bt4',
              'format'='parquet')
        """)
    # review fix: DISTRIBUTED text inside a string literal is DATA —
    # the clause scan must not excise it from the stored option
    weird = tmp_path / "DISTRIBUTED INTO 3 BUCKETS"
    env.execute_sql(f"""
        CREATE TABLE bt5 (k INT) WITH (
          'connector'='filesystem','path'='{weird}','format'='parquet')
    """)
    ddl5 = env.execute_sql("SHOW CREATE TABLE bt5").collect()[0][0]
    assert "DISTRIBUTED INTO 3 BUCKETS'" in ddl5  # path intact
    assert not ddl5.strip().startswith("CREATE TABLE `bt5` (\n\n)")
    env.execute_sql("INSERT INTO bt5 VALUES (1)")
    assert env.execute_sql("SELECT * FROM bt5").collect() == [(1,)]


def test_compact_reset_modules_show_create_catalog(spark, tmp_path):
    """ALTER TABLE [PARTITION] COMPACT rewrites small files into the
    size-targeted count (SqlAlterTableCompact.java — filesystem batch
    compaction) without changing rows; ALTER TABLE RESET drops options;
    USE MODULES validates against the loaded set; SHOW CREATE CATALOG
    reconstructs the DDL."""
    import os

    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE ct (k INT, v DOUBLE) WITH (
          'connector'='filesystem','path'='{tmp_path}/ct',
          'format'='parquet')
    """)
    # 5 separate inserts → at least 5 small files
    for i in range(5):
        env.execute_sql(f"INSERT INTO ct VALUES ({i}, {float(i)})")
    n_files = lambda: len([
        f for f in os.listdir(tmp_path / "ct")
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    ])
    assert n_files() >= 5
    before = sorted(tuple(r) for r in env.execute_sql("SELECT * FROM ct").collect())
    env.execute_sql("ALTER TABLE ct COMPACT")
    assert n_files() == 1  # tiny table → one target-size file
    after = sorted(tuple(r) for r in env.execute_sql("SELECT * FROM ct").collect())
    assert after == before
    # partition-scoped compaction touches only the named partition
    env.execute_sql(f"""
        CREATE TABLE cp (id INT, dt STRING) PARTITIONED BY (dt) WITH (
          'connector'='filesystem','path'='{tmp_path}/cp',
          'format'='parquet')
    """)
    for i in range(3):
        env.execute_sql(f"INSERT INTO cp VALUES ({i}, '2024-01-01')")
    env.execute_sql("INSERT INTO cp VALUES (9, '2024-01-02')")
    env.execute_sql("ALTER TABLE cp PARTITION (dt='2024-01-01') COMPACT")
    p1 = [
        f for f in os.listdir(tmp_path / "cp" / "dt=2024-01-01")
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    ]
    assert len(p1) == 1
    got = sorted(tuple(r) for r in env.execute_sql("SELECT * FROM cp").collect())
    assert got == [(0, "2024-01-01"), (1, "2024-01-01"), (2, "2024-01-01"), (9, "2024-01-02")]
    # review fix: a crashed partition swap (live dir renamed to the
    # dot-prefixed park, replacement never landed) is recovered by the
    # next maintenance op before it reads anything
    import shutil as _sh

    _sh.move(
        str(tmp_path / "cp" / "dt=2024-01-02"),
        str(tmp_path / "cp" / ".__compact_old__dt=2024-01-02"),
    )
    env.execute_sql("ALTER TABLE cp COMPACT")
    got = sorted(tuple(r) for r in env.execute_sql("SELECT * FROM cp").collect())
    assert got == [(0, "2024-01-01"), (1, "2024-01-01"), (2, "2024-01-01"), (9, "2024-01-02")]
    # partitioned + DISTRIBUTED: partition-scoped compaction rewrites
    # into the bucketed layout, not a size-based coalesce
    env.execute_sql(f"""
        CREATE TABLE cpd (id INT, dt STRING)
        DISTRIBUTED BY HASH(id) INTO 2 BUCKETS
        PARTITIONED BY (dt) WITH (
          'connector'='filesystem','path'='{tmp_path}/cpd',
          'format'='parquet')
    """)
    env.execute_sql(
        "INSERT INTO cpd SELECT id, '2024-01-01' FROM "
        "(SELECT explode(sequence(1, 20)) AS id)"
    )
    env.execute_sql("ALTER TABLE cpd PARTITION (dt='2024-01-01') COMPACT")
    pfiles = [
        f for f in os.listdir(tmp_path / "cpd" / "dt=2024-01-01")
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    ]
    assert len(pfiles) == 2  # bucket count, not 1 size-based file
    # ALTER TABLE RESET drops an option; connector is not resettable
    env.execute_sql("ALTER TABLE ct SET ('k1' = 'v1')")
    assert "'k1' = 'v1'" in env.execute_sql("SHOW CREATE TABLE ct").collect()[0][0]
    env.execute_sql("ALTER TABLE ct RESET ('k1')")
    assert "'k1'" not in env.execute_sql("SHOW CREATE TABLE ct").collect()[0][0]
    with pytest.raises(ValueError, match="connector"):
        env.execute_sql("ALTER TABLE ct RESET ('connector')")
    # review fixes: required factory options cannot be reset (popping
    # 'path' would wedge the table), empty key lists are an error, and
    # compaction.file-size parses MemorySize units / rejects zero
    with pytest.raises(ValueError, match="required option"):
        env.execute_sql("ALTER TABLE ct RESET ('path')")
    with pytest.raises(ValueError, match="at least one key"):
        env.execute_sql("ALTER TABLE ct RESET ()")
    env.execute_sql("ALTER TABLE ct SET ('compaction.file-size' = '64mb')")
    env.execute_sql("ALTER TABLE ct COMPACT")  # parses the unit form
    assert n_files() == 1
    env.execute_sql("ALTER TABLE ct SET ('compaction.file-size' = '0')")
    with pytest.raises(ValueError, match="positive"):
        env.execute_sql("ALTER TABLE ct COMPACT")
    env.execute_sql("ALTER TABLE ct RESET ('compaction.file-size')")
    # USE MODULES
    env.execute_sql("USE MODULES core")
    with pytest.raises(ValueError, match="hive"):
        env.execute_sql("USE MODULES hive, core")
    # SHOW CREATE CATALOG (review fix: declared default-database must
    # replay, and USE drift must not change it)
    env.execute_sql(
        "CREATE CATALOG sc_cat COMMENT 'c' WITH "
        "('type'='generic_in_memory','default-database'='mydb')"
    )
    ddl = env.execute_sql("SHOW CREATE CATALOG sc_cat").collect()[0][0]
    assert "CREATE CATALOG `sc_cat`" in ddl and "COMMENT 'c'" in ddl
    assert "'default-database' = 'mydb'" in ddl


def test_insert_positional_binding_and_rename(spark, tmp_path):
    """INSERT binds the query output to the sink columns POSITIONALLY
    with implicit casts (DynamicSinkUtils.validateSchemaAndApplyImplicitCast):
    VALUES tuples with generated names land in the declared columns,
    and after RENAME COLUMN new files keep the PHYSICAL column name so
    reads through the rename mapping see every row."""
    env = TableEnvironment(spark)
    spark.createDataFrame([(1, 2.0)], "id int, v double").write.parquet(
        str(tmp_path / "t")
    )
    env.execute_sql(f"""
        CREATE TABLE pb (id INT, v DOUBLE) WITH (
          'connector'='filesystem','path'='{tmp_path}/t',
          'format'='parquet')
    """)
    env.execute_sql("INSERT INTO pb VALUES (2, 9)")  # int 9 casts to DOUBLE
    got = sorted(tuple(r) for r in env.execute_sql("SELECT * FROM pb").collect())
    assert got == [(1, 2.0), (2, 9.0)]
    env.execute_sql("ALTER TABLE pb RENAME v TO val")
    env.execute_sql("INSERT INTO pb VALUES (3, 7.5)")
    got = sorted(tuple(r) for r in env.execute_sql("SELECT id, val FROM pb").collect())
    assert got == [(1, 2.0), (2, 9.0), (3, 7.5)]
    with pytest.raises(ValueError, match="columns"):
        env.execute_sql("INSERT INTO pb VALUES (1)")


def test_delete_from_and_update(spark, tmp_path):
    """FLIP-282 batch row-level modifications (DeleteTableITCase /
    UpdateTableITCase semantics): DELETE removes rows where the
    condition is TRUE (NULL keeps the row), UPDATE applies assignments
    whose right-hand sides see the OLD row values, both return one
    rows_affected row, and streaming tables reject with Flink's
    message."""
    env = TableEnvironment(spark)
    spark.createDataFrame(
        [(1, "a", 2.0), (2, "b", 5.0), (3, "a", None), (4, "c", 1.0)],
        "id int, g string, v double",
    ).write.parquet(str(tmp_path / "t"))
    env.execute_sql(f"""
        CREATE TABLE rl_t (id INT, g STRING, v DOUBLE) WITH (
            'connector'='filesystem','path'='{tmp_path / "t"}',
            'format'='parquet')
    """)
    r = env.execute_sql("DELETE FROM rl_t WHERE v > 1.5").collect()
    assert r == [(2,)]  # NULL condition keeps id=3
    got = sorted(tuple(x) for x in env.execute_sql("SELECT * FROM rl_t").collect())
    assert got == [(3, "a", None), (4, "c", 1.0)]
    # UPDATE: both assignments see the OLD row; declared types kept
    r = env.execute_sql(
        "UPDATE rl_t SET v = coalesce(v, 0) + 10, g = upper(g) WHERE id = 3"
    ).collect()
    assert r == [(1,)]
    got = sorted(tuple(x) for x in env.execute_sql("SELECT * FROM rl_t").collect())
    assert got == [(3, "A", 10.0), (4, "c", 1.0)]
    assert env.execute_sql("SELECT * FROM rl_t").schema["v"].dataType.typeName() == "double"
    # unconditional DELETE empties the table
    r = env.execute_sql("DELETE FROM rl_t").collect()
    assert r == [(2,)]
    assert env.execute_sql("SELECT * FROM rl_t").collect() == []
    # validation: unknown column / computed-column assignment
    with pytest.raises(ValueError, match="unknown column"):
        env.execute_sql("UPDATE rl_t SET nope = 1")
    # review fix: WHERE inside a SET string literal is data, not a
    # clause boundary
    env.execute_sql("INSERT INTO rl_t VALUES (1, 'x', 0.0)")
    r = env.execute_sql("UPDATE rl_t SET g = 'a WHERE b' WHERE id = 1").collect()
    assert r == [(1,)]
    assert env.execute_sql("SELECT g FROM rl_t").collect()[0][0] == "a WHERE b"
    # r8 advice fix: a WHERE inside a SET subquery is the subquery's,
    # not the statement's — the split is paren-depth-aware
    env.execute_sql("INSERT INTO rl_t VALUES (2, 'y', 7.0)")
    r = env.execute_sql(
        "UPDATE rl_t SET v = (SELECT max(v) FROM rl_t WHERE g = 'y') WHERE id = 1"
    ).collect()
    assert r == [(1,)]
    got = sorted(tuple(x) for x in env.execute_sql("SELECT id, v FROM rl_t").collect())
    assert got == [(1, 7.0), (2, 7.0)]


def test_delete_partition_pushdown(spark, tmp_path):
    """Partition-key equality DELETE takes the pushdown path
    (DeletePushDownUtils analog): matching partition directories are
    dropped without rewriting data; non-partition predicates take the
    row-level rewrite; partition keys are not assignable by UPDATE."""
    import os

    env = TableEnvironment(spark)
    spark.createDataFrame(
        [(1, "x", "2024-01-01"), (2, "y", "2024-01-02"), (3, "z", "2024-01-01")],
        "id int, s string, dt string",
    ).write.partitionBy("dt").parquet(str(tmp_path / "p"))
    env.execute_sql(f"""
        CREATE TABLE rl_p (id INT, s STRING, dt STRING)
        PARTITIONED BY (dt) WITH (
            'connector'='filesystem','path'='{tmp_path / "p"}',
            'format'='parquet')
    """)
    r = env.execute_sql("DELETE FROM rl_p WHERE dt = '2024-01-01'").collect()
    assert r == [(2,)]
    # the directory itself is gone — no rewrite of the surviving one
    assert not os.path.exists(tmp_path / "p" / "dt=2024-01-01")
    assert os.path.exists(tmp_path / "p" / "dt=2024-01-02")
    got = sorted(tuple(x) for x in env.execute_sql("SELECT * FROM rl_p").collect())
    assert got == [(2, "y", "2024-01-02")]
    # row-level path on a partitioned table preserves the layout
    r = env.execute_sql("DELETE FROM rl_p WHERE s = 'nope'").collect()
    assert r == [(0,)]
    assert os.path.exists(tmp_path / "p" / "dt=2024-01-02")
    with pytest.raises(ValueError, match="partition key"):
        env.execute_sql("UPDATE rl_p SET dt = 'x' WHERE id = 2")
    # review fix: a glob metacharacter in the literal is DATA, not a
    # wildcard — it matches no directory instead of every directory
    r = env.execute_sql("DELETE FROM rl_p WHERE dt = '*'").collect()
    assert r == [(0,)]
    assert os.path.exists(tmp_path / "p" / "dt=2024-01-02")
    # review fix: after RENAME COLUMN the directories keep the PHYSICAL
    # name — pushdown must glob dt=..., not day=...
    env.execute_sql("ALTER TABLE rl_p RENAME dt TO day")
    r = env.execute_sql("DELETE FROM rl_p WHERE day = '2024-01-02'").collect()
    assert r == [(1,)]
    assert not os.path.exists(tmp_path / "p" / "dt=2024-01-02")
    assert env.execute_sql("SELECT * FROM rl_p").collect() == []
    # streaming targets reject with Flink's TableException text
    src = tmp_path / "rl_s"
    src.mkdir()
    env.execute_sql(f"""
        CREATE TABLE rl_s (v INT) WITH (
          'connector'='filesystem','path'='{src}',
          'format'='json','scan.streaming'='true')
    """)
    with pytest.raises(ValueError, match="streaming mode"):
        env.execute_sql("DELETE FROM rl_s WHERE v = 1")
    with pytest.raises(ValueError, match="streaming mode"):
        env.execute_sql("UPDATE rl_s SET v = 2")


def test_streaming_intersect_and_except(spark, tmp_path):
    """Streaming set ops through executeSql: INTERSECT [DISTINCT]
    lowers to dedup-both-sides + stream-stream inner join on null-safe
    keys (StreamExecIntersect semantics in append mode — each common
    row emits once, including matches completed by a LATER batch);
    EXCEPT and INTERSECT ALL need retraction state and reject with a
    pointer to the changelog facade instead of Spark's raw
    checker error at query start."""
    import json as _json

    env = TableEnvironment(spark)
    for name, ks in (("si_a", [1, 2, 2, 3]), ("si_b", [2, 3, 4])):
        p = tmp_path / name
        p.mkdir()
        (p / "b0.jsonl").write_text(
            "\n".join(_json.dumps({"k": k}) for k in ks) + "\n"
        )
        env.execute_sql(f"""
            CREATE TABLE {name} (k INT) WITH (
              'connector'='filesystem','path'='{p}',
              'format'='json','scan.streaming'='true')
        """)
    df = env.execute_sql("SELECT k FROM si_a INTERSECT SELECT k FROM si_b")
    assert df.isStreaming
    q = (
        df.writeStream.format("memory")
        .queryName("si_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # a later batch completes the k=1 match
        (tmp_path / "si_b" / "b1.jsonl").write_text(_json.dumps({"k": 1}) + "\n")
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r[0] for r in spark.sql("SELECT * FROM si_out").collect())
    assert got == [1, 2, 3]  # distinct; 4 is right-only
    with pytest.raises(ValueError, match="changelog facade"):
        env.execute_sql("SELECT k FROM si_a EXCEPT SELECT k FROM si_b")
    with pytest.raises(ValueError, match="INTERSECT ALL"):
        env.execute_sql("SELECT k FROM si_a INTERSECT ALL SELECT k FROM si_b")
    # review fixes: the scanner matches SET OPERATORS only — a
    # star-EXCEPT projection and comment text are not set ops
    df = env.execute_sql("SELECT * EXCEPT(k), k FROM si_a")
    assert df.isStreaming and df.columns == ["k"]
    df = env.execute_sql("SELECT k FROM si_a -- except late rows")
    assert df.isStreaming
    # explicit DISTINCT spelling and a chained INTERSECT both lower
    df = env.execute_sql(
        "SELECT k FROM si_a INTERSECT DISTINCT SELECT k FROM si_b"
    )
    assert df.isStreaming
    df = env.execute_sql(
        "SELECT k FROM si_a INTERSECT SELECT k FROM si_b "
        "INTERSECT SELECT k FROM si_a"
    )
    assert df.isStreaming


def test_streaming_group_agg_upsert_insert(spark, tmp_path):
    """Non-windowed streaming GROUP BY through executeSql
    (StreamExecGroupAggregate — Flink's canonical continuous query):
    the plan emits an updating changelog, so an append-only file sink
    must reject it unless the sink declares a PRIMARY KEY, in which
    case the insert runs as per-epoch keyed upsert materialization
    (SinkUpsertMaterializer.java). Reads through the environment see
    the current snapshot — including before any data exists and after
    upsert epochs swap the backing directory."""
    import json as _json

    src = tmp_path / "ua_src"
    src.mkdir()
    (src / "b0.jsonl").write_text(
        _json.dumps({"k": 1, "v": 2.0}) + "\n"
        + _json.dumps({"k": 2, "v": 5.0}) + "\n"
    )
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE ua_src (k INT, v DOUBLE) WITH (
          'connector'='filesystem','path'='{src}',
          'format'='json','scan.streaming'='true')
    """)
    # append-only sink (no PK): Flink's exact rejection class
    env.execute_sql(f"""
        CREATE TABLE ua_nopk (k INT, cnt BIGINT, total DOUBLE) WITH (
          'connector'='filesystem','path'='{tmp_path}/ua_nopk',
          'format'='parquet')
    """)
    with pytest.raises(ValueError, match="update changes"):
        env.execute_sql(
            "INSERT INTO ua_nopk SELECT k, COUNT(*) AS cnt, "
            "SUM(v) AS total FROM ua_src GROUP BY k"
        )
    env.execute_sql(f"""
        CREATE TABLE ua_sink (
            k INT, cnt BIGINT, total DOUBLE,
            PRIMARY KEY (k) NOT ENFORCED
        ) WITH ('connector'='filesystem','path'='{tmp_path}/ua_sink',
                'format'='parquet')
    """)
    # sink-first read: registered before any file exists
    assert env.execute_sql("SELECT * FROM ua_sink").collect() == []
    q = env.execute_sql(
        "INSERT INTO ua_sink SELECT k, COUNT(*) AS cnt, "
        "SUM(v) AS total FROM ua_src GROUP BY k"
    )
    try:
        q.processAllAvailable()
        got = {
            tuple(r)
            for r in env.execute_sql("SELECT * FROM ua_sink").collect()
        }
        assert got == {(1, 1, 2.0), (2, 1, 5.0)}
        # second batch UPDATES key 1 in place (not append)
        (src / "b1.jsonl").write_text(_json.dumps({"k": 1, "v": 3.0}) + "\n")
        q.processAllAvailable()
        got = {
            tuple(r)
            for r in env.execute_sql("SELECT * FROM ua_sink").collect()
        }
        assert got == {(1, 2, 5.0), (2, 1, 5.0)}
    finally:
        q.stop()
    # after the job ends the final snapshot stays readable and the
    # per-statement refresh list drains
    got = {
        tuple(r) for r in env.execute_sql("SELECT * FROM ua_sink").collect()
    }
    assert got == {(1, 2, 5.0), (2, 1, 5.0)}
    assert env._live_sink_views == {}


def test_streaming_upsert_insert_reexecute_resumes(spark, tmp_path):
    """Re-executing the SAME updating INSERT INTO a PK sink (stop →
    execute_sql again, e.g. job restart) resumes from the sink-derived
    checkpoint AND must not corrupt the live table (FOUND by the r11
    upsert_agg restart differential): every execution first attempts an
    append FileStreamSink, whose failed start drops a _spark_metadata
    log into the sink directory — on re-execution that directory holds
    the live upsert table, and the leftover log made the merge's plain
    parquet read of its own table resolve against the empty sink log.
    The fallback now scrubs the droppings."""
    import json as _json

    src = tmp_path / "uar_src"
    src.mkdir()
    (src / "b0.jsonl").write_text(_json.dumps({"k": 1, "v": 2.0}) + "\n")
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE uar_src (k INT, v DOUBLE) WITH (
          'connector'='filesystem','path'='{src}',
          'format'='json','scan.streaming'='true')
    """)
    env.execute_sql(f"""
        CREATE TABLE uar_sink (
            k INT, cnt BIGINT, total DOUBLE,
            PRIMARY KEY (k) NOT ENFORCED
        ) WITH ('connector'='filesystem','path'='{tmp_path}/uar_sink',
                'format'='parquet')
    """)
    ins = (
        "INSERT INTO uar_sink SELECT k, COUNT(*) AS cnt, "
        "SUM(v) AS total FROM uar_src GROUP BY k"
    )
    q = env.execute_sql(ins)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # files pending at restart: the re-executed insert must pick them
    # up from recovered offsets and merge into the existing table
    (src / "b1.jsonl").write_text(
        _json.dumps({"k": 1, "v": 3.0}) + "\n"
        + _json.dumps({"k": 2, "v": 5.0}) + "\n"
    )
    q2 = env.execute_sql(ins)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = {
        tuple(r) for r in env.execute_sql("SELECT * FROM uar_sink").collect()
    }
    assert got == {(1, 2, 5.0), (2, 1, 5.0)}


def test_streaming_session_tvf_insert_end_to_end(spark, tmp_path):
    """Streaming SESSION window TVF through executeSql: the lowering
    switches to Spark's native session_window struct for streaming
    input (the batch gaps-and-islands rewrite cannot stream), and the
    group-fix keeps the struct in the GROUP BY."""
    import json as _json

    src = tmp_path / "sess_src"
    src.mkdir()
    rows0 = [
        {"uid": 1, "ts": "2024-01-01T10:00:00", "v": 1.0},
        {"uid": 1, "ts": "2024-01-01T10:00:10", "v": 2.0},  # same session (gap 1m)
        {"uid": 1, "ts": "2024-01-01T10:05:00", "v": 10.0},  # new session
        {"uid": 2, "ts": "2024-01-01T10:00:30", "v": 7.0},  # other key
    ]
    (src / "b0.jsonl").write_text("\n".join(_json.dumps(r) for r in rows0) + "\n")
    out = tmp_path / "sess_out"
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE sess_src (
            uid BIGINT, ts TIMESTAMP(3), v DOUBLE,
            WATERMARK FOR ts AS ts - INTERVAL '1' SECOND
        ) WITH ('connector'='filesystem','path'='{src}',
                'format'='json','scan.streaming'='true')
    """)
    env.execute_sql(f"""
        CREATE TABLE sess_sink (
            window_start TIMESTAMP(3), window_end TIMESTAMP(3),
            uid BIGINT, n BIGINT
        ) WITH ('connector'='filesystem','path'='{out}','format'='parquet',
                'checkpoint'='{tmp_path / "sess_ckpt"}')
    """)
    q = env.execute_sql("""
        INSERT INTO sess_sink
        SELECT window_start, window_end, uid, count(*) AS n
        FROM TABLE(SESSION(TABLE sess_src PARTITION BY uid,
                           DESCRIPTOR(ts), INTERVAL '1' MINUTE))
        GROUP BY window_start, window_end, uid
    """)
    try:
        q.processAllAvailable()
        (src / "b1.jsonl").write_text(
            _json.dumps({"uid": 1, "ts": "2024-01-01T10:30:00", "v": 0.0}) + "\n"
        )
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (str(r["window_start"]), str(r["window_end"]), r["uid"], r["n"])
        for r in spark.read.parquet(str(out)).collect()
    }
    # uid 1: two events 10s apart MERGE into one session ending last+gap
    assert ("2024-01-01 10:00:00", "2024-01-01 10:01:10", 1, 2) in got
    assert ("2024-01-01 10:05:00", "2024-01-01 10:06:00", 1, 1) in got
    assert ("2024-01-01 10:00:30", "2024-01-01 10:01:30", 2, 1) in got


def test_streaming_hop_tvf_insert_end_to_end(spark, tmp_path):
    """Streaming HOP (sliding) window TVF through executeSql — shares
    the __w struct lowering with TUMBLE, so the group-fix covers it."""
    import json as _json

    src = tmp_path / "hop_src"
    src.mkdir()
    (src / "b0.jsonl").write_text(
        _json.dumps({"ts": "2024-01-01T10:00:30", "v": 1.0}) + "\n"
    )
    out = tmp_path / "hop_out"
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE hop_src (
            ts TIMESTAMP(3), v DOUBLE,
            WATERMARK FOR ts AS ts - INTERVAL '1' SECOND
        ) WITH ('connector'='filesystem','path'='{src}',
                'format'='json','scan.streaming'='true')
    """)
    env.execute_sql(f"""
        CREATE TABLE hop_sink (
            window_start TIMESTAMP(3), n BIGINT
        ) WITH ('connector'='filesystem','path'='{out}','format'='parquet',
                'checkpoint'='{tmp_path / "hop_ckpt"}')
    """)
    q = env.execute_sql("""
        INSERT INTO hop_sink
        SELECT window_start, count(*) AS n
        FROM TABLE(HOP(TABLE hop_src, DESCRIPTOR(ts),
                       INTERVAL '1' MINUTE, INTERVAL '2' MINUTE))
        GROUP BY window_start, window_end
    """)
    try:
        q.processAllAvailable()
        (src / "b1.jsonl").write_text(
            _json.dumps({"ts": "2024-01-01T10:30:00", "v": 0.0}) + "\n"
        )
        q.processAllAvailable()
    finally:
        q.stop()
    starts = sorted(
        str(r["window_start"])
        for r in spark.read.parquet(str(out)).collect()
        if r["n"] == 1 and str(r["window_start"]) < "2024-01-01 10:20:00"
    )
    # the 10:00:30 event belongs to two 2-minute windows sliding by 1m
    assert starts == ["2024-01-01 09:59:00", "2024-01-01 10:00:00"]


def test_streaming_cumulate_tvf_non_aggregate_shape_error(spark, tmp_path):
    """A streaming CUMULATE outside the GROUP BY window_start/window_end
    aggregate shape still raises the documented facade pointer instead
    of Spark's obscure append-mode failure."""
    import json as _json

    src = tmp_path / "cum_src_e"
    src.mkdir()
    (src / "b0.jsonl").write_text(
        _json.dumps({"ts": "2024-01-01T10:00:05", "v": 1.0}) + "\n"
    )
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE cum_src_e (
            ts TIMESTAMP(3), v DOUBLE,
            WATERMARK FOR ts AS ts - INTERVAL '1' SECOND
        ) WITH ('connector'='filesystem','path'='{src}',
                'format'='json','scan.streaming'='true')
    """)
    env.execute_sql(f"""
        CREATE TABLE cum_sink_e (window_end TIMESTAMP(3), n BIGINT)
        WITH ('connector'='filesystem','path'='{tmp_path / "cum_out_e"}',
              'format'='parquet')
    """)
    with pytest.raises(ValueError, match="cumulate_window_agg"):
        env.execute_sql("""
            INSERT INTO cum_sink_e
            SELECT window_end, count(*) AS n
            FROM TABLE(CUMULATE(TABLE cum_src_e, DESCRIPTOR(ts),
                                INTERVAL '1' MINUTE, INTERVAL '5' MINUTE))
            GROUP BY window_end
        """)


def test_streaming_match_recognize_through_executesql(spark, tmp_path):
    """MATCH_RECOGNIZE over a STREAMING table through executeSql — the
    CEP SQL surface lowered onto the keyed-state NFA operator
    (StreamExecMatch parity). A funnel whose pattern spans two
    micro-batches must emit exactly once."""
    import json as _json

    src = tmp_path / "cep_src"
    src.mkdir()
    rows0 = [
        {"uid": 1, "ts": "2024-01-01T10:00:00", "etype": "click"},
        {"uid": 1, "ts": "2024-01-01T10:00:10", "etype": "view"},
        {"uid": 2, "ts": "2024-01-01T10:00:05", "etype": "click"},
    ]
    (src / "b0.jsonl").write_text("\n".join(_json.dumps(r) for r in rows0) + "\n")
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE cep_src (
            uid BIGINT, ts TIMESTAMP(3), etype STRING,
            WATERMARK FOR ts AS ts - INTERVAL '1' SECOND
        ) WITH ('connector'='filesystem','path'='{src}',
                'format'='json','scan.streaming'='true')
    """)
    from flink_1_20_spark.streaming import run_to_memory

    out = env.execute_sql("""
        SELECT uid, n_steps
        FROM cep_src MATCH_RECOGNIZE (
            PARTITION BY uid
            ORDER BY ts
            MEASURES COUNT(*) AS n_steps
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A B C)
            DEFINE A AS A.etype = 'click',
                   B AS B.etype = 'view',
                   C AS C.etype = 'purchase'
        )
    """)
    assert out.isStreaming
    q = run_to_memory(out, "cep_sql_stream_out", output_mode="update")
    try:
        q.processAllAvailable()
        assert spark.table("cep_sql_stream_out").count() == 0  # no purchase yet
        # the completing event arrives in a LATER batch
        (src / "b1.jsonl").write_text(
            _json.dumps(
                {"uid": 1, "ts": "2024-01-01T10:00:20", "etype": "purchase"}
            )
            + "\n"
        )
        q.processAllAvailable()
        rows = spark.table("cep_sql_stream_out").collect()
        assert [(r["uid"], r["n_steps"]) for r in rows] == [(1, 3)]
        q.processAllAvailable()  # no duplicate emission on further batches
        assert spark.table("cep_sql_stream_out").count() == 1
    finally:
        q.stop()


def test_streaming_match_recognize_all_rows_per_match(spark, tmp_path):
    """ALL ROWS PER MATCH over a STREAMING table: one output row per
    bound input row of each COMPLETED match, with CLASSIFIER(), a
    per-key MATCH_NUMBER() stable across micro-batches, and RUNNING
    measures — the batch operator's emission, streamed append-safe."""
    import json as _json

    src = tmp_path / "cep_ar_src"
    src.mkdir()
    rows0 = [
        {"uid": 1, "ts": "2024-01-01T10:00:00", "etype": "click"},
        {"uid": 1, "ts": "2024-01-01T10:00:10", "etype": "view"},
    ]
    (src / "b0.jsonl").write_text("\n".join(_json.dumps(r) for r in rows0) + "\n")
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE cep_ar_src (
            uid BIGINT, ts TIMESTAMP(3), etype STRING,
            WATERMARK FOR ts AS ts - INTERVAL '1' SECOND
        ) WITH ('connector'='filesystem','path'='{src}',
                'format'='json','scan.streaming'='true')
    """)
    from flink_1_20_spark.streaming import run_to_memory

    out = env.execute_sql("""
        SELECT uid, ts, etype, step, mno, running_n
        FROM cep_ar_src MATCH_RECOGNIZE (
            PARTITION BY uid
            ORDER BY ts
            MEASURES CLASSIFIER() AS step,
                     MATCH_NUMBER() AS mno,
                     COUNT(*) AS running_n
            ALL ROWS PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A B)
            DEFINE A AS A.etype = 'click',
                   B AS B.etype = 'view'
        )
    """)
    assert out.isStreaming
    q = run_to_memory(out, "cep_ar_out", output_mode="update")
    try:
        q.processAllAvailable()
        rows = sorted(
            (r["mno"], str(r["ts"]), r["step"], r["running_n"])
            for r in spark.table("cep_ar_out").collect()
        )
        # first match: two rows, classifier per step, RUNNING count 1→2
        assert rows == [
            (1, "2024-01-01 10:00:00", "A", 1),
            (1, "2024-01-01 10:00:10", "B", 2),
        ]
        # a SECOND match in a later batch gets match_number 2 (state-kept)
        (src / "b1.jsonl").write_text(
            "\n".join(
                _json.dumps(r)
                for r in [
                    {"uid": 1, "ts": "2024-01-01T10:01:00", "etype": "click"},
                    {"uid": 1, "ts": "2024-01-01T10:01:05", "etype": "view"},
                ]
            )
            + "\n"
        )
        q.processAllAvailable()
        mnos = {r["mno"] for r in spark.table("cep_ar_out").collect()}
        assert mnos == {1, 2}
        assert spark.table("cep_ar_out").count() == 4
    finally:
        q.stop()


def test_streaming_dedup_rank_shape(spark, tmp_path):
    """Flink's streaming-dedup recognized shape (ROW_NUMBER ... WHERE
    rn = 1) over a streaming table lowers onto the dedup operator:
    keep-first dedups across micro-batches with watermark-bounded state;
    the rank column never reaches the output."""
    import json as _json

    src = tmp_path / "dd_src"
    src.mkdir()
    rows0 = [
        {"k": 1, "ts": "2024-01-01T10:00:00", "v": 1.0},
        {"k": 1, "ts": "2024-01-01T10:00:10", "v": 2.0},  # dup of k=1
        {"k": 2, "ts": "2024-01-01T10:00:05", "v": 7.0},
    ]
    (src / "b0.jsonl").write_text("\n".join(_json.dumps(r) for r in rows0) + "\n")
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE dd_src (
            k BIGINT, ts TIMESTAMP(3), v DOUBLE,
            WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
        ) WITH ('connector'='filesystem','path'='{src}',
                'format'='json','scan.streaming'='true')
    """)
    from flink_1_20_spark.streaming import run_to_memory

    out = env.execute_sql("""
        SELECT k, v FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY ts ASC) AS rn
            FROM dd_src
        ) WHERE rn = 1
    """)
    assert out.isStreaming
    assert out.columns == ["k", "v"]
    # exact event-time keep-first is an UPDATING result (Flink's
    # event-time dedup emits a changelog too) — complete-mode sink
    q = (
        out.writeStream.format("memory")
        .queryName("dd_out")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        # a later-arriving row with a LATER ts must still lose to the
        # first row per key; in-batch order does not matter (min_by)
        (src / "b1.jsonl").write_text(
            _json.dumps({"k": 2, "ts": "2024-01-01T10:00:06", "v": 9.0}) + "\n"
        )
        q.processAllAvailable()
        got = sorted(
            (r["k"], r["v"]) for r in spark.table("dd_out").collect()
        )
        assert got == [(1, 1.0), (2, 7.0)]
    finally:
        q.stop()
    # keep-last (ORDER BY ts DESC) is an UPDATING result via max_by
    last = env.execute_sql("""
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY ts DESC) AS rn
            FROM dd_src
        ) WHERE rn = 1
    """)
    assert last.isStreaming
    q2 = last.writeStream.format("memory").queryName("dd_last").outputMode(
        "complete"
    ).start()
    try:
        q2.processAllAvailable()
        got = {(r["k"], r["v"]) for r in spark.table("dd_last").collect()}
        assert got == {(1, 2.0), (2, 9.0)}  # latest row per key
    finally:
        q2.stop()
    # a BATCH table with the same shape stays on the Catalyst path
    env.execute_sql(f"""
        CREATE TABLE dd_batch (k BIGINT, ts TIMESTAMP(3), v DOUBLE)
        WITH ('connector'='filesystem','path'='{src}',
              'format'='json','scan.streaming'='false')
    """)
    rows = env.execute_sql("""
        SELECT k, v FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY ts ASC) AS rn
            FROM dd_batch
        ) WHERE rn = 1
    """).collect()
    assert sorted((r["k"], r["v"]) for r in rows) == [(1, 1.0), (2, 7.0)]


def test_streaming_top1_by_value_is_rank_not_dedup(spark, tmp_path):
    """ORDER BY a non-watermark column is a Top-1 RANK (StreamExecRank),
    not dedup: it lowers onto the streaming Top-N operator and tracks
    the minimum-value row per key across batches — NOT the
    first-arrived row (review fix, upgraded to full support)."""
    import json as _json

    src = tmp_path / "nt_src"
    src.mkdir()
    (src / "b0.jsonl").write_text(
        _json.dumps({"k": 1, "ts": "2024-01-01T10:00:00", "v": 5.0}) + "\n"
    )
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE nt_src (
            k BIGINT, ts TIMESTAMP(3), v DOUBLE,
            WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
        ) WITH ('connector'='filesystem','path'='{src}',
                'format'='json','scan.streaming'='true')
    """)
    from flink_1_20_spark.streaming import run_to_memory

    out = env.execute_sql("""
        SELECT k, v FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY v ASC) AS rn
            FROM nt_src
        ) WHERE rn = 1
    """)
    assert out.isStreaming
    q = run_to_memory(out, "nt_out", output_mode="update")
    try:
        q.processAllAvailable()
        # a SMALLER value arriving later must take over rank 1
        (src / "b1.jsonl").write_text(
            _json.dumps({"k": 1, "ts": "2024-01-01T10:00:10", "v": 2.0}) + "\n"
        )
        q.processAllAvailable()
        rows = [(r["k"], r["v"]) for r in spark.table("nt_out").collect()]
        assert rows[-1] == (1, 2.0)  # latest emission: the new minimum
    finally:
        q.stop()


def test_streaming_session_keys_forced_into_grouping(spark, tmp_path):
    """A SESSION TVF PARTITION BY key omitted from the user's GROUP BY
    must still partition the sessions — events of different keys closer
    than the gap may not merge (review fix)."""
    import json as _json

    src = tmp_path / "sk_src"
    src.mkdir()
    rows0 = [
        {"uid": 1, "ts": "2024-01-01T10:00:00", "v": 1.0},
        {"uid": 2, "ts": "2024-01-01T10:00:05", "v": 2.0},  # other key, close
    ]
    (src / "b0.jsonl").write_text("\n".join(_json.dumps(r) for r in rows0) + "\n")
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE sk_src (
            uid BIGINT, ts TIMESTAMP(3), v DOUBLE,
            WATERMARK FOR ts AS ts - INTERVAL '1' SECOND
        ) WITH ('connector'='filesystem','path'='{src}',
                'format'='json','scan.streaming'='true')
    """)
    from flink_1_20_spark.streaming import run_to_memory

    # GROUP BY omits uid, and the select formats window_start inside an
    # expression (exercises the expression-context substitution too)
    out = env.execute_sql("""
        SELECT date_format(window_start, 'HH:mm:ss') AS start_hms,
               count(*) AS n
        FROM TABLE(SESSION(TABLE sk_src PARTITION BY uid,
                           DESCRIPTOR(ts), INTERVAL '1' MINUTE))
        GROUP BY window_start, window_end
    """)
    q = run_to_memory(out, "sk_out", output_mode="append")
    try:
        q.processAllAvailable()
        (src / "b1.jsonl").write_text(
            _json.dumps({"uid": 1, "ts": "2024-01-01T10:30:00", "v": 0.0}) + "\n"
        )
        q.processAllAvailable()
        got = {(r["start_hms"], r["n"]) for r in spark.table("sk_out").collect()}
        # per-key sessions: two separate n=1 sessions, NOT one merged n=2
        assert ("10:00:00", 1) in got and ("10:00:05", 1) in got
        assert ("10:00:00", 2) not in got
    finally:
        q.stop()


def test_streaming_interval_join_through_executesql(spark, tmp_path):
    """Streaming interval join (StreamExecIntervalJoin) through plain
    executeSql: two watermarked streaming tables joined with a time-range
    predicate run as Spark's native stream-stream join — no lowering
    needed; this pins the surface end-to-end."""
    import json as _json

    lsrc, rsrc = tmp_path / "ij_l", tmp_path / "ij_r"
    lsrc.mkdir(), rsrc.mkdir()
    (lsrc / "b0.jsonl").write_text(
        _json.dumps({"k": 1, "lts": "2024-01-01T10:00:00", "lv": 1.0}) + "\n"
    )
    (rsrc / "b0.jsonl").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"k": 1, "rts": "2024-01-01T10:00:20", "rv": 5.0},  # within 1m
                {"k": 1, "rts": "2024-01-01T10:10:00", "rv": 9.0},  # outside
            ]
        )
        + "\n"
    )
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE ij_l (k BIGINT, lts TIMESTAMP(3), lv DOUBLE,
            WATERMARK FOR lts AS lts - INTERVAL '5' SECOND)
        WITH ('connector'='filesystem','path'='{lsrc}',
              'format'='json','scan.streaming'='true')""")
    env.execute_sql(f"""
        CREATE TABLE ij_r (k BIGINT, rts TIMESTAMP(3), rv DOUBLE,
            WATERMARK FOR rts AS rts - INTERVAL '5' SECOND)
        WITH ('connector'='filesystem','path'='{rsrc}',
              'format'='json','scan.streaming'='true')""")
    from flink_1_20_spark.streaming import run_to_memory

    out = env.execute_sql("""
        SELECT l.k, l.lv, r.rv
        FROM ij_l l JOIN ij_r r
          ON l.k = r.k
         AND r.rts BETWEEN l.lts - INTERVAL '1' MINUTE
                       AND l.lts + INTERVAL '1' MINUTE
    """)
    assert out.isStreaming
    q = run_to_memory(out, "ij_out", output_mode="append")
    try:
        q.processAllAvailable()
        got = {(r["k"], r["lv"], r["rv"]) for r in spark.table("ij_out").collect()}
        assert got == {(1, 1.0, 5.0)}  # only the within-interval pair
    finally:
        q.stop()


def test_streaming_topn_rank_shape(spark, tmp_path):
    """The rn <= N rank shape over a streaming table lowers onto
    streaming Top-N; the rank column is part of the output under the
    user's alias and outer projections may read it."""
    import json as _json

    src = tmp_path / "tn_src"
    src.mkdir()
    rows0 = [
        {"k": 1, "ts": "2024-01-01T10:00:00", "v": 10.0},
        {"k": 1, "ts": "2024-01-01T10:00:01", "v": 30.0},
        {"k": 1, "ts": "2024-01-01T10:00:02", "v": 20.0},
    ]
    (src / "b0.jsonl").write_text("\n".join(_json.dumps(r) for r in rows0) + "\n")
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE tn_src (
            k BIGINT, ts TIMESTAMP(3), v DOUBLE,
            WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
        ) WITH ('connector'='filesystem','path'='{src}',
                'format'='json','scan.streaming'='true')
    """)
    from flink_1_20_spark.streaming import run_to_memory

    out = env.execute_sql("""
        SELECT k, v, rnk FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC) AS rnk
            FROM tn_src
        ) WHERE rnk <= 2
    """)
    assert out.isStreaming
    assert out.columns == ["k", "v", "rnk"]
    q = run_to_memory(out, "tn_out", output_mode="update")
    try:
        q.processAllAvailable()
        got = {(r["k"], r["rnk"], r["v"]) for r in spark.table("tn_out").collect()}
        assert {(1, 1, 30.0), (1, 2, 20.0)} <= got
        assert all(r[1] <= 2 for r in got)
    finally:
        q.stop()
    # `rn = 3` (exact single rank) is not dedup/Top-N — falls through
    with pytest.raises(Exception):
        env.execute_sql("""
            SELECT k FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC) AS r
                FROM tn_src
            ) WHERE r = 3
        """).collect()


def test_streaming_rank_read_on_rowtime_routes_to_topn(spark, tmp_path):
    """rn <= 1 ordered by the rowtime WITH the outer reading the rank
    column routes to streaming Top-N (the rank is emitted) instead of
    falling through to a Catalyst failure (review fix)."""
    import json as _json

    src = tmp_path / "rr_src"
    src.mkdir()
    (src / "b0.jsonl").write_text(
        _json.dumps({"k": 1, "ts": "2024-01-01T10:00:00", "v": 1.0}) + "\n"
    )
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE rr_src (
            k BIGINT, ts TIMESTAMP(3), v DOUBLE,
            WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
        ) WITH ('connector'='filesystem','path'='{src}',
                'format'='json','scan.streaming'='true')
    """)
    from flink_1_20_spark.streaming import run_to_memory

    out = env.execute_sql("""
        SELECT k, ts, v, rn FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY ts ASC) AS rn
            FROM rr_src
        ) WHERE rn <= 1
    """)
    assert out.isStreaming and out.columns == ["k", "ts", "v", "rn"]
    q = run_to_memory(out, "rr_out", output_mode="update")
    try:
        q.processAllAvailable()
        rows = spark.table("rr_out").collect()
        assert [(r["k"], r["v"], r["rn"]) for r in rows] == [(1, 1.0, 1)]
    finally:
        q.stop()
    # degenerate shapes fall through instead of raising from the operator
    for bad in (
        "WHERE r <= 0",
        None,  # placeholder; ordering by a partition key tested below
    ):
        if bad is None:
            continue
        with pytest.raises(Exception):
            env.execute_sql(f"""
                SELECT k FROM (
                    SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY v) AS r
                    FROM rr_src
                ) {bad}
            """).collect()
    with pytest.raises(Exception):  # ordering by a partition key
        env.execute_sql("""
            SELECT k FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY k, v ORDER BY v) AS r
                FROM rr_src
            ) WHERE r <= 2
        """).collect()


def test_streaming_topn_rejects_unjsonable_payload(spark, tmp_path):
    """A payload column that cannot round-trip the JSON state encoding
    fails at operator construction with a clear message, not inside
    json.dumps mid-stream (review fix)."""
    from flink_1_20_spark.streaming import file_source, streaming_topn

    src = tmp_path / "uj_src"
    src.mkdir()
    stream = file_source(
        spark, str(src), "k bigint, v double, blob binary", fmt="json"
    )
    with pytest.raises(NotImplementedError, match="blob"):
        streaming_topn(stream, ["k"], "v", n=2)


def test_ctas_schema_inference_roundtrip(spark, tmp_path):
    """CTAS (SqlCreateTableAs.java:69): schema derived from the query,
    table created + filled in one statement, readable back."""
    from flink_1_20_spark.sql_ddl import TableEnvironment

    src = tmp_path / "ctas_src.csv"
    src.write_text("k,v\n1,10\n2,20\n3,30\n")
    env = TableEnvironment(spark)
    env.execute_sql(
        f"CREATE TABLE base (k BIGINT, v BIGINT) WITH ("
        f"'connector'='filesystem','path'='{src}','format'='csv')"
    )
    env.execute_sql(f"""
        CREATE TABLE derived WITH (
            'connector' = 'filesystem',
            'path' = '{tmp_path}/derived',
            'format' = 'parquet'
        ) AS SELECT k, v * 2 AS dbl FROM base WHERE k >= 2
    """)
    assert env.tables["derived"].columns == [("k", "bigint"), ("dbl", "bigint")]
    got = sorted(
        tuple(r) for r in env.execute_sql("SELECT k, dbl FROM derived").collect()
    )
    assert got == [(2, 40), (3, 60)]
    # duplicate is rejected; IF NOT EXISTS tolerated
    with pytest.raises(ValueError, match="already exists"):
        env.execute_sql("CREATE TABLE derived AS SELECT k FROM base")
    env.execute_sql("CREATE TABLE IF NOT EXISTS derived AS SELECT k FROM base")
    assert env.tables["derived"].columns == [("k", "bigint"), ("dbl", "bigint")]


def test_ctas_managed_path_and_rtas(spark, tmp_path):
    """CTAS without WITH lands in a managed warehouse path;
    CREATE OR REPLACE TABLE ... AS (SqlReplaceTableAs.java) swaps
    definition AND data."""
    from flink_1_20_spark.sql_ddl import TableEnvironment

    src = tmp_path / "rtas_src.csv"
    src.write_text("k,v\n1,10\n2,20\n")
    env = TableEnvironment(spark)
    env.execute_sql(
        f"CREATE TABLE base2 (k BIGINT, v BIGINT) WITH ("
        f"'connector'='filesystem','path'='{src}','format'='csv')"
    )
    env.execute_sql("CREATE TABLE snap AS SELECT k, v FROM base2")
    assert {tuple(r) for r in env.execute_sql("SELECT * FROM snap").collect()} == {
        (1, 10),
        (2, 20),
    }
    managed = env.tables["snap"].options["path"]
    assert "_tables" in managed and os.path.isdir(managed)
    env.execute_sql(
        "CREATE OR REPLACE TABLE snap AS SELECT k, v + 100 AS v2 FROM base2"
    )
    assert env.tables["snap"].columns == [("k", "bigint"), ("v2", "bigint")]
    assert {tuple(r) for r in env.execute_sql("SELECT * FROM snap").collect()} == {
        (1, 110),
        (2, 120),
    }
    env.execute_sql("DROP TABLE snap")


def test_alter_table_rename_modify_constraint_watermark(spark, tmp_path):
    """The residual ALTER TABLE schema family
    (SqlAlterTableRenameColumn.java, SqlAlterTableModify.java,
    SqlAlterTableAddConstraint.java, SqlAlterTableDropWatermark.java):
    renamed columns keep reading the physical file column; MODIFY
    retypes; constraints and watermarks add/drop on the catalog meta."""
    from flink_1_20_spark.sql_ddl import TableEnvironment

    src = tmp_path / "alt.csv"
    src.write_text("uid,score,ts\n1,9.5,2024-01-01 00:00:00\n2,7.25,2024-01-01 00:00:05\n")
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE t_alt (
            uid BIGINT, score DOUBLE, ts TIMESTAMP(3),
            WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
        ) WITH ('connector'='filesystem','path'='{src}','format'='csv')
    """)
    # RENAME COLUMN: data written under 'score' stays readable as 'pts'
    env.execute_sql("ALTER TABLE t_alt RENAME score TO pts")
    got = {tuple(r) for r in env.execute_sql("SELECT uid, pts FROM t_alt").collect()}
    assert got == {(1, 9.5), (2, 7.25)}
    assert [c for c, _ in env.tables["t_alt"].columns] == ["uid", "pts", "ts"]
    with pytest.raises(ValueError, match="column not found"):
        env.execute_sql("ALTER TABLE t_alt RENAME nope TO other")
    with pytest.raises(ValueError, match="already exists"):
        env.execute_sql("ALTER TABLE t_alt RENAME uid TO pts")
    # second rename keeps resolving the ORIGINAL physical column
    env.execute_sql("ALTER TABLE t_alt RENAME pts TO points")
    got = {r["points"] for r in env.execute_sql("SELECT points FROM t_alt").collect()}
    assert got == {9.5, 7.25}
    # MODIFY retypes a column (read applies the new type)
    env.execute_sql("ALTER TABLE t_alt MODIFY (uid INT)")
    assert ("uid", "int") in env.tables["t_alt"].columns
    assert env.execute_sql("SELECT uid FROM t_alt").schema["uid"].dataType.simpleString() == "int"
    with pytest.raises(ValueError, match="unknown column"):
        env.execute_sql("ALTER TABLE t_alt MODIFY (ghost INT)")
    # constraints: recorded, never enforced
    env.execute_sql("ALTER TABLE t_alt ADD CONSTRAINT pk_u PRIMARY KEY (uid) NOT ENFORCED")
    assert env.tables["t_alt"].primary_key == ["uid"]
    env.execute_sql("ALTER TABLE t_alt DROP PRIMARY KEY")
    assert env.tables["t_alt"].primary_key == []
    # watermark drop + modify
    assert env.tables["t_alt"].watermark is not None
    env.execute_sql("ALTER TABLE t_alt DROP WATERMARK")
    assert env.tables["t_alt"].watermark is None
    with pytest.raises(ValueError, match="no watermark"):
        env.execute_sql("ALTER TABLE t_alt DROP WATERMARK")
    env.execute_sql(
        "ALTER TABLE t_alt MODIFY WATERMARK FOR ts AS ts - INTERVAL '1' MINUTE"
    )
    assert env.tables["t_alt"].watermark == ("ts", "ts - INTERVAL '1' MINUTE")
    env.execute_sql("DROP TABLE t_alt")


def test_streaming_cumulate_tvf_insert_end_to_end(spark, tmp_path):
    """Streaming CUMULATE window TVF through executeSql
    (SliceAssigners.java:46 semantics): the expanding-tumbles lowering
    keeps the hidden max-window struct and the re-group puts it in the
    GROUP BY, so the append-mode watermark check passes. A row at
    10:00:30 under step=1m/max=3m belongs to the 10:01, 10:02 and 10:03
    slice-ends of the 10:00 bucket."""
    import json as _json

    src = tmp_path / "cum_src"
    src.mkdir()
    (src / "b0.jsonl").write_text(
        _json.dumps({"ts": "2024-01-01T10:00:30", "v": 1.0}) + "\n"
    )
    out = tmp_path / "cum_out"
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE cum_src (
            ts TIMESTAMP(3), v DOUBLE,
            WATERMARK FOR ts AS ts - INTERVAL '1' SECOND
        ) WITH ('connector'='filesystem','path'='{src}',
                'format'='json','scan.streaming'='true')
    """)
    env.execute_sql(f"""
        CREATE TABLE cum_sink (
            window_start TIMESTAMP(3), window_end TIMESTAMP(3), n BIGINT
        ) WITH ('connector'='filesystem','path'='{out}','format'='parquet',
                'checkpoint'='{tmp_path / "cum_ckpt"}')
    """)
    q = env.execute_sql("""
        INSERT INTO cum_sink
        SELECT window_start, window_end, count(*) AS n
        FROM TABLE(CUMULATE(TABLE cum_src, DESCRIPTOR(ts),
                            INTERVAL '1' MINUTE, INTERVAL '3' MINUTE))
        GROUP BY window_start, window_end
    """)
    try:
        q.processAllAvailable()
        # advance the watermark far past the bucket so the slices emit
        (src / "b1.jsonl").write_text(
            _json.dumps({"ts": "2024-01-01T11:00:00", "v": 0.0}) + "\n"
        )
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (str(r["window_start"]), str(r["window_end"]), r["n"])
        for r in spark.read.parquet(str(out)).collect()
    }
    assert ("2024-01-01 10:00:00", "2024-01-01 10:01:00", 1) in got
    assert ("2024-01-01 10:00:00", "2024-01-01 10:02:00", 1) in got
    assert ("2024-01-01 10:00:00", "2024-01-01 10:03:00", 1) in got
    # the row never leaks into a later bucket's slices
    assert not any(s.startswith("2024-01-01 10:0") and s > "2024-01-01 10:00:00"
                   for s, _, _ in got)


def test_parser_tail_surfaces(spark):
    """The small parser-surface tail: SHOW PROCEDURES lists nothing
    (truthful — the generic in-memory catalog has no procedures), CALL
    fails to resolve, and COMPILE PLAN / CREATE MODEL raise the
    documented non-goal messages instead of raw ParseExceptions."""
    from flink_1_20_spark.sql_ddl import TableEnvironment

    env = TableEnvironment(spark)
    assert env.execute_sql("SHOW PROCEDURES").collect() == []
    with pytest.raises(ValueError, match="procedure not found"):
        env.execute_sql("CALL my_proc(1)")
    with pytest.raises(ValueError, match="non-goal"):
        env.execute_sql("COMPILE PLAN '/tmp/p.json' FOR INSERT INTO t SELECT 1")
    with pytest.raises(ValueError, match="non-goal"):
        env.execute_sql("EXECUTE PLAN '/tmp/p.json'")
    with pytest.raises(ValueError, match="non-goal"):
        env.execute_sql("CREATE MODEL m INPUT (x DOUBLE) OUTPUT (y DOUBLE) WITH ('provider'='x')")
    # r8: the REST of the model family fails with the same documented
    # message, not a raw ParseException
    for stmt in (
        "DROP MODEL m",
        "ALTER MODEL m SET ('k'='v')",
        "DESCRIBE MODEL m",
        "SHOW CREATE MODEL m",
        "SHOW MODELS",
    ):
        with pytest.raises(ValueError, match="non-goal"):
            env.execute_sql(stmt)


def test_ctas_regex_never_eats_table_names_ending_in_as(spark, tmp_path):
    """Review fix: a plain CREATE TABLE whose name ends in 'as' (atlas)
    must not backtrack its tail into the AS keyword and route to CTAS."""
    from flink_1_20_spark.sql_ddl import TableEnvironment

    src = tmp_path / "atlas.csv"
    src.write_text("a,b\n1,2\n")
    env = TableEnvironment(spark)
    env.execute_sql(
        f"CREATE TABLE atlas (a BIGINT, b BIGINT) WITH ("
        f"'connector'='filesystem','path'='{src}','format'='csv')"
    )
    assert env.tables["atlas"].columns == [("a", "bigint"), ("b", "bigint")]
    assert env.execute_sql("SELECT a + b AS s FROM atlas").collect()[0]["s"] == 3


def test_rename_column_swap_and_computed_guard(spark, tmp_path):
    """Review fixes: (a) renaming a column referenced by a computed
    column is rejected BEFORE any meta mutation; (b) a cyclic rename
    (column swap) resolves as one simultaneous projection."""
    from flink_1_20_spark.sql_ddl import TableEnvironment

    src = tmp_path / "swap.csv"
    src.write_text("a,b\n1,10\n2,20\n")
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE t_swap (
            a BIGINT, b BIGINT, c AS a + 1
        ) WITH ('connector'='filesystem','path'='{src}','format'='csv')
    """)
    with pytest.raises(ValueError, match="computed"):
        env.execute_sql("ALTER TABLE t_swap RENAME a TO x")
    # meta untouched by the rejected rename — the table still reads
    assert [c for c, _ in env.tables["t_swap"].columns] == ["a", "b"]
    assert env.execute_sql("SELECT c FROM t_swap WHERE a = 1").collect()[0]["c"] == 2
    env.execute_sql("ALTER TABLE t_swap DROP c")
    # full swap: a->tmp, b->a, tmp->b
    env.execute_sql("ALTER TABLE t_swap RENAME a TO tmp")
    env.execute_sql("ALTER TABLE t_swap RENAME b TO a")
    env.execute_sql("ALTER TABLE t_swap RENAME tmp TO b")
    got = {tuple(r) for r in env.execute_sql("SELECT a, b FROM t_swap").collect()}
    # a now carries the old b values and vice versa
    assert got == {(10, 1), (20, 2)}


def test_show_listings_scoped_and_filtered(spark, tmp_path):
    """SHOW TABLES (FROM|IN) db [[NOT] LIKE], SHOW VIEWS/FUNCTIONS LIKE
    (SqlShowTables.java:52 family), ALTER VIEW RENAME TO / AS, and
    ALTER FUNCTION re-resolution."""
    from flink_1_20_spark.sql_ddl import TableEnvironment

    src = tmp_path / "sl.csv"
    src.write_text("k\n1\n")
    env = TableEnvironment(spark)
    env.execute_sql("CREATE DATABASE db_sl")
    env.execute_sql(f"""
        CREATE TABLE sl_alpha (k BIGINT) WITH (
            'connector'='filesystem','path'='{src}','format'='csv')
    """)
    env.execute_sql("USE db_sl")
    env.execute_sql(f"""
        CREATE TABLE sl_beta (k BIGINT) WITH (
            'connector'='filesystem','path'='{src}','format'='csv')
    """)
    env.execute_sql("USE default_database")
    got = [r["table_name"] for r in env.execute_sql("SHOW TABLES FROM db_sl").collect()]
    assert got == ["sl_beta"]
    got = [r["table_name"] for r in
           env.execute_sql("SHOW TABLES LIKE 'sl%'").collect()]
    assert "sl_alpha" in got and "sl_beta" not in got
    got = [r["table_name"] for r in
           env.execute_sql("SHOW TABLES NOT LIKE 'sl%'").collect()]
    assert "sl_alpha" not in got
    # views
    env.execute_sql("CREATE VIEW sl_view AS SELECT k FROM sl_alpha")
    got = [r["view_name"] for r in
           env.execute_sql("SHOW VIEWS LIKE 'sl_vie_'").collect()]
    assert got == ["sl_view"]
    # ALTER VIEW RENAME TO keeps the definition; AS swaps it
    env.execute_sql("ALTER VIEW sl_view RENAME TO sl_view2")
    assert env.execute_sql("SELECT * FROM sl_view2").collect()[0]["k"] == 1
    env.execute_sql("ALTER VIEW sl_view2 AS SELECT k + 10 AS k FROM sl_alpha")
    assert env.execute_sql("SELECT * FROM sl_view2").collect()[0]["k"] == 11
    with pytest.raises(ValueError, match="view not found"):
        env.execute_sql("ALTER VIEW nope RENAME TO other")
    # functions: LIKE filter + ALTER re-resolution to a new target
    env.execute_sql(
        "CREATE FUNCTION sl_fn AS 'flink_1_20_spark.functions.udfs.clip_value'"
    )
    got = [r["function_name"] for r in
           env.execute_sql("SHOW FUNCTIONS LIKE 'sl_f%'").collect()]
    assert got == ["sl_fn"]
    env.execute_sql(
        "ALTER FUNCTION sl_fn AS 'flink_1_20_spark.functions.udfs.TaggedLength'"
    )
    assert env.functions["sl_fn"] == "flink_1_20_spark.functions.udfs.TaggedLength"
    with pytest.raises(ValueError, match="function not found"):
        env.execute_sql("ALTER FUNCTION sl_missing AS 'os.path.join'")
    env.execute_sql("DROP TABLE sl_alpha")


def test_streaming_over_aggregate_through_executesql(spark, tmp_path):
    """Streaming OVER aggregation (StreamExecOverAggregate.java:74)
    through executeSql: ROWS n PRECEDING and event-time RANGE INTERVAL
    PRECEDING lower onto the keyed-state facades — one emission per
    input row, windows spanning micro-batches."""
    import json as _json

    src = tmp_path / "ovr_src"
    src.mkdir()
    rows0 = [
        {"uid": 1, "ts": "2024-01-01T10:00:00", "v": 1.0},
        {"uid": 1, "ts": "2024-01-01T10:00:10", "v": 2.0},
        {"uid": 1, "ts": "2024-01-01T10:00:20", "v": 4.0},
    ]
    (src / "b0.jsonl").write_text("\n".join(_json.dumps(r) for r in rows0) + "\n")
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE ovr_src (
            uid BIGINT, ts TIMESTAMP(3), v DOUBLE,
            WATERMARK FOR ts AS ts - INTERVAL '1' SECOND
        ) WITH ('connector'='filesystem','path'='{src}',
                'format'='json','scan.streaming'='true')
    """)
    from flink_1_20_spark.streaming import run_to_memory

    out = env.execute_sql("""
        SELECT uid, ts, v,
               SUM(v) OVER w AS s2,
               COUNT(*) OVER w AS c2,
               AVG(v) OVER w AS a2
        FROM ovr_src
        WINDOW w AS (PARTITION BY uid ORDER BY ts
                     ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)
    """)
    assert out.isStreaming
    q = run_to_memory(out, "ovr_out", output_mode="update")
    try:
        q.processAllAvailable()
        got = {
            str(r["ts"]): (r["s2"], r["c2"], r["a2"])
            for r in spark.table("ovr_out").collect()
        }
        assert got["2024-01-01 10:00:00"] == (1.0, 1, 1.0)
        assert got["2024-01-01 10:00:10"] == (3.0, 2, 1.5)
        assert got["2024-01-01 10:00:20"] == (6.0, 2, 3.0)
        # a later-batch row continues the SAME rolling window (state)
        (src / "b1.jsonl").write_text(
            _json.dumps({"uid": 1, "ts": "2024-01-01T10:00:30", "v": 10.0}) + "\n"
        )
        q.processAllAvailable()
        got = {
            str(r["ts"]): (r["s2"], r["c2"])
            for r in spark.table("ovr_out").collect()
        }
        assert got["2024-01-01 10:00:30"] == (14.0, 2)
    finally:
        q.stop()
    # RANGE interval variant with an inline spec
    out = env.execute_sql("""
        SELECT uid, ts, SUM(v) OVER (PARTITION BY uid ORDER BY ts
              RANGE BETWEEN INTERVAL '15' SECOND PRECEDING AND CURRENT ROW)
              AS s15
        FROM ovr_src
    """)
    assert out.isStreaming
    q = run_to_memory(out, "ovr_rng_out", output_mode="update")
    try:
        q.processAllAvailable()
        got = {str(r["ts"]): r["s15"] for r in spark.table("ovr_rng_out").collect()}
        assert got["2024-01-01 10:00:10"] == 3.0   # 10:00:00 inside 15s
        assert got["2024-01-01 10:00:20"] == 6.0   # 00 and 10 inside
        assert got["2024-01-01 10:00:30"] == 14.0  # only 20 inside
    finally:
        q.stop()


def test_streaming_temporal_join_through_executesql(spark, tmp_path):
    """FOR SYSTEM_TIME AS OF over STREAMING tables through executeSql
    (StreamExecTemporalJoin.java:70): events match the latest dim
    version at-or-before their rowtime, versions arriving in later
    micro-batches apply to later events only."""
    import json as _json

    ev = tmp_path / "tj_ev"
    dm = tmp_path / "tj_dim"
    ev.mkdir()
    dm.mkdir()
    (dm / "d0.jsonl").write_text(
        _json.dumps({"cur": "EUR", "rate": 1.0, "upd": "2024-01-01T00:00:00"}) + "\n"
    )
    (ev / "e0.jsonl").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"oid": 1, "cur": "EUR", "amt": 10.0, "ts": "2024-01-01T10:00:00"},
                {"oid": 2, "cur": "EUR", "amt": 20.0, "ts": "2024-01-01T12:00:00"},
            ]
        )
        + "\n"
    )
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE tj_ev (
            oid BIGINT, cur STRING, amt DOUBLE, ts TIMESTAMP(3),
            WATERMARK FOR ts AS ts - INTERVAL '1' SECOND
        ) WITH ('connector'='filesystem','path'='{ev}',
                'format'='json','scan.streaming'='true')
    """)
    env.execute_sql(f"""
        CREATE TABLE tj_dim (
            cur STRING, rate DOUBLE, upd TIMESTAMP(3),
            WATERMARK FOR upd AS upd - INTERVAL '1' SECOND
        ) WITH ('connector'='filesystem','path'='{dm}',
                'format'='json','scan.streaming'='true')
    """)
    from flink_1_20_spark.streaming import run_to_memory

    out = env.execute_sql("""
        SELECT e.oid, e.amt, d.rate
        FROM tj_ev AS e
        LEFT JOIN tj_dim FOR SYSTEM_TIME AS OF e.ts AS d
        ON e.cur = d.cur
    """)
    assert out.isStreaming
    q = run_to_memory(out, "tj_out", output_mode="update")
    try:
        q.processAllAvailable()
        # a NEW version lands in a later batch, valid from 11:00 — the
        # 12:00 event (already seen, still watermark-held) must pick it
        # up when it eventually drains
        (dm / "d1.jsonl").write_text(
            _json.dumps(
                {"cur": "EUR", "rate": 2.0, "upd": "2024-01-01T11:00:00"}
            )
            + "\n"
        )
        q.processAllAvailable()
        (ev / "e1.jsonl").write_text(
            _json.dumps(
                {"oid": 3, "cur": "EUR", "amt": 5.0, "ts": "2024-01-01T13:00:00"}
            )
            + "\n"
        )
        q.processAllAvailable()
        # the 13:00 event is watermark-held (delay = 1s) until a newer
        # row advances the watermark past it — Flink's rowtime join
        # holds events exactly the same way
        (ev / "e2.jsonl").write_text(
            _json.dumps(
                {"oid": 4, "cur": "EUR", "amt": 1.0, "ts": "2024-01-01T14:00:00"}
            )
            + "\n"
        )
        q.processAllAvailable()
        (ev / "e3.jsonl").write_text(
            _json.dumps(
                {"oid": 5, "cur": "EUR", "amt": 1.0, "ts": "2024-01-01T15:00:00"}
            )
            + "\n"
        )
        q.processAllAvailable()
        # the drain bound is the COMBINED min watermark of both inputs
        # (Flink's two-input operator watermark): the dim side is still
        # at 11:00 - 1s, so only the 10:00 event has drained — events
        # 12:00+ wait for the DIM watermark, exactly the reference's
        # TemporalRowTimeJoinOperator discipline
        held = {r["oid"] for r in spark.table("tj_out").collect()}
        assert held == {1}
        # a final dim version advances the dim watermark to 16:59:59 →
        # combined min = event side 14:59:59 → 12/13/14:00 drain
        (dm / "d2.jsonl").write_text(
            _json.dumps(
                {"cur": "EUR", "rate": 3.0, "upd": "2024-01-01T17:00:00"}
            )
            + "\n"
        )
        q.processAllAvailable()
        got = {r["oid"]: r["rate"] for r in spark.table("tj_out").collect()}
        assert got[1] == 1.0          # 10:00 event → version at 00:00
        assert got[2] == 2.0          # 12:00 event → 11:00 version (the
        #                               version arrived AFTER the event
        #                               was seen — held, then enriched)
        assert got[3] == 2.0          # 13:00 event → 11:00 version
        assert got[4] == 2.0          # 14:00 event → 11:00 version
        assert 5 not in got           # 15:00 > combined watermark: held
    finally:
        q.stop()
    # INNER temporal join on streams rejects with guidance
    with pytest.raises(ValueError, match="LEFT"):
        env.execute_sql("""
            SELECT e.oid FROM tj_ev AS e
            JOIN tj_dim FOR SYSTEM_TIME AS OF e.ts AS d ON e.cur = d.cur
        """)


def test_insert_partition_and_column_list(spark, tmp_path):
    """INSERT INTO t PARTITION (k=v) and INSERT INTO t (cols) — static
    partition literals and positional partial-column binding with NULL
    fill (convertSqlInsert staticPartitions / Flink partial inserts)."""
    from flink_1_20_spark.sql_ddl import TableEnvironment

    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE ipc (dt STRING, k BIGINT, v BIGINT, note STRING)
        PARTITIONED BY (dt)
        WITH ('connector'='filesystem','path'='{tmp_path}/ipc','format'='parquet')
    """)
    env.execute_sql(
        "INSERT INTO ipc PARTITION (dt = '2024-01-01') "
        "SELECT 1 AS k, 10 AS v, 'a' AS note"
    )
    env.execute_sql(
        "INSERT INTO ipc PARTITION (dt = '2024-01-02') (k, v) "
        "SELECT 2 AS k, 20 AS v"
    )
    env.execute_sql("INSERT INTO ipc (dt, k) SELECT '2024-01-03', 3")
    got = sorted(
        (r["dt"], r["k"], r["v"], r["note"])
        for r in env.execute_sql("SELECT * FROM ipc").collect()
    )
    assert got == [
        ("2024-01-01", 1, 10, "a"),
        ("2024-01-02", 2, 20, None),
        ("2024-01-03", 3, None, None),
    ]
    # partition pruning works on the static-partition layout
    assert os.path.isdir(f"{tmp_path}/ipc/dt=2024-01-02")
    with pytest.raises(ValueError, match="unknown"):
        env.execute_sql("INSERT INTO ipc (ghost) SELECT 1")
    with pytest.raises(ValueError, match="not columns"):
        env.execute_sql("INSERT INTO ipc PARTITION (zz = '1') SELECT 1, 2, 'x'")
    # listings LIKE filters (1.20 SqlShowCatalogs/SqlShowDatabases)
    env.execute_sql("CREATE DATABASE extra_db1")
    got = [r["database_name"] for r in
           env.execute_sql("SHOW DATABASES LIKE 'extra%'").collect()]
    assert got == ["extra_db1"]
    got = [r["catalog_name"] for r in
           env.execute_sql("SHOW CATALOGS NOT LIKE 'zzz%'").collect()]
    assert "default_catalog" in got


def test_explain_details_and_insert(spark, tmp_path):
    """EXPLAIN ESTIMATED_COST / JSON_EXECUTION_PLAN map onto Spark's
    cost/formatted modes; EXPLAIN over an INSERT explains the source
    pipeline; CHANGELOG_MODE raises the documented message."""
    from flink_1_20_spark.sql_ddl import TableEnvironment

    src = tmp_path / "ex.csv"
    src.write_text("k,v\n1,2\n")
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE ex_t (k BIGINT, v BIGINT) WITH (
            'connector'='filesystem','path'='{src}','format'='csv')
    """)
    plain = env.execute_sql("EXPLAIN SELECT k FROM ex_t").collect()[0][0]
    assert "Physical Plan" in plain
    cost = env.execute_sql("EXPLAIN ESTIMATED_COST SELECT k FROM ex_t").collect()[0][0]
    assert "Statistics" in cost or "sizeInBytes" in cost
    fmt = env.execute_sql(
        "EXPLAIN JSON_EXECUTION_PLAN SELECT k FROM ex_t"
    ).collect()[0][0]
    assert "(1)" in fmt  # formatted plan numbers its nodes
    ins = env.execute_sql(
        "EXPLAIN INSERT INTO ex_t SELECT k, v FROM ex_t"
    ).collect()[0][0]
    assert "Physical Plan" in ins
    with pytest.raises(ValueError, match="CHANGELOG_MODE"):
        env.execute_sql("EXPLAIN CHANGELOG_MODE SELECT k FROM ex_t")


def test_explain_plan_advice(spark, tmp_path):
    """EXPLAIN PLAN_ADVICE (SqlRichExplain + PlanAdvice.java): renders
    the plan with numbered advice lines; a clean scan gets 'No
    available advice...', a keyless join gets the quadratic-join
    WARNING, an unpushable filter gets the pushdown ADVICE, and a
    nondeterministic streaming query gets the NDU WARNING (the
    NonDeterministicUpdateAnalyzer analog)."""
    import json as _json

    from flink_1_20_spark.sql_ddl import TableEnvironment

    env = TableEnvironment(spark)
    src = tmp_path / "pa"
    src.mkdir()
    spark.createDataFrame([(1, 2.0), (2, 3.0)], "k bigint, v double").write.mode(
        "overwrite"
    ).parquet(str(src / "t"))
    env.execute_sql(f"""
        CREATE TABLE pa_t (k BIGINT, v DOUBLE) WITH (
            'connector'='filesystem','path'='{src / "t"}','format'='parquet')
    """)
    clean = env.execute_sql(
        "EXPLAIN PLAN_ADVICE SELECT k FROM pa_t WHERE k > 0"
    ).collect()[0][0]
    assert "Physical Plan With Advice" in clean
    assert "No available advice..." in clean
    keyless = env.execute_sql(
        "EXPLAIN PLAN_ADVICE SELECT * FROM pa_t a JOIN pa_t b ON a.v < b.v"
    ).collect()[0][0]
    assert "[WARNING]" in keyless and "equi" in keyless
    unpushed = env.execute_sql(
        "EXPLAIN PLAN_ADVICE SELECT k FROM pa_t WHERE k + v > 3"
    ).collect()[0][0]
    assert "PushedFilters" in unpushed and "[ADVICE]" in unpushed
    # streaming + rand(): the NDU warning
    mon = tmp_path / "pa_mon"
    mon.mkdir()
    (mon / "b0.jsonl").write_text(_json.dumps({"v": 1}) + "\n")
    env.execute_sql(f"""
        CREATE TABLE pa_s (v INT) WITH (
          'connector'='filesystem','path'='{mon}',
          'format'='json','scan.streaming'='true')
    """)
    ndu = env.execute_sql(
        "EXPLAIN PLAN_ADVICE SELECT v, rand() AS r FROM pa_s"
    ).collect()[0][0]
    assert "non-deterministic" in ndu and "[WARNING]" in ndu
    # review fixes: (a) a nondeterministic NAME inside a string literal
    # is not a call; (b) the paren-less ANSI niladic current_timestamp
    # IS nondeterministic in a streaming plan
    env.execute_sql("""
        CREATE TABLE pa_s2 (v INT, note STRING) WITH (
          'connector'='filesystem','path'='{0}',
          'format'='json','scan.streaming'='true')
    """.format(mon))
    lit = env.execute_sql(
        "EXPLAIN PLAN_ADVICE SELECT v FROM pa_s2 WHERE note LIKE '%now(%'"
    ).collect()[0][0]
    assert "non-deterministic" not in lit
    bare = env.execute_sql(
        "EXPLAIN PLAN_ADVICE SELECT v, current_timestamp AS c FROM pa_s"
    ).collect()[0][0]
    assert "non-deterministic" in bare
    # review fix: multi-scan plans never pair one scan's empty
    # PushedFilters with ANOTHER scan's Filter node — a join where one
    # side pushed its predicate and the other side is scanned bare must
    # not claim a pushdown miss
    multi = env.execute_sql(
        "EXPLAIN PLAN_ADVICE SELECT a.k FROM pa_t a "
        "JOIN pa_t b ON a.k = b.k WHERE a.k > 1"
    ).collect()[0][0]
    assert "whose PushedFilters is empty" not in multi


def test_insert_overwrite_partition_replaces_only_named_partition(spark, tmp_path):
    """Review fix: INSERT OVERWRITE t PARTITION (k=v) replaces ONLY the
    named partition (dynamic overwrite) — Spark's static mode would
    truncate the whole table. Also: the same PARTITION syntax works in
    a STATEMENT SET, and ALTER VIEW RENAME survives a broken body."""
    from flink_1_20_spark.sql_ddl import TableEnvironment

    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE iop (dt STRING, k BIGINT)
        PARTITIONED BY (dt)
        WITH ('connector'='filesystem','path'='{tmp_path}/iop','format'='parquet')
    """)
    env.execute_sql("INSERT INTO iop PARTITION (dt = 'a') SELECT 1")
    env.execute_sql("INSERT INTO iop PARTITION (dt = 'b') SELECT 2")
    env.execute_sql("INSERT OVERWRITE iop PARTITION (dt = 'b') SELECT 20")
    got = sorted(tuple(r) for r in env.execute_sql("SELECT dt, k FROM iop").collect())
    assert got == [("a", 1), ("b", 20)]  # dt='a' untouched
    # statement set accepts the partition syntax too
    ss = env.create_statement_set()
    ss.add_insert_sql("INSERT INTO iop PARTITION (dt = 'c') SELECT 3")
    ss.execute()
    got = sorted(tuple(r) for r in env.execute_sql("SELECT dt, k FROM iop").collect())
    assert ("c", 3) in got and ("a", 1) in got
    # ALTER VIEW RENAME over a broken body leaves the old view intact
    env.execute_sql("CREATE VIEW iov AS SELECT k FROM iop")
    env.execute_sql("DROP TABLE iop")
    with pytest.raises(Exception):
        env.execute_sql("ALTER VIEW iov RENAME TO iov2")
    assert "iov" in env._view_sql and "iov2" not in env._view_sql


def test_alter_column_positions_and_multi_drop(spark, tmp_path):
    """SqlColumnPosSpec: ADD/MODIFY ... FIRST / AFTER <col> reorder the
    catalog schema (by-name parquet reads are order-safe; csv rejects —
    its files bind positionally), and DESCRIBE + positional INSERT
    follow the new order. SqlAlterTableDropColumn takes a column LIST."""
    env = TableEnvironment(spark)
    spark.createDataFrame([(1, 2.0)], "a int, b double").write.parquet(
        str(tmp_path / "t")
    )
    env.execute_sql(f"""
        CREATE TABLE pt (a INT, b DOUBLE) WITH (
          'connector'='filesystem','path'='{tmp_path}/t',
          'format'='parquet')
    """)
    env.execute_sql("ALTER TABLE pt ADD (c STRING FIRST, d INT AFTER a)")
    cols = [r["name"] for r in env.execute_sql("DESCRIBE pt").collect()]
    assert cols == ["c", "a", "d", "b"]
    # positional INSERT follows the NEW order
    env.execute_sql("INSERT INTO pt VALUES ('x', 7, 9, 3.5)")
    got = {
        (r["c"], r["a"], r["d"], r["b"])
        for r in env.execute_sql("SELECT * FROM pt").collect()
    }
    assert ("x", 7, 9, 3.5) in got and (None, 1, None, 2.0) in got
    env.execute_sql("ALTER TABLE pt MODIFY (b DOUBLE FIRST)")
    cols = [r["name"] for r in env.execute_sql("DESCRIBE pt").collect()]
    assert cols == ["b", "c", "a", "d"]
    with pytest.raises(ValueError, match="AFTER column not found"):
        env.execute_sql("ALTER TABLE pt MODIFY (b DOUBLE AFTER nope)")
    # multi-column DROP
    env.execute_sql("ALTER TABLE pt DROP (c, d)")
    cols = [r["name"] for r in env.execute_sql("DESCRIBE pt").collect()]
    assert cols == ["b", "a"]
    # csv tables reject reorders (files bind positionally)
    env.execute_sql(f"""
        CREATE TABLE pcsv (a INT, b DOUBLE) WITH (
          'connector'='filesystem','path'='{tmp_path}/csv',
          'format'='csv')
    """)
    with pytest.raises(ValueError, match="csv"):
        env.execute_sql("ALTER TABLE pcsv ADD (c STRING FIRST)")
    # structural members are protected from DROP
    env.execute_sql(f"""
        CREATE TABLE pdrop (k INT, dt STRING, PRIMARY KEY (k) NOT ENFORCED)
        PARTITIONED BY (dt) WITH (
          'connector'='filesystem','path'='{tmp_path}/pd',
          'format'='parquet')
    """)
    with pytest.raises(ValueError, match="partition key"):
        env.execute_sql("ALTER TABLE pdrop DROP dt")
    with pytest.raises(ValueError, match="primary key"):
        env.execute_sql("ALTER TABLE pdrop DROP k")
    # review fixes: a failing position spec must not half-apply — the
    # csv-rejected ADD leaves NO phantom column, the csv-rejected
    # MODIFY keeps the original type
    cols = [r["name"] for r in env.execute_sql("DESCRIBE pcsv").collect()]
    assert cols == ["a", "b"]  # the rejected ADD above left nothing
    with pytest.raises(ValueError, match="csv"):
        env.execute_sql("ALTER TABLE pcsv MODIFY (b STRING FIRST)")
    types = {
        r["name"]: r["type"]
        for r in env.execute_sql("DESCRIBE pcsv").collect()
    }
    assert types["b"].lower() == "double"  # type change not half-applied
    # DROP validation: garbage tokens and unknown names raise, not no-op
    with pytest.raises(ValueError, match="cannot parse"):
        env.execute_sql("ALTER TABLE pt DROP COLUMN b")
    with pytest.raises(ValueError, match="unknown column"):
        env.execute_sql("ALTER TABLE pt DROP nope")
    # computed / watermark / distribution dependencies are protected
    env.execute_sql(f"""
        CREATE TABLE pdep (
            a INT, c AS a + 1,
            ts TIMESTAMP(3), WATERMARK FOR ts AS ts - INTERVAL '1' SECOND
        ) WITH ('connector'='filesystem','path'='{tmp_path}/pdep',
                'format'='parquet')
    """)
    with pytest.raises(ValueError, match="computed column"):
        env.execute_sql("ALTER TABLE pdep DROP a")
    with pytest.raises(ValueError, match="watermark column"):
        env.execute_sql("ALTER TABLE pdep DROP ts")
    # AFTER anchored on a computed column gets the informative error
    with pytest.raises(ValueError, match="computed columns render"):
        env.execute_sql("ALTER TABLE pdep ADD (x INT AFTER c)")
    env.execute_sql(f"""
        CREATE TABLE pdist (k INT, v DOUBLE)
        DISTRIBUTED BY HASH(k) INTO 2 BUCKETS
        WITH ('connector'='filesystem','path'='{tmp_path}/pdist',
              'format'='parquet')
    """)
    with pytest.raises(ValueError, match="bucket column"):
        env.execute_sql("ALTER TABLE pdist DROP k")
    # csv: only TRAILING columns can go (positional file binding)
    with pytest.raises(ValueError, match="TRAILING"):
        env.execute_sql("ALTER TABLE pcsv DROP a")
    env.execute_sql("ALTER TABLE pcsv DROP b")  # suffix: fine
    assert [r["name"] for r in env.execute_sql("DESCRIBE pcsv").collect()] == ["a"]


def test_outer_select_star_classifier_set_quantifiers():
    """r8 advice fix: SELECT DISTINCT * (and SELECT ALL *) carry a
    projection star — classifying them star-free let the streaming
    window-join struct upgrade leak retained __w struct columns into
    the output schema. Multiplication after DISTINCT stays star-free."""
    has_star = TableEnvironment._outer_select_has_star
    assert has_star("SELECT DISTINCT * FROM x")
    assert has_star("SELECT ALL * FROM x")
    assert has_star("SELECT DISTINCT t.* FROM x t")
    assert not has_star("SELECT DISTINCT a * 2 AS b FROM x")
    assert not has_star("SELECT DISTINCT count(*) AS n FROM x")
    assert not has_star("SELECT a, b FROM x")
    assert has_star("SELECT *, a FROM x")


def test_streaming_except_and_intersect_all_materialized(spark, tmp_path):
    """Streaming EXCEPT / INTERSECT ALL through executeSql
    (StreamExecMinus / StreamExecIntersect retraction semantics):
    an updating result cannot come back as a DataFrame, so the bare
    SELECT still rejects with the materialization pointer, while
    INSERT INTO a parquet sink runs the signed-count composition —
    per-row multiset counts folded per epoch, sink rewritten for the
    affected keys. Multiplicity semantics are checked against Spark's
    batch exceptAll/intersectAll on the same data, and a later right
    batch RETRACTS previously-emitted EXCEPT rows from the sink."""
    import json as _json

    env = TableEnvironment(spark)
    a_rows, b_rows = [1, 2, 2, 2, 3], [2, 3, 3, 4]
    for name, ks in (("se_a", a_rows), ("se_b", b_rows)):
        p = tmp_path / name
        p.mkdir()
        (p / "b0.jsonl").write_text(
            "\n".join(_json.dumps({"k": k}) for k in ks) + "\n"
        )
        env.execute_sql(f"""
            CREATE TABLE {name} (k INT) WITH (
              'connector'='filesystem','path'='{p}',
              'format'='json','scan.streaming'='true')
        """)
    # the bare streaming SELECT still rejects, pointing at INSERT INTO
    with pytest.raises(ValueError, match="INSERT INTO"):
        env.execute_sql("SELECT k FROM se_a EXCEPT SELECT k FROM se_b")
    with pytest.raises(ValueError, match="INSERT INTO"):
        env.execute_sql("SELECT k FROM se_a INTERSECT ALL SELECT k FROM se_b")

    a_df = spark.createDataFrame([(k,) for k in a_rows], "k int")
    b_df = spark.createDataFrame([(k,) for k in b_rows], "k int")
    for sink, stmt in (
        ("se_exc", "SELECT k FROM se_a EXCEPT SELECT k FROM se_b"),
        ("se_exca", "SELECT k FROM se_a EXCEPT ALL SELECT k FROM se_b"),
        ("se_inta", "SELECT k FROM se_a INTERSECT ALL SELECT k FROM se_b"),
    ):
        env.execute_sql(f"""
            CREATE TABLE {sink} (k INT) WITH (
              'connector'='filesystem','path'='{tmp_path}/{sink}',
              'format'='parquet')
        """)
        q = env.execute_sql(f"INSERT INTO {sink} {stmt}")
        try:
            q.processAllAvailable()
            got = sorted(
                r[0] for r in env.execute_sql(f"SELECT * FROM {sink}").collect()
            )
            if sink == "se_exc":
                want = sorted(r[0] for r in a_df.dropDuplicates()
                              .join(b_df, "k", "left_anti").collect())
                assert got == [1] == want
            elif sink == "se_exca":
                want = sorted(r[0] for r in a_df.exceptAll(b_df).collect())
                assert got == [1, 2, 2] == want
            else:
                want = sorted(r[0] for r in a_df.intersectAll(b_df).collect())
                assert got == [2, 3] == want
        finally:
            q.stop()
    # retraction across a RESTART: k=1 arriving on the right kills the
    # previously-emitted EXCEPT row; the re-issued INSERT resumes from
    # its checkpoint (exactly-once — earlier batches are not re-folded)
    (tmp_path / "se_b" / "b1.jsonl").write_text(_json.dumps({"k": 1}) + "\n")
    q = env.execute_sql("INSERT INTO se_exc SELECT k FROM se_a EXCEPT SELECT k FROM se_b")
    try:
        q.processAllAvailable()
        got = sorted(
            r[0] for r in env.execute_sql("SELECT * FROM se_exc").collect()
        )
        assert got == []
    finally:
        q.stop()
    # chained / mixed set ops reject with the staging pointer
    with pytest.raises(ValueError, match="chained"):
        env.execute_sql(
            "INSERT INTO se_exc SELECT k FROM se_a EXCEPT "
            "SELECT k FROM se_b EXCEPT SELECT k FROM se_b"
        )


def test_streaming_setop_review_guards(spark, tmp_path):
    """r8 review fixes on the set-op materializer: WITH/CTE scopes
    reject with the staging pointer (the text split would strip the
    CTE from the right side), reserved materializer column names
    reject instead of colliding, and a FRESH checkpoint against a
    surviving state directory resets the state rather than silently
    discarding every replayed batch as a duplicate epoch."""
    import json as _json

    env = TableEnvironment(spark)
    for name, ks in (("sg_a", [1, 2, 2]), ("sg_b", [2])):
        p = tmp_path / name
        p.mkdir()
        (p / "b0.jsonl").write_text(
            "\n".join(_json.dumps({"k": k}) for k in ks) + "\n"
        )
        env.execute_sql(f"""
            CREATE TABLE {name} (k INT) WITH (
              'connector'='filesystem','path'='{p}',
              'format'='json','scan.streaming'='true')
        """)
    env.execute_sql(f"""
        CREATE TABLE sg_sink (k INT) WITH (
          'connector'='filesystem','path'='{tmp_path}/sg_sink',
          'format'='parquet')
    """)
    # CTE guard fires only when the RIGHT side actually references a
    # CTE name (the text split strips the scope from it); a WITH whose
    # CTEs only the left side uses keeps working
    with pytest.raises(ValueError, match="WITH/CTE"):
        env.execute_sql(
            "INSERT INTO sg_sink WITH c AS (SELECT k FROM sg_a) "
            "SELECT k FROM c EXCEPT SELECT k FROM c"
        )
    with pytest.raises(ValueError, match="WITH/CTE"):
        env.execute_sql(
            "WITH c AS (SELECT k FROM sg_b) "
            "SELECT k FROM sg_a INTERSECT SELECT k FROM c"
        )
    df = env.execute_sql(
        "WITH c AS (SELECT k FROM sg_a) "
        "SELECT k FROM c INTERSECT SELECT k FROM sg_b"
    )
    assert df.isStreaming  # left keeps the WITH prefix
    # a REGISTERED table shadowing the CTE name must not silently bind:
    # the guard is textual, so the reject fires even though resolution
    # would "succeed" against the wrong relation
    (tmp_path / "shadow_c").mkdir()
    env.execute_sql(f"""
        CREATE TABLE c (k INT) WITH (
          'connector'='filesystem','path'='{tmp_path}/shadow_c',
          'format'='json','scan.streaming'='true')
    """)
    with pytest.raises(ValueError, match="WITH/CTE"):
        env.execute_sql(
            "WITH c AS (SELECT k FROM sg_a WHERE k > 100) "
            "SELECT k FROM sg_a INTERSECT SELECT k FROM c"
        )
    env.execute_sql("DROP TABLE c")
    # a COLUMN/alias merely named like a CTE must not misfire: the
    # guard only matches table positions (FROM/JOIN)
    df = env.execute_sql(
        "WITH c2 AS (SELECT k FROM sg_a) "
        "SELECT k AS c2 FROM c2 INTERSECT SELECT k AS c2 FROM sg_b"
    )
    assert df.isStreaming
    # an unparseable WITH prologue fails SAFE (unknown CTEs must not
    # silently disarm the guard)
    with pytest.raises(ValueError, match="unparseable"):
        env.execute_sql(
            "WITH /* odd */ c3 AS (SELECT k FROM sg_a) "
            "SELECT k FROM c3 INTERSECT SELECT k FROM sg_b"
        )
    # an unrelated right-side typo keeps its own missing-table error,
    # not a misattributed CTE message
    with pytest.raises(Exception, match="sg_nope|TABLE_OR_VIEW"):
        env.execute_sql(
            "INSERT INTO sg_sink WITH c AS (SELECT k FROM sg_a) "
            "SELECT k FROM c EXCEPT SELECT k FROM sg_nope"
        )
    # a user column named __side would be silently replaced by the tag
    # before the materializer sees it — rejected at the source
    with pytest.raises(ValueError, match="__side"):
        env.execute_sql(
            "INSERT INTO sg_sink SELECT k AS `__side` FROM sg_a "
            "EXCEPT ALL SELECT k FROM sg_b"
        )
    # reserved materializer columns reject up front
    env.execute_sql(f"""
        CREATE TABLE sg_bad (cnt_l INT) WITH (
          'connector'='filesystem','path'='{tmp_path}/sg_bad',
          'format'='parquet')
    """)
    with pytest.raises(ValueError, match="reserved"):
        env.execute_sql(
            "INSERT INTO sg_bad SELECT k FROM sg_a "
            "EXCEPT ALL SELECT k FROM sg_b"
        )
    # fresh checkpoint + surviving state: first run materializes,
    # then the checkpoint is wiped (simulating DROP/re-CREATE with a
    # new checkpoint) — the explicit OVERWRITE rerun must REPROCESS
    # from scratch, not discard every batch against the stale epoch
    # counter (r9: a plain INSERT INTO now refuses here instead of
    # silently wiping the retained sink — see
    # test_streaming_setop_r9_advice_guards)
    q = env.execute_sql(
        "INSERT INTO sg_sink SELECT k FROM sg_a EXCEPT ALL SELECT k FROM sg_b"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r[0] for r in env.execute_sql("SELECT * FROM sg_sink").collect())
    assert got == [1, 2]
    import shutil

    shutil.rmtree(f"{tmp_path}/sg_sink.__ckpt__")
    q = env.execute_sql(
        "INSERT OVERWRITE sg_sink SELECT k FROM sg_a EXCEPT ALL SELECT k FROM sg_b"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r[0] for r in env.execute_sql("SELECT * FROM sg_sink").collect())
    assert got == [1, 2], "fresh checkpoint must rebuild, not double-count or starve"


def test_split_on_where_quoted_paren_not_counted():
    """r8 review fix: an unbalanced '(' inside a double-quoted literal
    or backticked identifier must not wedge the paren depth and
    swallow the real WHERE."""
    from flink_1_20_spark.sql_ddl import _split_on_where

    assert _split_on_where('g = "a(b" WHERE id = 1') == ('g = "a(b"', "id = 1")
    assert _split_on_where("g = `weird(col` WHERE id = 1") == (
        "g = `weird(col`", "id = 1"
    )


def test_execute_textual_forms(spark, tmp_path):
    """SqlExecute.java / SqlStatementSet.java textual forms: EXECUTE
    STATEMENT SET BEGIN ...; ...; END fans one source out to two sinks
    through executeSql (the programmatic path already covered), and a
    bare EXECUTE <statement> unwraps transparently."""
    from flink_1_20_spark.sql_ddl import TableEnvironment

    src = tmp_path / "ex.csv"
    src.write_text("k,v\n1,5\n2,50\n3,500\n")
    env = TableEnvironment(spark)
    env.execute_sql(
        f"CREATE TABLE ex_src (k BIGINT, v BIGINT) WITH ("
        f"'connector'='filesystem','path'='{src}','format'='csv')"
    )
    for t, cols in (("ex_a", "k BIGINT, v BIGINT"), ("ex_b", "k BIGINT, big BIGINT")):
        env.execute_sql(
            f"CREATE TABLE {t} ({cols}) WITH ('connector'='filesystem',"
            f"'path'='{tmp_path}/{t}','format'='parquet')"
        )
    env.execute_sql("""
        EXECUTE STATEMENT SET
        BEGIN
          INSERT INTO ex_a SELECT k, v FROM ex_src WHERE v < 100;
          INSERT INTO ex_b SELECT k, v AS big FROM ex_src WHERE v >= 100;
        END
    """)
    assert env.execute_sql("SELECT count(*) AS n FROM ex_a").collect()[0].n == 2
    assert env.execute_sql("SELECT count(*) AS n FROM ex_b").collect()[0].n == 1
    # bare EXECUTE wrapper around a SELECT and an INSERT
    got = env.execute_sql("EXECUTE SELECT 1 AS one").collect()
    assert [tuple(r) for r in got] == [(1,)]
    env.execute_sql("EXECUTE INSERT INTO ex_a SELECT k, v FROM ex_src WHERE v = 500")
    assert env.execute_sql("SELECT count(*) AS n FROM ex_a").collect()[0].n == 3
    # EXECUTE PLAN still raises the documented non-goal
    with pytest.raises(ValueError, match="non-goal"):
        env.execute_sql("EXECUTE PLAN '/tmp/p.json'")


@pytest.mark.parametrize("op_sql,opname", [
    ("EXCEPT", "exc"),
    ("EXCEPT ALL", "exca"),
    ("INTERSECT ALL", "inta"),
])
def test_streaming_setop_randomized_incremental(spark, tmp_path, op_sql, opname):
    """Randomized incremental-correctness property (seeded): feed
    interleaved random multiset batches to both sides of a streaming
    EXCEPT / EXCEPT ALL / INTERSECT ALL materialization and assert the
    sink equals Spark's batch exceptAll/intersectAll of the cumulative
    data AFTER EVERY BATCH — the multiset count algebra must hold at
    every prefix, not just at the end."""
    import json as _json
    import random

    rng = random.Random(20260815)
    env = TableEnvironment(spark)
    for side in ("a", "b"):
        (tmp_path / f"rs_{opname}_{side}").mkdir()
        env.execute_sql(f"""
            CREATE TABLE rs_{opname}_{side} (k INT) WITH (
              'connector'='filesystem','path'='{tmp_path}/rs_{opname}_{side}',
              'format'='json','scan.streaming'='true')
        """)
    env.execute_sql(f"""
        CREATE TABLE rs_{opname}_sink (k INT) WITH (
          'connector'='filesystem','path'='{tmp_path}/rs_{opname}_sink',
          'format'='parquet')
    """)
    seen = {"a": [], "b": []}

    def write_batch(side, i):
        ks = [rng.randint(0, 6) for _ in range(rng.randint(1, 8))]
        seen[side].extend(ks)
        (tmp_path / f"rs_{opname}_{side}" / f"b{i}.jsonl").write_text(
            "\n".join(_json.dumps({"k": k}) for k in ks) + "\n"
        )

    write_batch("a", 0)
    write_batch("b", 0)
    q = env.execute_sql(
        f"INSERT INTO rs_{opname}_sink "
        f"SELECT k FROM rs_{opname}_a {op_sql} SELECT k FROM rs_{opname}_b"
    )
    try:
        for i in range(1, 5):
            q.processAllAvailable()
            a_df = spark.createDataFrame([(k,) for k in seen["a"]], "k int")
            b_df = spark.createDataFrame([(k,) for k in seen["b"]], "k int")
            if op_sql == "EXCEPT":
                want = a_df.dropDuplicates().join(b_df, "k", "left_anti")
            elif op_sql == "EXCEPT ALL":
                want = a_df.exceptAll(b_df)
            else:
                want = a_df.intersectAll(b_df)
            got = sorted(
                r[0]
                for r in env.execute_sql(
                    f"SELECT * FROM rs_{opname}_sink"
                ).collect()
            )
            assert got == sorted(r[0] for r in want.collect()), (
                f"{op_sql} diverged after batch round {i}: "
                f"a={sorted(seen['a'])} b={sorted(seen['b'])}"
            )
            # interleave: sometimes only one side advances
            if rng.random() < 0.8:
                write_batch("a", i)
            if rng.random() < 0.8:
                write_batch("b", i)
    finally:
        q.stop()


def test_desc_of_table_named_model_not_trapped(spark, tmp_path):
    """A real table named `model` stays describable — the model-DDL
    non-goal trap requires an identifier after MODEL."""
    import json as _json

    env = TableEnvironment(spark)
    p = tmp_path / "model_tbl"
    p.mkdir()
    (p / "b.jsonl").write_text(_json.dumps({"k": 1}) + "\n")
    env.execute_sql(f"""
        CREATE TABLE model (k INT) WITH (
          'connector'='filesystem','path'='{p}','format'='json')
    """)
    rows = env.execute_sql("DESC model").collect()
    assert any(r[0] == "k" for r in rows)
    rows = env.execute_sql("DESCRIBE model").collect()
    assert any(r[0] == "k" for r in rows)
    with pytest.raises(ValueError, match="non-goal"):
        env.execute_sql("DESCRIBE MODEL some_model")


def test_source_watermark_streaming_aggregate(spark, tmp_path):
    """WATERMARK FOR ts AS SOURCE_WATERMARK() (SqlWatermark's
    connector-provided strategy) maps to a zero-delay watermark on the
    rowtime column — previously the clause parsed but applied NO
    watermark, so append-mode windowed aggregates failed at start."""
    import json as _json

    src = tmp_path / "swm_src"
    src.mkdir()
    (src / "b0.jsonl").write_text(
        _json.dumps({"ts": "2024-01-01T10:00:01", "v": 1.0}) + "\n"
        + _json.dumps({"ts": "2024-01-01T10:00:02", "v": 2.0}) + "\n"
        + _json.dumps({"ts": "2024-01-01T11:00:00", "v": 9.0}) + "\n"
    )
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE swm_src (
            ts TIMESTAMP(3), v DOUBLE,
            WATERMARK FOR ts AS SOURCE_WATERMARK()
        ) WITH ('connector'='filesystem','path'='{src}',
                'format'='json','scan.streaming'='true')
    """)
    df = env.execute_sql("""
        SELECT window_start, SUM(v) AS total
        FROM TABLE(TUMBLE(TABLE swm_src, DESCRIPTOR(ts), INTERVAL '1' MINUTE))
        GROUP BY window_start, window_end
    """)
    q = (
        df.writeStream.format("memory").queryName("swm_out")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        # close the first window: an event past it advances the watermark
        (src / "b1.jsonl").write_text(
            _json.dumps({"ts": "2024-01-01T12:00:00", "v": 0.5}) + "\n"
        )
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {(str(r[0]), r[1]) for r in spark.sql("SELECT * FROM swm_out").collect()}
    assert ("2024-01-01 10:00:00", 3.0) in rows
    # the strictly-ascending form `WATERMARK FOR ts AS ts` gets the
    # same zero-delay mapping (it also applied NO watermark before)
    env.execute_sql(f"""
        CREATE TABLE swm_asc (
            ts TIMESTAMP(3), v DOUBLE,
            WATERMARK FOR ts AS ts
        ) WITH ('connector'='filesystem','path'='{src}',
                'format'='json','scan.streaming'='true')
    """)
    df2 = env.execute_sql("""
        SELECT window_start, SUM(v) AS total
        FROM TABLE(TUMBLE(TABLE swm_asc, DESCRIPTOR(ts), INTERVAL '1' MINUTE))
        GROUP BY window_start, window_end
    """)
    q2 = (
        df2.writeStream.format("memory").queryName("swm_asc_out")
        .outputMode("append").start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()


def test_streaming_setop_r9_advice_guards(spark, tmp_path):
    """r9 ADVICE fixes on the set-op materializer: (1) a fresh
    checkpoint against a sink that already holds FOREIGN data (rows a
    plain INSERT wrote — no surviving set-op state) refuses instead of
    silently wiping them, while INSERT OVERWRITE rebuilds deliberately;
    (2) a comma-joined CTE reference on the right side (`FROM x, c`)
    hits the scope guard the FROM/JOIN regex used to miss."""
    import json as _json

    env = TableEnvironment(spark)
    for name, ks in (("s9_a", [1, 2, 2]), ("s9_b", [2])):
        p = tmp_path / name
        p.mkdir()
        (p / "b0.jsonl").write_text(
            "\n".join(_json.dumps({"k": k}) for k in ks) + "\n"
        )
        env.execute_sql(f"""
            CREATE TABLE {name} (k INT) WITH (
              'connector'='filesystem','path'='{p}',
              'format'='json','scan.streaming'='true')
        """)
    env.execute_sql(f"""
        CREATE TABLE s9_sink (k INT) WITH (
          'connector'='filesystem','path'='{tmp_path}/s9_sink',
          'format'='parquet')
    """)
    # a plain batch INSERT puts foreign rows into the sink first
    env.execute_sql("INSERT INTO s9_sink SELECT CAST(99 AS INT) AS k")
    assert [r[0] for r in env.execute_sql("SELECT * FROM s9_sink").collect()] == [99]
    with pytest.raises(ValueError, match="already contains data"):
        env.execute_sql(
            "INSERT INTO s9_sink SELECT k FROM s9_a EXCEPT ALL SELECT k FROM s9_b"
        )
    # ... and the refusal left the foreign rows alone
    assert [r[0] for r in env.execute_sql("SELECT * FROM s9_sink").collect()] == [99]
    # INSERT OVERWRITE is the explicit opt-in: rebuild from scratch
    q = env.execute_sql(
        "INSERT OVERWRITE s9_sink SELECT k FROM s9_a EXCEPT ALL SELECT k FROM s9_b"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r[0] for r in env.execute_sql("SELECT * FROM s9_sink").collect())
    assert got == [1, 2]
    # ... and OWN retained state is no exception (the review carve-out
    # that bypassed the refusal was removed): a user who nukes only the
    # checkpoint must opt in with OVERWRITE to lose the retained sink
    import shutil as _shutil

    _shutil.rmtree(f"{tmp_path}/s9_sink.__ckpt__")
    with pytest.raises(ValueError, match="already contains data"):
        env.execute_sql(
            "INSERT INTO s9_sink SELECT k FROM s9_a EXCEPT ALL SELECT k FROM s9_b"
        )
    # comma-join CTE reference on the right side: the guard must fire —
    # bare AND backticked (the quoted form must not slip the scan)
    with pytest.raises(ValueError, match="WITH/CTE"):
        env.execute_sql(
            "WITH c AS (SELECT k FROM s9_b) "
            "SELECT k FROM s9_a INTERSECT SELECT x.k FROM s9_b x, c WHERE x.k = c.k"
        )
    with pytest.raises(ValueError, match="WITH/CTE"):
        env.execute_sql(
            "WITH c AS (SELECT k FROM s9_b) "
            "SELECT k FROM s9_a INTERSECT SELECT x.k FROM s9_b x, `c` WHERE x.k = c.k"
        )
    # a comma join of ordinary tables keeps working
    df = env.execute_sql(
        "WITH c AS (SELECT k FROM s9_a) SELECT k FROM c INTERSECT "
        "SELECT x.k FROM s9_b x, s9_a y WHERE x.k = y.k"
    )
    assert df.isStreaming


def test_streaming_setop_sink_cast_after_fold(spark, tmp_path):
    """r9 ADVICE fix: the positional sink cast applies AFTER the
    multiset fold (Flink evaluates the set op on the query's values and
    casts at the sink), so a lossy DOUBLE→INT cast must not merge rows
    the set op treats as distinct: 1.4 EXCEPT 1.6 keeps its row (both
    cast to 1 — pre-fix the sides cancelled), and post-cast key
    collisions across batches rewrite consistently."""
    import json as _json

    env = TableEnvironment(spark)
    a = tmp_path / "sc_a"
    b = tmp_path / "sc_b"
    a.mkdir()
    b.mkdir()
    (a / "b0.jsonl").write_text(_json.dumps({"k": 1.4}) + "\n")
    (b / "b0.jsonl").write_text(_json.dumps({"k": 1.6}) + "\n")
    for name, p in (("sc_a", a), ("sc_b", b)):
        env.execute_sql(f"""
            CREATE TABLE {name} (k DOUBLE) WITH (
              'connector'='filesystem','path'='{p}',
              'format'='json','scan.streaming'='true')
        """)
    env.execute_sql(f"""
        CREATE TABLE sc_sink (k INT) WITH (
          'connector'='filesystem','path'='{tmp_path}/sc_sink',
          'format'='parquet')
    """)
    stmt = "INSERT INTO sc_sink SELECT k FROM sc_a EXCEPT SELECT k FROM sc_b"
    q = env.execute_sql(stmt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r[0] for r in env.execute_sql("SELECT * FROM sc_sink").collect())
    assert got == [1], "1.4 EXCEPT 1.6 must survive the set op, then cast to 1"
    # post-cast collision across batches: 1.6 arriving on the LEFT adds
    # a second pre-cast row under sink key 1 — the affected-key merge
    # (keyed post-cast) must recompute the key from the full state
    (a / "b1.jsonl").write_text(_json.dumps({"k": 1.6}) + "\n")
    q = env.execute_sql(stmt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r[0] for r in env.execute_sql("SELECT * FROM sc_sink").collect())
    assert got == [1], "left 1.6 is cancelled by right 1.6; left 1.4 remains"
    # and retraction through the cast: 1.4 arriving on the RIGHT kills
    # the last remaining pre-cast row of sink key 1
    (b / "b1.jsonl").write_text(_json.dumps({"k": 1.4}) + "\n")
    q = env.execute_sql(stmt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = [r[0] for r in env.execute_sql("SELECT * FROM sc_sink").collect()]
    assert got == []


def test_watermark_unrecognized_strategy_rejects(spark, tmp_path):
    """r9 ADVICE fix: the zero-delay watermark fallback is gated on the
    two recognized non-INTERVAL strategies (SOURCE_WATERMARK(), the
    strictly-ascending `AS ts` form); any other expression raises
    instead of silently tightening the declared strategy to 0 seconds
    (which would drop late rows Flink accepts)."""
    import json as _json

    src = tmp_path / "wm_src"
    src.mkdir()
    (src / "b0.jsonl").write_text(
        _json.dumps({"ts": "2024-01-01T10:00:00", "v": 1.0}) + "\n"
    )
    env = TableEnvironment(spark)
    # the strategy is applied when the streaming table registers, so
    # the unrecognized expression rejects right at CREATE TABLE
    with pytest.raises(ValueError, match="unsupported watermark strategy"):
        env.execute_sql(f"""
            CREATE TABLE wm_bad (
                ts TIMESTAMP(3), v DOUBLE,
                WATERMARK FOR ts AS my_udf(ts)
            ) WITH ('connector'='filesystem','path'='{src}',
                    'format'='json','scan.streaming'='true')
        """)
    # the bounded-delay and SOURCE_WATERMARK forms keep working
    env.execute_sql(f"""
        CREATE TABLE wm_ok (
            ts TIMESTAMP(3), v DOUBLE,
            WATERMARK FOR ts AS SOURCE_WATERMARK()
        ) WITH ('connector'='filesystem','path'='{src}',
                'format'='json','scan.streaming'='true')
    """)
    assert env.execute_sql("SELECT ts, v FROM wm_ok").isStreaming


def test_r10_advice_guards(spark, tmp_path):
    """r10 ADVICE fixes: (1) a comment-separated JOIN reference to a
    CTE (`JOIN -- note\\n cte`) fires the set-op scope guard (the
    FROM/JOIN regex could not cross the comment text and the comma
    scanner stopped at the JOIN keyword — the CTE silently bound to a
    same-named registered table); (2) a string literal containing
    'FROM <cte-name>' no longer adds a phantom FROM-list head (that
    direction falsely REJECTED valid queries); (3) a redundantly
    parenthesized bounded-delay watermark registers again (the r9
    fail-safe tightening broke previously-working DDL)."""
    import json as _json

    env = TableEnvironment(spark)
    for name, ks in (("r10_a", [1, 2]), ("r10_b", [2]), ("c", [3])):
        p = tmp_path / f"src_{name}"
        p.mkdir()
        (p / "b0.jsonl").write_text(
            "\n".join(_json.dumps({"k": k}) for k in ks) + "\n"
        )
        env.execute_sql(f"""
            CREATE TABLE {name} (k INT) WITH (
              'connector'='filesystem','path'='{p}',
              'format'='json','scan.streaming'='true')
        """)
    # (1) comment-separated JOIN head: the registered table `c` must
    # NOT silently shadow the CTE — the guard fires
    with pytest.raises(ValueError, match="WITH/CTE"):
        env.execute_sql(
            "WITH c AS (SELECT k FROM r10_b) "
            "SELECT k FROM r10_a INTERSECT "
            "SELECT x.k FROM r10_b x JOIN -- enriched\n c ON x.k = c.k"
        )
    # (1b) r10 self-review finding: BRACKETED comments disarmed the
    # guard the same way line comments did (the blanker handled only
    # `--`) — `JOIN /* note */ c` and `FROM /* note */ c` let the CTE
    # name silently bind to the registered table `c`; nested form too
    # (Spark parses /* /* */ */ nested, SPARK-28880)
    for ref in ("JOIN /* enriched */ c ON x.k = c.k",
                "JOIN /* a /* b */ c */ c ON x.k = c.k"):
        with pytest.raises(ValueError, match="WITH/CTE"):
            env.execute_sql(
                "WITH c AS (SELECT k FROM r10_b) "
                "SELECT k FROM r10_a INTERSECT "
                f"SELECT x.k FROM r10_b x {ref}"
            )
    with pytest.raises(ValueError, match="WITH/CTE"):
        env.execute_sql(
            "WITH c AS (SELECT k FROM r10_b) "
            "SELECT k FROM r10_a INTERSECT SELECT k FROM /* note */ c"
        )
    # ... and a '/*' inside a string literal is content, not a comment
    # opener that would swallow the rest of the query
    df0 = env.execute_sql(
        "WITH c AS (SELECT k FROM r10_a) SELECT k FROM c INTERSECT "
        "SELECT k FROM r10_b WHERE '/*' <> ''"
    )
    assert df0.isStreaming
    # (1c) second-review finding: an UNPAIRED QUOTE inside a comment
    # (the apostrophe in "it's") must not open a string — under
    # mask-then-scan lexing it paired with a later real literal, the
    # masked region swallowed the comment terminator, and the guard was
    # silently disarmed again; the single-pass lexer closes it
    for ref in (
        "JOIN /* it's enriched */ c ON x.k = c.k AND 'y' <> ''",
        "JOIN -- it's a note\n c ON x.k = c.k AND 'y' <> ''",
    ):
        with pytest.raises(ValueError, match="WITH/CTE"):
            env.execute_sql(
                "WITH c AS (SELECT k FROM r10_b) "
                "SELECT k FROM r10_a INTERSECT "
                f"SELECT x.k FROM r10_b x {ref}"
            )
    # (2) 'FROM c' inside a string literal is content, not a table
    # reference: the query must lower, not reject
    df = env.execute_sql(
        "WITH c AS (SELECT k FROM r10_a) SELECT k FROM c INTERSECT "
        "SELECT k FROM r10_b WHERE 'pulled FROM c' <> ''"
    )
    assert df.isStreaming
    # ... and a FROM inside a line comment is not a FROM list either
    df = env.execute_sql(
        "WITH c AS (SELECT k FROM r10_a) SELECT k FROM c INTERSECT "
        "SELECT k -- taken FROM c\n FROM r10_b"
    )
    assert df.isStreaming
    # (3) outer-paren watermark form registers and keeps its delay
    env.execute_sql(f"""
        CREATE TABLE r10_wm (
            ts TIMESTAMP(3), v DOUBLE,
            WATERMARK FOR ts AS (ts - INTERVAL '5' SECOND)
        ) WITH ('connector'='filesystem','path'='{tmp_path}/src_r10_a',
                'format'='json','scan.streaming'='true')
    """)
    # "(a) - (b)" style must NOT be confused with a redundant wrapper:
    # still the exact bounded-delay shape after stripping nothing
    from flink_1_20_spark.sql_ddl import _apply_watermark

    sdf = spark.readStream.format("rate").load()
    assert _apply_watermark(
        sdf, "timestamp", "((timestamp - INTERVAL '10' SECOND))"
    ) is not None
    with pytest.raises(ValueError, match="unsupported watermark strategy"):
        _apply_watermark(sdf, "timestamp", "(timestamp) - (INTERVAL '1' DAY)")


def test_proctime_lookup_join_batch(spark, tmp_path):
    """Processing-time lookup join through executeSql
    (CommonExecLookupJoin.java:141, TemporalProcessTimeJoinOperator.java:48):
    `JOIN dim FOR SYSTEM_TIME AS OF f.pt` over a `pt AS PROCTIME()`
    computed column enriches each fact row against the dim's CURRENT
    snapshot — INNER drops unmatched keys, LEFT keeps them with NULLs —
    and the snapshot side joins as a BroadcastHashJoin, never a per-row
    lookup."""
    dim = tmp_path / "dim.csv"
    dim.write_text("k,name\n1,one\n2,two\n")
    facts = tmp_path / "facts.csv"
    facts.write_text("fk,v\n1,10\n2,20\n3,30\n")
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE lk_dim (k BIGINT, name STRING)
        WITH ('connector'='filesystem','path'='{dim}','format'='csv')
    """)
    env.execute_sql(f"""
        CREATE TABLE lk_facts (
            fk BIGINT, v BIGINT,
            pt AS PROCTIME()
        ) WITH ('connector'='filesystem','path'='{facts}','format'='csv')
    """)
    # the PROCTIME() computed column registers as a usable timestamp
    row = env.execute_sql("SELECT pt FROM lk_facts LIMIT 1").collect()[0]
    assert row.pt is not None
    # ... and the bare PROCTIME() builtin works in query position too
    assert env.execute_sql("SELECT PROCTIME() AS p").collect()[0].p is not None
    df = env.execute_sql("""
        SELECT f.fk, f.v, d.name
        FROM lk_facts f
        JOIN lk_dim FOR SYSTEM_TIME AS OF f.pt AS d
        ON f.fk = d.k
    """)
    got = sorted((r.fk, r.v, r.name) for r in df.collect())
    assert got == [(1, 10, "one"), (2, 20, "two")]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    got_left = env.execute_sql("""
        SELECT f.fk, d.name
        FROM lk_facts f
        LEFT JOIN lk_dim FOR SYSTEM_TIME AS OF f.pt AS d
        ON f.fk = d.k
    """).collect()
    assert sorted([(r.fk, r.name) for r in got_left], key=str) == sorted(
        [(1, "one"), (2, "two"), (3, None)], key=str
    )
    # alias-qualifier stripping must not rewrite string LITERALS that
    # happen to contain an alias-dot sequence (r9 review fix)
    got_lit = env.execute_sql("""
        SELECT f.fk, 'd.name tag' AS lbl, "f.v dq" AS lbl2
        FROM lk_facts f
        JOIN lk_dim FOR SYSTEM_TIME AS OF f.pt AS d
        ON f.fk = d.k
        WHERE d.name <> 'f.v literal'
    """).collect()
    assert sorted((r.fk, r.lbl, r.lbl2) for r in got_lit) == [
        (1, "d.name tag", "f.v dq"),
        (2, "d.name tag", "f.v dq"),
    ]


def test_proctime_lookup_join_streaming(spark, tmp_path):
    """Streaming fact + bounded dim through the proc-time SQL form: the
    stream-static join enriches every micro-batch against the dim
    snapshot (the micro-batch analog of Flink's per-record lookup); a
    STREAMING dim rejects with a pointer at the event-time form."""
    import json as _json

    dim = tmp_path / "sdim.csv"
    dim.write_text("k,name\n1,one\n2,two\n")
    src = tmp_path / "sfacts"
    src.mkdir()
    (src / "b0.jsonl").write_text(
        "\n".join(_json.dumps({"fk": k, "v": 10 * k}) for k in (1, 2, 3)) + "\n"
    )
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE slk_dim (k BIGINT, name STRING)
        WITH ('connector'='filesystem','path'='{dim}','format'='csv')
    """)
    env.execute_sql(f"""
        CREATE TABLE slk_facts (
            fk BIGINT, v BIGINT,
            pt AS PROCTIME()
        ) WITH ('connector'='filesystem','path'='{src}',
                'format'='json','scan.streaming'='true')
    """)
    df = env.execute_sql("""
        SELECT f.fk, f.v, d.name
        FROM slk_facts f
        LEFT JOIN slk_dim FOR SYSTEM_TIME AS OF f.pt AS d
        ON f.fk = d.k
    """)
    assert df.isStreaming
    q = (
        df.writeStream.format("memory").queryName("slk_out")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        [(r.fk, r.v, r.name) for r in spark.sql("SELECT * FROM slk_out").collect()],
        key=str,
    )
    assert got == sorted(
        [(1, 10, "one"), (2, 20, "two"), (3, 30, None)], key=str
    )
    # a streaming dim must take the event-time (versioned) form instead
    env.execute_sql(f"""
        CREATE TABLE slk_sdim (k BIGINT, name STRING)
        WITH ('connector'='filesystem','path'='{src}',
              'format'='json','scan.streaming'='true')
    """)
    with pytest.raises(ValueError, match="CURRENT snapshot"):
        env.execute_sql("""
            SELECT f.fk FROM slk_facts f
            JOIN slk_sdim FOR SYSTEM_TIME AS OF f.pt AS d
            ON f.fk = d.k
        """)


def test_cascading_window_aggregation(spark, tmp_path):
    """Cascading window aggregation (the reference's documented
    composition — docs/dev/table/sql/queries/window-agg.md: an inner
    window agg view whose ALIASED window_time feeds an outer window
    TVF).  Spark-side this requires the metadata-propagating view
    rebuild (window_time(__w) carries spark.watermarkDelayMs, the
    chained-windowed-aggregation mechanism; a second withWatermark
    would DEADLOCK the min-combined watermark: the outer node never
    sees data until the inner agg emits, which waits on the combined
    watermark).  Values: 1-minute partials summing into 5-minute
    totals across micro-batches."""
    import json as _json

    src = tmp_path / "casc_src"
    src.mkdir()
    rows0 = [
        {"k": 1, "ts": "2024-01-01T10:00:01", "v": 5},
        {"k": 1, "ts": "2024-01-01T10:02:30", "v": 3},
        {"k": 2, "ts": "2024-01-01T10:00:30", "v": 7},
    ]
    (src / "b0.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in rows0) + "\n"
    )
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE casc_src (k BIGINT, ts TIMESTAMP(3), v BIGINT,
            WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
        ) WITH ('connector'='filesystem','path'='{src}',
                'format'='json','scan.streaming'='true')
    """)
    env.execute_sql("""
        CREATE VIEW casc_w1 AS
        SELECT window_start AS ws1, window_end AS we1,
               window_time AS rowtime, k, CAST(sum(v) AS BIGINT) AS total
        FROM TABLE(TUMBLE(TABLE casc_src, DESCRIPTOR(ts),
                          INTERVAL '1' MINUTE))
        GROUP BY window_start, window_end, window_time, k
    """)
    out = env.execute_sql("""
        SELECT window_start, window_end, k,
               CAST(sum(total) AS BIGINT) AS total5
        FROM TABLE(TUMBLE(TABLE casc_w1, DESCRIPTOR(rowtime),
                          INTERVAL '5' MINUTE))
        GROUP BY window_start, window_end, k
    """)
    assert out.isStreaming
    from flink_1_20_spark.streaming import run_to_memory

    q = run_to_memory(out, "casc_out", output_mode="append")
    try:
        q.processAllAvailable()
        # advance both window layers' watermark past the 10:00 windows
        for i in range(1, 5):
            (src / f"b{i}.jsonl").write_text(
                _json.dumps(
                    {"k": 1, "ts": f"2024-01-01T{10 + i}:00:00", "v": 1}
                )
                + "\n"
            )
            q.processAllAvailable()
        got = {
            (str(r["window_start"]), r["k"]): r["total5"]
            for r in spark.table("casc_out").collect()
        }
    finally:
        q.stop()
    # two 1-minute partials for k=1 (5 at 10:00, 3 at 10:02) roll up
    # into one 5-minute total; k=2's single partial stays 7
    assert got[("2024-01-01 10:00:00", 1)] == 8
    assert got[("2024-01-01 10:00:00", 2)] == 7
    env.execute_sql("DROP VIEW casc_w1")
