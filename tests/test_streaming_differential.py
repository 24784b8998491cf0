"""Streaming-vs-batch differential property tests (VERDICT r10 task 3).

Pinned seeds through scripts/streaming_differential.py: seeded random
batches land file-by-file in a monitored-dir streaming table, the
streaming lowering runs to a drained sink, and the result must equal
the BATCH executeSql of the same query text over the same accumulated
files — the reference's own ITCase strategy (stream/sql vs batch/sql
WindowAggregateITCase share query text).  Eleven shapes: TUMBLE
(INSERT path), HOP, SESSION, CUMULATE, dedup-first, Top-N, interval
join, plus the r11 extension to the remaining stateful lowerings —
non-windowed GROUP BY (complete mode), EXCEPT ALL / INTERSECT ALL
(the signed-count retraction materialization, fresh multiset batches
per seed), and event-time RANGE over-aggregation (the
streaming_over_range keyed-state facade vs the batch OVER window).
Restart mode (r11, second half): the same equality with a mid-stream
stop + checkpoint restart — see test_streaming_matches_batch_across_restart.
Thirteen shapes since the r11 second half (+window_join, the TVF-windowed
stream-stream join, and +temporal_join, streaming FOR SYSTEM_TIME AS OF
vs the batch as-of operator).  temporal_join found a REAL bug on its
first run: watermark-held events for keys with no further input never
drained (NoTimeout) — fixed with an event-time drain timer
(TemporalRowTimeJoinOperator's registerSmallestTimer), which exposed a
second: the post-union max-based watermark let the stateful operator's
late-input filter drop in-flight dim versions — fixed with per-input
watermarks under Spark's default min combine policy (the reference's
two-input operator watermark).  Both fixes are pinned by
tests/test_temporal_stream.py::test_temporal_join_watermark_late_dim
and the executeSql test's combined-watermark drain asserts.

Found on first soak (seed 7, session shape): the batch SESSION TVF
lowering started a new session at diff == gap while Flink
(TimeWindow.intersects, flink-table-runtime .../window/TimeWindow.java:116,
inclusive `end >= other.start`; SessionWindowAssignerTest.
testMergeConsecutiveWindows merges abutting [0,1]+[1,2]) and Spark's
native session_window both MERGE there — fixed to strict `>` across
the five lag-rewrite sites (sql_flink lowering, both wtvf_session
oracles, the DataStream facade, the dialect-fuzz oracle);
test_session_tvf_exact_gap_boundary_merges below pins the boundary.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from streaming_differential import SHAPES, run_shape  # noqa: E402

# seed 7 is the session-shape bug finder; 42 is the authoring seed;
# 1234 is a fresh pin never used while developing the harness.
# Gate mode (r14, VERDICT r13 task 1) runs ONE seed per shape so the
# driver's pytest window fits: seed 7 is kept because it is the one
# with a found-bug history, and that bug's reduced form is now pinned
# by the fast test_session_tvf_exact_gap_boundary_merges below.  The
# full battery stays available: SPARK_GRAFT_SOAK=1 restores all three
# seeds (scripts/streaming_differential.py runs the multi-seed +
# restart soak directly as well).
_SOAK = os.environ.get("SPARK_GRAFT_SOAK") == "1"
PINNED_SEEDS = (7, 42, 1234) if _SOAK else (7,)


@pytest.mark.parametrize("shape", SHAPES)
def test_streaming_matches_batch(spark, shape):
    for seed in PINNED_SEEDS:
        got, want = run_shape(spark, shape, seed)
        assert got == want, (
            f"seed={seed} {shape}: streaming and batch executeSql "
            f"diverge\n only-stream={[r for r in got if r not in want][:5]}"
            f"\n only-batch={[r for r in want if r not in got][:5]}"
        )
        assert want, f"seed={seed} {shape}: vacuous (batch side empty)"


@pytest.mark.parametrize("shape", SHAPES)
def test_streaming_matches_batch_across_restart(spark, shape):
    """The exactly-once recovery differential (r11): the streaming
    query is stopped and restarted from its checkpoint at a
    seed-chosen batch boundary — before or after that batch's files
    commit — and the stream-vs-batch equality must still hold.  This
    requires every lowering to re-produce a checkpoint-COMPATIBLE plan
    (stable stateful-operator order + state schema), the analogue of
    Flink's savepoint operator-ID stability (uid()/setUidHash;
    flink-tests .../checkpointing/SavepointITCase.java)."""
    seed = 42  # one pinned seed per shape here; the CLI --restart
    # soak carries the multi-seed battery (11 shapes x full-suite cost)
    got, want = run_shape(spark, shape, seed, restart=True)
    assert got == want, (
        f"seed={seed} {shape} +restart: streaming and batch diverge\n"
        f" only-stream={[r for r in got if r not in want][:5]}\n"
        f" only-batch={[r for r in want if r not in got][:5]}"
    )
    assert want, f"seed={seed} {shape} +restart: vacuous"


def test_session_tvf_exact_gap_boundary_merges(spark):
    """The seed-7 find, reduced: two events exactly `gap` apart are ONE
    session (TimeWindow.intersects is inclusive; Spark session_window
    agrees), in BOTH the batch SESSION TVF lowering and the DataStream
    facade."""
    from flink_1_20_spark.sql_ddl import TableEnvironment

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 10),
            (1, "2024-01-01 10:00:15", 20),  # exactly gap after
            (1, "2024-01-01 10:00:31", 30),  # gap + 1s → new session
        ],
        "k bigint, ts string, v bigint",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts", "v")
    df.createOrReplaceTempView("sess_edge")
    env = TableEnvironment(spark)
    rows = sorted(
        (str(r["window_start"]), str(r["window_end"]), r["n"])
        for r in env.execute_sql(
            """
            SELECT window_start, window_end, count(*) AS n
            FROM TABLE(SESSION(TABLE sess_edge PARTITION BY k,
                               DESCRIPTOR(ts), INTERVAL '15' SECOND))
            GROUP BY window_start, window_end, k
            """
        ).collect()
    )
    assert rows == [
        ("2024-01-01 10:00:00", "2024-01-01 10:00:30", 2),
        ("2024-01-01 10:00:31", "2024-01-01 10:00:46", 1),
    ]
