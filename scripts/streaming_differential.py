"""Streaming-vs-batch differential harness (VERDICT r10 task 3).

The property-test upgrade for the hand-written streaming lowerings in
`flink_1_20_spark/sqlenv/streaming_sql.py` + `sql_flink.py`: seeded
random batches are written file-by-file into a monitored-directory
streaming table, the streaming lowering runs the query to a sink
(drained with processAllAvailable — deterministic, the availableNow
discipline), and the drained sink must equal the BATCH executeSql
result of the SAME query text over the same accumulated files.

This is the reference's own validation strategy: Flink's ITCase
harnesses run one query in both batch and streaming table environments
and diff the results (e.g.
flink-table/flink-table-planner/src/test/.../stream/sql/WindowAggregateITCase.scala
vs .../batch/sql/agg/WindowAggregateITCase.scala share query text).

Shapes covered (each exercises a different lowering path):
  tumble        TUMBLE TVF agg through the INSERT INTO filesystem-sink
                path (append mode, watermark-closed windows)
  hop           HOP TVF agg through the SELECT fallthrough + __w
                GROUP BY re-lowering (memory append sink)
  session       SESSION TVF (PARTITION BY key, fixed gap) → native
                session_window struct; sessions merge across
                micro-batches before the watermark closes them
  cumulate      CUMULATE TVF (expanding slices) through the hidden
                __cum max-window re-group lowering
  dedup_first   ROW_NUMBER()=1 ORDER BY rowtime ASC → streaming dedup
                operator (updating result; complete-mode sink equals
                the batch dedup exactly)
  topn          rn <= N ORDER BY value → streaming Top-N operator
                (update-mode changelog keyed on (key, rank); final
                state = last emission per (key, rank))
  interval_join two watermarked streams, time-range join → native
                stream-stream join (append mode)
  group_agg     non-windowed streaming GROUP BY (the executeSql
                fallthrough to Spark's streaming aggregation;
                complete-mode sink equals the batch GROUP BY)
  except_all    INSERT INTO parquet-sink EXCEPT ALL — the signed-count
  intersect_all retraction materialization (streaming/setops.py:
                per-epoch multiset-count fold, affected-key sink
                rewrite); interleaved random multiset batches per
                side, final sink content vs the batch set op
  over_range    event-time RANGE INTERVAL PRECEDING over-aggregation →
                the keyed-state facade (streaming_over_range: one
                emission per input row, windows spanning micro-batch
                boundaries) vs the batch OVER window — the facade
                computes in DOUBLE (documented divergence: Flink types
                SUM(BIGINT) as BIGINT), so values compare as floats
  window_join   TVF-windowed stream-stream join (both sides TUMBLE'd,
                joined on key + window bounds) through the INSERT INTO
                parquet path; flush keys DIFFER per side because the
                stream-stream inner join emits matches eagerly
  temporal_join streaming FOR SYSTEM_TIME AS OF vs the BATCH as-of
                operator over the same files — two independent
                implementations of one semantics.  FOUND a real bug on
                its first run: watermark-held events for a key that
                never received another row stayed buffered forever
                (GroupStateTimeout.NoTimeout) — fixed with an
                event-time drain timer at the earliest held event,
                which in turn exposed that the single post-union
                watermark was max-based and let the operator's
                late-input filter drop in-flight dim versions — fixed
                with per-input watermarks combined by Spark's default
                min policy, the reference's two-input watermark
  cep           streaming MATCH_RECOGNIZE (keyed-state NFA, partial
                matches completing across micro-batches) vs the batch
                NFA, same query text (fixed A B C, SKIP TO NEXT ROW).
                FOUND a real bug on its first soak (seed 900): the
                revisiting skip strategies consumed matched rows from
                the NFA buffer, dropping overlapping matches whose
                tail arrives in a later batch — only PAST_LAST_EVENT
                may consume; the others now retain and dedup by
                last-event-is-new
  upsert_agg    non-windowed streaming GROUP BY materialized into a
                PRIMARY KEY file sink (SinkUpsertMaterializer epoch
                swap) vs the batch GROUP BY, same text.  Its RESTART
                variant FOUND a real bug: the re-executed INSERT's
                failed append attempt dropped a _spark_metadata sink
                log into the live table directory, poisoning the
                upsert merge's read of its own table — the fallback
                now scrubs the droppings
  over_rows     event-time ROWS n PRECEDING over-agg → the
                streaming_over_rows keyed-state facade (the ROWS twin
                of over_range; frames depend on per-key arrival order,
                which the band generator preserves)
  cascade       CASCADING window aggregation (window-agg.md): a
                1-minute TUMBLE agg view (window columns aliased,
                window_time AS rowtime — the reference's required
                idiom) feeding a 5-minute TUMBLE rollup over the
                propagated time attribute.  Exercises the
                metadata-propagating view rebuild (window_time(__w)
                carries the event-time tag; a re-watermark would
                deadlock the min-combined watermark) — partial sums
                compose across micro-batches before outer windows
                close, and the chained plan restarts from checkpoint
  window_topn   WINDOW Top-N (StreamExecWindowRank): streaming_topn
                keyed by the tumbling-window bucket vs the batch
                ROW_NUMBER over the TUMBLE TVF (r12)
  session_dynamic dynamic-gap SESSION (per-event gap expression —
                DataStream SessionWindowTimeGapExtractor) vs a
                running-max-end gaps-and-islands oracle (r12)
  cep_all_rows  streaming MATCH_RECOGNIZE ALL ROWS PER MATCH:
                per-row emission, CLASSIFIER(), MATCH_NUMBER()
                persisted in state across micro-batches (r12)
  cep_skip_extend the SKIP_TO_LAST + variable-length decider (r12):
                greedy B+ with step conditions OVERLAPPING C's, so a
                backtracking-completed match at a batch boundary CAN
                be reshaped by later input.  FOUND the r11 documented
                divergence live (seed 102: an early short emission
                the batch chain never reports) — fixed with the
                provisional-match hold + (first_ts, last_ts) emission
                log in streaming/cep_stream.py; per-key finalizer
                rows play end-of-input MAX_WATERMARK
  proctime_lookup processing-time lookup join (stream-static, fixed
                dim snapshot — the deterministic case) vs the same
                text over the accumulated fact files (r12)
  cdc_source    CDC/changelog source (ChangelogSourceITCase): a
                monitored-dir debezium-json table feeds the
                retract-aware changelog-agg lowering (-U/-D subtract,
                zero-live groups DELETE at the sink) into a PK upsert
                sink vs the batch aggregate over the MATERIALIZED
                final image of the same files (r12)
  cdc_minmax    retractable MIN/MAX + AVG over the same CDC envelope
                generator: the multiset-state path (Flink's
                Min/MaxWithRetractAggFunction) — a retracted extreme
                must expose the next-best LIVE value, duplicates
                counted not set-collapsed (r12 second half)
  cdc_stddev    retractable STDDEV_SAMP/VAR_POP over the CDC envelope
                generator: signed (count, sum, sum-of-squares) —
                Flink's VarPop/VarSampAggFunction retract methods;
                the oracle mirrors the exact closed form so integer
                inputs give bit-identical doubles (r13)

Determinism rules the GENERATOR must honor (both engines drop late
data the same way only if disorder is bounded):
  - event times advance in per-batch bands (60s apart) with disorder
    confined to the band, so no row is ever late against the running
    watermark (delay 5s) — matching Flink's bounded-out-of-orderness
    contract;
  - (key, ts) and (key, v) are collision-free where the shape's
    semantics would otherwise tie (dedup min_by / Top-N ordering);
  - windowed shapes get a final far-future FLUSH row so every real
    window closes; both sides filter window_end <= the final watermark
    (the flush row's own window never emits, and the filter removes it
    from the batch side identically).

Restart mode (--restart): every shape's streaming query is stopped and
RESTARTED from its checkpoint at a seed-chosen batch boundary — either
with that batch's files still pending (recovered offsets must pick
them up) or after their commit (recovered state only) — and the
stream-vs-batch equality must still hold.  This is the exactly-once
recovery differential: it requires every lowering to produce a
checkpoint-COMPATIBLE plan on re-execution (stable stateful-operator
order and state schema), the engine's analogue of Flink's savepoint
operator-ID stability (flink-streaming-java uid()/setUidHash;
SavepointITCase).  Memory-sink shapes collect the union of per-run
sink tables (append/update changelogs concatenate; complete mode takes
the last run that emitted); INSERT shapes re-execute the statement —
their sink checkpoint derives from the sink path, so recovery is
automatic.

Usage:
    python scripts/streaming_differential.py --seed 42          # one seed, all shapes
    python scripts/streaming_differential.py --soak 20          # N fresh seeds
    python scripts/streaming_differential.py --soak 10 --restart
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
from datetime import datetime, timedelta
from random import Random

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = datetime(2024, 1, 1, 10, 0, 0)
DELAY_S = 5          # watermark bounded-disorder delay
BAND_S = 60          # per-batch event-time band spacing
FLUSH_TS = BASE + timedelta(hours=2)

SHAPES = (
    "tumble",
    "hop",
    "session",
    "cumulate",
    "dedup_first",
    "topn",
    "interval_join",
    "group_agg",
    "except_all",
    "intersect_all",
    "over_range",
    "window_join",
    "temporal_join",
    "cep",
    "upsert_agg",
    "over_rows",
    "cascade",
    # r12 additions (VERDICT r11 tasks 3 + 5)
    "window_topn",
    "session_dynamic",
    "cep_all_rows",
    "cep_skip_extend",
    "proctime_lookup",
    "cdc_source",
    # r12 second half: the retractable-accumulator path (multiset
    # MIN/MAX + AVG) of the changelog aggregation
    "cdc_minmax",
    # r13 (VERDICT r12 task 5): retractable STDDEV/VAR — signed
    # (count, sum, sum-of-squares) decomposition
    "cdc_stddev",
)


def _fmt(ts: datetime) -> str:
    return ts.strftime("%Y-%m-%dT%H:%M:%S")


def gen_batches(rng: Random, n_batches: int, rows_per_batch: int):
    """Rows as (k, ts, v): ts unique within a batch band (disorder
    bounded by the band), v globally unique, keys from a small pool so
    groups/ranks/dedups actually contend."""
    vpool = rng.sample(range(1, 10_000_000), n_batches * rows_per_batch)
    vi = 0
    batches = []
    for b in range(n_batches):
        band = BASE + timedelta(seconds=b * BAND_S)
        offsets = rng.sample(range(BAND_S - DELAY_S - 1), rows_per_batch)
        rows = []
        for off in offsets:
            rows.append(
                {
                    "k": rng.randint(1, 4),
                    "ts": _fmt(band + timedelta(seconds=off)),
                    "v": vpool[vi],
                }
            )
            vi += 1
        batches.append(rows)
    return batches


def _write_batch(src_dir: str, i: int, rows: list[dict]) -> None:
    with open(os.path.join(src_dir, f"b{i}.jsonl"), "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows) + "\n")


def _mk_tables(env, name: str, src: str, *, streaming: bool, cols: str,
               wm_col: str) -> None:
    mode = "true" if streaming else "false"
    wm = (
        f", WATERMARK FOR {wm_col} AS {wm_col} - INTERVAL '{DELAY_S}' SECOND"
        if streaming
        else ""
    )
    env.execute_sql(
        f"CREATE TABLE {name} ({cols}{wm}) WITH ("
        f"'connector'='filesystem','path'='{src}',"
        f"'format'='json','scan.streaming'='{mode}')"
    )


class _MemDrain:
    """Streaming SELECT drained into memory sinks, restartable from its
    checkpoint: restart() stops the query and re-executes the SAME
    query text against the SAME checkpoint under a fresh sink table —
    the exactly-once recovery differential.  The lowering must produce
    a checkpoint-compatible plan on re-execution (stable stateful
    operator order/schema), which is this engine's analogue of Flink's
    savepoint operator-ID stability."""

    def __init__(self, env, spark, query_text, tag: str, mode: str,
                 tmp: str, restartable: bool = False):
        """query_text: the executeSql statement, or a zero-arg callable
        returning the streaming DataFrame (composition-API shapes —
        window Top-N, dynamic-gap session — that have no executeSql
        spelling; the callable must build the SAME plan on every call
        so restart recovery sees a checkpoint-compatible query)."""
        self.env, self.spark = env, spark
        self.query_text, self.tag, self.mode = query_text, tag, mode
        self.ckpt = os.path.join(tmp, f"ckpt_{tag}")
        self.names: list[str] = []
        # Spark's memory sink supports checkpoint recovery ONLY in
        # complete mode (it truncates per trigger, so a fresh run can
        # rebuild); append/update restart runs sink through
        # foreachBatch instead — recovery-supported, and the driver-side
        # accumulator persists across runs, preserving emission order.
        self.use_fb = restartable and mode != "complete"
        # keyed by epoch id: a restart that interrupts an in-flight
        # micro-batch (restart_before stops the query with files
        # pending) replays that epoch under the SAME id — the replay
        # overwrites its own slot instead of appending duplicates
        self.acc: dict[int, list] = {}
        self.q = None
        self._start()

    def _start(self) -> None:
        out = (
            self.query_text()
            if callable(self.query_text)
            else self.env.execute_sql(self.query_text)
        )
        assert out.isStreaming, "shape did not produce a streaming frame"
        if self.use_fb:
            acc = self.acc
            self.q = (
                out.writeStream.foreachBatch(
                    lambda df, eid: acc.__setitem__(int(eid), df.collect())
                )
                .outputMode(self.mode)
                .option("checkpointLocation", self.ckpt)
                .start()
            )
            return
        name = f"{self.tag}_run{len(self.names)}"
        self.q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode(self.mode)
            .option("checkpointLocation", self.ckpt)
            .start()
        )
        self.names.append(name)

    def process(self) -> None:
        self.q.processAllAvailable()

    def restart(self) -> None:
        self.q.stop()
        self._start()

    def stop(self) -> None:
        try:
            self.q.stop()
        except Exception:
            pass

    def emissions(self):
        """All sink rows across runs in emission order (append/update
        modes: the union of per-run tables IS the changelog — a clean
        stop after processAllAvailable commits, so no replay dups)."""
        if self.use_fb:
            return [
                r
                for eid in sorted(self.acc)
                for r in self.acc[eid]
            ]
        rows = []
        for n in self.names:
            rows.extend(self.spark.table(n).collect())
        return rows

    def final_complete(self):
        """Complete mode: the last run that emitted holds the full
        state (memory sink truncates per trigger in complete mode; a
        run that saw no data after restart stays empty)."""
        for n in reversed(self.names):
            rows = self.spark.table(n).collect()
            if rows:
                return rows
        return []


class _InsertDrain:
    """INSERT INTO <sink> statement drain; restart() re-executes the
    same statement — the sink's checkpoint is derived from its path, so
    the new run recovers source offsets + state exactly-once."""

    def __init__(self, env, insert_sql: str):
        self.env, self.sql = env, insert_sql
        self.q = env.execute_sql(insert_sql)

    def process(self) -> None:
        self.q.processAllAvailable()

    def restart(self) -> None:
        self.q.stop()
        self.q = self.env.execute_sql(self.sql)

    def stop(self) -> None:
        try:
            self.q.stop()
        except Exception:
            pass


def _feed_loop(drain, write_fn, n_iters: int, restart_at, restart_before):
    """Write batch i, process it; around batch `restart_at` bounce the
    query — either with the files still pending (restart_before: the
    new run picks them up from recovered offsets) or after their commit
    (the new run starts on recovered state only)."""
    for i in range(n_iters):
        write_fn(i)
        if restart_at == i and restart_before:
            drain.restart()
        drain.process()
        if restart_at == i and not restart_before:
            drain.restart()


def _norm(rows, cols):
    return sorted(tuple(str(r[c]) for c in cols) for r in rows)


def _normf(rows, cols):
    """Like _norm but numeric values compare as floats — the over-agg
    facade computes in DOUBLE while the batch plan keeps SUM(BIGINT) as
    BIGINT (documented divergence), so 123 and 123.0 must agree."""
    def c(v):
        return repr(float(v)) if isinstance(v, (int, float)) else str(v)

    return sorted(tuple(c(r[c_]) for c_ in cols) for r in rows)


def run_shape(spark, shape: str, seed: int, n_batches: int = 4,
              rows_per_batch: int = 12, restart: bool = False):
    """Run one shape for one seed; returns (streaming_rows, batch_rows)
    as normalized sorted tuple lists — equal on success.  With
    restart=True the streaming query is stopped and restarted from its
    checkpoint around a seed-chosen batch boundary (before or after
    that batch commits), and the equality must STILL hold — the
    exactly-once recovery differential."""
    from flink_1_20_spark.sql_ddl import TableEnvironment

    rng = Random(seed)
    batches = gen_batches(rng, n_batches, rows_per_batch)
    # restart params come from an independent stream so batch data is
    # byte-identical to the non-restart run of the same seed
    restart_at = restart_before = None
    if restart:
        rrng = Random(seed * 1_000_003 + 17)
        restart_at = rrng.randint(1, n_batches - 1)
        restart_before = rrng.random() < 0.5
    tag = f"sd_{shape}_{seed}_{abs(hash((shape, seed))) % 99999}"
    if restart:
        tag += "_rst"
    tmp = tempfile.mkdtemp(prefix=tag)
    env = TableEnvironment(spark)
    cols = "k BIGINT, ts TIMESTAMP(3), v BIGINT"
    wm_cut = (FLUSH_TS - timedelta(seconds=DELAY_S)).strftime(
        "%Y-%m-%d %H:%M:%S"
    )
    try:
        if shape == "interval_join":
            lsrc = os.path.join(tmp, "l")
            rsrc = os.path.join(tmp, "r")
            os.makedirs(lsrc), os.makedirs(rsrc)
            rbatches = gen_batches(rng, n_batches, rows_per_batch)
            _mk_tables(env, f"{tag}_l", lsrc, streaming=True,
                       cols="k BIGINT, lts TIMESTAMP(3), lv BIGINT",
                       wm_col="lts")
            _mk_tables(env, f"{tag}_r", rsrc, streaming=True,
                       cols="k BIGINT, rts TIMESTAMP(3), rv BIGINT",
                       wm_col="rts")
            jq = f"""
                SELECT l.k AS k, l.lv AS lv, r.rv AS rv
                FROM {{L}} l JOIN {{R}} r
                  ON l.k = r.k
                 AND r.rts BETWEEN l.lts - INTERVAL '30' SECOND
                               AND l.lts + INTERVAL '30' SECOND"""
            d = _MemDrain(env, spark, jq.format(L=f"{tag}_l", R=f"{tag}_r"),
                          tag, "append", tmp,
                          restartable=restart_at is not None)

            def _wf_ij(i):
                _write_batch(
                    lsrc, i,
                    [{"k": r["k"], "lts": r["ts"], "lv": r["v"]}
                     for r in batches[i]],
                )
                _write_batch(
                    rsrc, i,
                    [{"k": r["k"], "rts": r["ts"], "rv": r["v"]}
                     for r in rbatches[i]],
                )

            try:
                _feed_loop(d, _wf_ij, n_batches, restart_at, restart_before)
            finally:
                d.stop()
            got = _norm(d.emissions(), ["k", "lv", "rv"])
            _mk_tables(env, f"{tag}_lb", lsrc, streaming=False,
                       cols="k BIGINT, lts TIMESTAMP(3), lv BIGINT",
                       wm_col="lts")
            _mk_tables(env, f"{tag}_rb", rsrc, streaming=False,
                       cols="k BIGINT, rts TIMESTAMP(3), rv BIGINT",
                       wm_col="rts")
            want = _norm(
                env.execute_sql(
                    jq.format(L=f"{tag}_lb", R=f"{tag}_rb")
                ).collect(),
                ["k", "lv", "rv"],
            )
            return got, want

        if shape in ("except_all", "intersect_all"):
            # the signed-count retraction materialization: interleaved
            # random MULTISET batches (small key domain so per-key
            # counts contend and retraction actually fires), final sink
            # content vs the batch set op over the accumulated files
            op = "EXCEPT ALL" if shape == "except_all" else "INTERSECT ALL"
            lsrc = os.path.join(tmp, "l")
            rsrc = os.path.join(tmp, "r")
            outdir = os.path.join(tmp, "out")
            for d in (lsrc, rsrc, outdir):
                os.makedirs(d)
            for t, d in ((f"{tag}_l", lsrc), (f"{tag}_r", rsrc)):
                env.execute_sql(
                    f"CREATE TABLE {t} (k BIGINT) WITH ("
                    f"'connector'='filesystem','path'='{d}',"
                    f"'format'='json','scan.streaming'='true')"
                )
            env.execute_sql(
                f"CREATE TABLE {tag}_sink (k BIGINT) WITH ("
                f"'connector'='filesystem','path'='{outdir}',"
                f"'format'='parquet')"
            )
            d = _InsertDrain(
                env,
                f"INSERT INTO {tag}_sink "
                f"SELECT k FROM {tag}_l {op} SELECT k FROM {tag}_r",
            )

            def _wf_so(i):
                for sdir in (lsrc, rsrc):
                    _write_batch(
                        sdir, i,
                        [{"k": rng.randint(0, 6)}
                         for _ in range(rng.randint(1, 10))],
                    )

            try:
                _feed_loop(d, _wf_so, n_batches, restart_at, restart_before)
            finally:
                d.stop()
            got = _norm(
                env.execute_sql(f"SELECT k FROM {tag}_sink").collect(), ["k"]
            )
            for t, d in ((f"{tag}_lb", lsrc), (f"{tag}_rb", rsrc)):
                env.execute_sql(
                    f"CREATE TABLE {t} (k BIGINT) WITH ("
                    f"'connector'='filesystem','path'='{d}','format'='json')"
                )
            want = _norm(
                env.execute_sql(
                    f"SELECT k FROM {tag}_lb {op} SELECT k FROM {tag}_rb"
                ).collect(),
                ["k"],
            )
            return got, want

        src = os.path.join(tmp, "src")
        os.makedirs(src)
        _mk_tables(env, f"{tag}_s", src, streaming=True, cols=cols,
                   wm_col="ts")

        if shape in ("tumble", "hop", "session", "cumulate"):
            tvf = {
                "tumble": "TUMBLE(TABLE {T}, DESCRIPTOR(ts), "
                "INTERVAL '1' MINUTE)",
                "hop": "HOP(TABLE {T}, DESCRIPTOR(ts), "
                "INTERVAL '30' SECOND, INTERVAL '1' MINUTE)",
                # gap 15s < the 60s band spacing, so sessions merge
                # WITHIN a batch band and sometimes ACROSS the boundary
                # (max offset 53 → next band offset 0 is 7s) — exercises
                # the cross-micro-batch session-merge state path
                "session": "SESSION(TABLE {T} PARTITION BY k, "
                "DESCRIPTOR(ts), INTERVAL '15' SECOND)",
                # expanding slices: each bucket's slices all emit once
                # the watermark passes the bucket's MAX window (the
                # documented emission-timing parity note) — identical
                # rows to batch after the flush closes every bucket
                "cumulate": "CUMULATE(TABLE {T}, DESCRIPTOR(ts), "
                "INTERVAL '30' SECOND, INTERVAL '2' MINUTE)",
            }[shape]
            body = (
                "SELECT window_start, window_end, k, "
                "count(*) AS n, sum(v) AS total "
                f"FROM TABLE({tvf}) "
                "GROUP BY window_start, window_end, k"
            )
            outdir = os.path.join(tmp, "out")
            # pre-create so the sink CREATE TABLE's batch-view probe
            # doesn't log a FileNotFound WARN stack
            os.makedirs(outdir, exist_ok=True)
            if shape == "tumble":
                # the INSERT INTO filesystem-sink lowering path
                env.execute_sql(
                    f"CREATE TABLE {tag}_sink (window_start TIMESTAMP(3), "
                    "window_end TIMESTAMP(3), k BIGINT, n BIGINT, "
                    f"total BIGINT) WITH ('connector'='filesystem',"
                    f"'path'='{outdir}','format'='parquet',"
                    f"'checkpoint'='{os.path.join(tmp, 'ck')}')"
                )
                d = _InsertDrain(
                    env,
                    f"INSERT INTO {tag}_sink " + body.format(T=f"{tag}_s"),
                )
            else:
                d = _MemDrain(env, spark, body.format(T=f"{tag}_s"),
                              tag, "append", tmp,
                              restartable=restart_at is not None)
            try:
                _feed_loop(d, lambda i: _write_batch(src, i, batches[i]),
                           n_batches, restart_at, restart_before)
                # flush row closes every real window
                _write_batch(
                    src, n_batches,
                    [{"k": 1, "ts": _fmt(FLUSH_TS), "v": 1}],
                )
                d.process()
            finally:
                d.stop()
            cols_out = ["window_start", "window_end", "k", "n", "total"]
            if shape == "tumble":
                emitted = spark.read.parquet(outdir).collect()
            else:
                emitted = d.emissions()
            got = _norm(emitted, cols_out)
            _mk_tables(env, f"{tag}_b", src, streaming=False, cols=cols,
                       wm_col="ts")
            want = _norm(
                env.execute_sql(
                    body.format(T=f"{tag}_b")
                    + f" HAVING window_end <= TIMESTAMP '{wm_cut}'"
                ).collect(),
                cols_out,
            )
            return got, want

        if shape == "dedup_first":
            body = (
                "SELECT k, ts, v FROM ("
                "  SELECT *, ROW_NUMBER() OVER (PARTITION BY k "
                "ORDER BY ts ASC) AS rn FROM {T}) WHERE rn = 1"
            )
            d = _MemDrain(env, spark, body.format(T=f"{tag}_s"), tag,
                          "complete", tmp,
                          restartable=restart_at is not None)
            try:
                _feed_loop(d, lambda i: _write_batch(src, i, batches[i]),
                           n_batches, restart_at, restart_before)
            finally:
                d.stop()
            got = _norm(d.final_complete(), ["k", "ts", "v"])
            _mk_tables(env, f"{tag}_b", src, streaming=False, cols=cols,
                       wm_col="ts")
            want = _norm(
                env.execute_sql(body.format(T=f"{tag}_b")).collect(),
                ["k", "ts", "v"],
            )
            return got, want

        if shape == "topn":
            body = (
                "SELECT k, v, rn FROM ("
                "  SELECT *, ROW_NUMBER() OVER (PARTITION BY k "
                "ORDER BY v ASC) AS rn FROM {T}) WHERE rn <= 2"
            )
            d = _MemDrain(env, spark, body.format(T=f"{tag}_s"), tag,
                          "update", tmp,
                          restartable=restart_at is not None)
            try:
                _feed_loop(d, lambda i: _write_batch(src, i, batches[i]),
                           n_batches, restart_at, restart_before)
            finally:
                d.stop()
            # update-mode changelog keyed on (k, rn): final state is the
            # LAST emission per key — memory-sink rows arrive in batch
            # order (runs concatenated in run order), so last wins
            final: dict[tuple, tuple] = {}
            for r in d.emissions():
                final[(r["k"], r["rn"])] = (str(r["k"]), str(r["v"]),
                                            str(r["rn"]))
            got = sorted(final.values())
            _mk_tables(env, f"{tag}_b", src, streaming=False, cols=cols,
                       wm_col="ts")
            want = _norm(
                env.execute_sql(body.format(T=f"{tag}_b")).collect(),
                ["k", "v", "rn"],
            )
            return got, want

        if shape == "group_agg":
            # non-windowed streaming GROUP BY: the executeSql
            # fallthrough to Spark's native streaming aggregation —
            # complete-mode final state equals the batch GROUP BY
            body = (
                "SELECT k, count(*) AS n, sum(v) AS total, "
                "min(v) AS lo, max(v) AS hi FROM {T} GROUP BY k"
            )
            d = _MemDrain(env, spark, body.format(T=f"{tag}_s"), tag,
                          "complete", tmp,
                          restartable=restart_at is not None)
            try:
                _feed_loop(d, lambda i: _write_batch(src, i, batches[i]),
                           n_batches, restart_at, restart_before)
            finally:
                d.stop()
            cols_out = ["k", "n", "total", "lo", "hi"]
            got = _norm(d.final_complete(), cols_out)
            _mk_tables(env, f"{tag}_b", src, streaming=False, cols=cols,
                       wm_col="ts")
            want = _norm(
                env.execute_sql(body.format(T=f"{tag}_b")).collect(),
                cols_out,
            )
            return got, want

        if shape in ("over_range", "over_rows"):
            # event-time RANGE / ROWS over-agg → the keyed-state
            # facades streaming_over_range / streaming_over_rows (one
            # emission per input row, update mode, windows span
            # micro-batches). The band generator keeps every in-range
            # predecessor in an earlier-or-same batch (band spacing
            # 60s > the 30s bound + band width), so no emission can
            # miss a late frame member — the contract Flink enforces
            # by buffering to the watermark; ROWS frames depend only
            # on per-key arrival order, which the bands preserve.
            frame = (
                "RANGE BETWEEN INTERVAL '30' SECOND PRECEDING "
                if shape == "over_range"
                else "ROWS BETWEEN 2 PRECEDING "
            )
            body = (
                "SELECT k, ts, v, SUM(v) OVER w AS wsum, "
                "COUNT(*) OVER w AS wcnt, AVG(v) OVER w AS wavg "
                "FROM {T} "
                "WINDOW w AS (PARTITION BY k ORDER BY ts "
                + frame +
                "AND CURRENT ROW)"
            )
            d = _MemDrain(env, spark, body.format(T=f"{tag}_s"), tag,
                          "update", tmp,
                          restartable=restart_at is not None)
            try:
                _feed_loop(d, lambda i: _write_batch(src, i, batches[i]),
                           n_batches, restart_at, restart_before)
            finally:
                d.stop()
            cols_out = ["k", "ts", "v", "wsum", "wcnt", "wavg"]
            # update-mode changelog keyed on (k, ts): last emission wins
            final: dict[tuple, tuple] = {}
            for r in d.emissions():
                final[(r["k"], str(r["ts"]))] = tuple(
                    repr(float(r[c])) if isinstance(r[c], (int, float))
                    else str(r[c])
                    for c in cols_out
                )
            got = sorted(final.values())
            _mk_tables(env, f"{tag}_b", src, streaming=False, cols=cols,
                       wm_col="ts")
            want = _normf(
                env.execute_sql(body.format(T=f"{tag}_b")).collect(),
                cols_out,
            )
            return got, want

        if shape == "window_join":
            # TVF-windowed stream-stream join (StreamExecWindowJoin):
            # both sides TUMBLE'd, joined on key + window bounds; rows
            # pair only inside the same window. INSERT INTO parquet
            # path; flush rows close every real window, and the batch
            # side filters window_end <= the final watermark so the
            # flush window (which never emits in streaming) drops out
            # identically.
            lsrc = os.path.join(tmp, "l")
            rsrc = os.path.join(tmp, "r")
            outdir = os.path.join(tmp, "out")
            for dd in (lsrc, rsrc, outdir):
                os.makedirs(dd, exist_ok=True)
            rbatches = gen_batches(rng, n_batches, rows_per_batch)
            _mk_tables(env, f"{tag}_l", lsrc, streaming=True,
                       cols=cols, wm_col="ts")
            _mk_tables(env, f"{tag}_r", rsrc, streaming=True,
                       cols=cols, wm_col="ts")
            env.execute_sql(
                f"CREATE TABLE {tag}_sink (k BIGINT, lv BIGINT, "
                f"rv BIGINT, ws TIMESTAMP(3)) WITH ("
                f"'connector'='filesystem','path'='{outdir}',"
                f"'format'='parquet',"
                f"'checkpoint'='{os.path.join(tmp, 'ck')}')"
            )
            jq = """
                SELECT L.k AS k, L.v AS lv, R.v AS rv,
                       L.window_start AS ws
                FROM (SELECT * FROM TABLE(TUMBLE(TABLE {L},
                      DESCRIPTOR(ts), INTERVAL '1' MINUTE))) L
                JOIN (SELECT * FROM TABLE(TUMBLE(TABLE {R},
                      DESCRIPTOR(ts), INTERVAL '1' MINUTE))) R
                ON L.k = R.k AND L.window_start = R.window_start
                   AND L.window_end = R.window_end"""
            d = _InsertDrain(
                env,
                f"INSERT INTO {tag}_sink "
                + jq.format(L=f"{tag}_l", R=f"{tag}_r"),
            )

            def _wf_wj(i):
                _write_batch(lsrc, i, batches[i])
                _write_batch(rsrc, i, rbatches[i])

            try:
                _feed_loop(d, _wf_wj, n_batches, restart_at, restart_before)
                # DISTINCT flush keys per side: the stream-stream inner
                # join emits matches eagerly (it does not hold them to
                # window close), so same-key flush rows would pair and
                # emit a row the batch side's closed-window filter
                # rightly excludes
                _write_batch(lsrc, n_batches,
                             [{"k": -1, "ts": _fmt(FLUSH_TS), "v": 1}])
                _write_batch(rsrc, n_batches,
                             [{"k": -2, "ts": _fmt(FLUSH_TS), "v": 1}])
                d.process()
            finally:
                d.stop()
            cols_out = ["k", "lv", "rv", "ws"]
            got = _norm(spark.read.parquet(outdir).collect(), cols_out)
            _mk_tables(env, f"{tag}_lb", lsrc, streaming=False,
                       cols=cols, wm_col="ts")
            _mk_tables(env, f"{tag}_rb", rsrc, streaming=False,
                       cols=cols, wm_col="ts")
            want = _norm(
                env.execute_sql(
                    jq.format(L=f"{tag}_lb", R=f"{tag}_rb")
                    + f" WHERE L.window_end <= TIMESTAMP '{wm_cut}'"
                ).collect(),
                cols_out,
            )
            return got, want

        if shape == "temporal_join":
            # Streaming FOR SYSTEM_TIME AS OF (StreamExecTemporalJoin)
            # vs the BATCH as-of operator over the same accumulated
            # files — two independent implementations of one
            # semantics.  The generator alternates event-time bands:
            # dim versions of round i live in band 2i and land+commit
            # BEFORE round i's events (band 2i+1), so every event's
            # applicable versions have always arrived, and later
            # versions only ever affect later events.  The final flush
            # writes to BOTH streams: the drain bound is the combined
            # min watermark, so the DIM side's watermark must pass the
            # held events too (this shape found the quiet-key
            # never-drain bug and the max-watermark late-dim drop —
            # see the module docstring).
            ev = os.path.join(tmp, "ev")
            dm = os.path.join(tmp, "dm")
            os.makedirs(ev), os.makedirs(dm)
            _mk_tables(env, f"{tag}_e", ev, streaming=True,
                       cols="k BIGINT, ts TIMESTAMP(3), v BIGINT",
                       wm_col="ts")
            _mk_tables(env, f"{tag}_d", dm, streaming=True,
                       cols="k BIGINT, upd TIMESTAMP(3), dv BIGINT",
                       wm_col="upd")
            jq = """
                SELECT e.k AS k, e.v AS v, d.dv AS dv
                FROM {E} AS e
                LEFT JOIN {D} FOR SYSTEM_TIME AS OF e.ts AS d
                ON e.k = d.k"""
            # dim rounds: band 2i; events: band 2i+1 — alternating grid
            dim_batches = []
            ev_batches = []
            for i in range(n_batches):
                dband = BASE + timedelta(seconds=2 * i * BAND_S)
                eband = BASE + timedelta(seconds=(2 * i + 1) * BAND_S)
                offs = rng.sample(range(BAND_S - DELAY_S - 1), 10)
                dim_batches.append(
                    [{"k": rng.randint(1, 4),
                      "upd": _fmt(dband + timedelta(seconds=o)),
                      "dv": rng.randint(1, 10_000_000)}
                     for o in offs[:4]]
                )
                ev_batches.append(
                    [{"k": rng.randint(1, 4),
                      "ts": _fmt(eband + timedelta(seconds=o)),
                      "v": i * 1000 + j}
                     for j, o in enumerate(offs[4:])]
                )
            d = _MemDrain(env, spark,
                          jq.format(E=f"{tag}_e", D=f"{tag}_d"),
                          tag, "update", tmp,
                          restartable=restart_at is not None)

            def _wf_tj(i):
                # dim versions must COMMIT before the round's events
                _write_batch(dm, i, dim_batches[i])
                d.process()
                _write_batch(ev, i, ev_batches[i])

            try:
                _feed_loop(d, _wf_tj, n_batches, restart_at,
                           restart_before)
                # flush both watermarks so held events emit; k=0 rows
                # never join real keys and are dropped below
                _write_batch(dm, n_batches,
                             [{"k": 0, "upd": _fmt(FLUSH_TS), "dv": -1}])
                _write_batch(ev, n_batches,
                             [{"k": 0, "ts": _fmt(FLUSH_TS), "v": -1}])
                d.process()
            finally:
                d.stop()
            cols_out = ["k", "v", "dv"]
            # update-mode changelog keyed on the globally unique v
            final: dict[int, tuple] = {}
            for r in d.emissions():
                if r["k"] == 0:
                    continue
                final[r["v"]] = tuple(str(r[c]) for c in cols_out)
            got = sorted(final.values())
            _mk_tables(env, f"{tag}_eb", ev, streaming=False,
                       cols="k BIGINT, ts TIMESTAMP(3), v BIGINT",
                       wm_col="ts")
            # the batch as-of operator requires the versioned side to
            # declare its rowtime (WATERMARK), which _mk_tables only
            # emits for streaming tables — declare it explicitly
            env.execute_sql(
                f"CREATE TABLE {tag}_db (k BIGINT, upd TIMESTAMP(3), "
                f"dv BIGINT, WATERMARK FOR upd AS upd - INTERVAL "
                f"'{DELAY_S}' SECOND) WITH ("
                f"'connector'='filesystem','path'='{dm}',"
                f"'format'='json','scan.streaming'='false')"
            )
            want = _norm(
                [r for r in env.execute_sql(
                    jq.format(E=f"{tag}_eb", D=f"{tag}_db")
                ).collect() if r["k"] != 0],
                cols_out,
            )
            return got, want

        if shape == "cep":
            # Streaming MATCH_RECOGNIZE → the keyed-state NFA
            # (match_recognize_stream: the buffer is persisted in state,
            # so partial matches COMPLETE across micro-batch boundaries
            # and restart recovery carries the NFA buffer) vs the batch
            # NFA over the same accumulated files, same query text.
            # Fixed-length A B C with SKIP TO NEXT ROW — every position
            # whose three consecutive per-key rows satisfy the DEFINEs
            # is a match, batch and stream alike.  (src + the {tag}_s
            # streaming table come from the shared single-source setup.)
            mr = """
                SELECT k, a_v, b_v, c_v
                FROM {T} MATCH_RECOGNIZE (
                  PARTITION BY k ORDER BY ts
                  MEASURES A.v AS a_v, B.v AS b_v, C.v AS c_v
                  ONE ROW PER MATCH
                  AFTER MATCH SKIP TO NEXT ROW
                  PATTERN (A B C)
                  DEFINE A AS A.v % 2 = 0, B AS B.v % 3 <> 0,
                         C AS C.v % 2 = 1
                ) AS m"""
            # "update" because applyInPandasWithState declares update
            # mode — but completed-match emission is append-only in
            # content (each match emits exactly once), so emissions()
            # needs no last-wins fold
            d = _MemDrain(env, spark, mr.format(T=f"{tag}_s"), tag,
                          "update", tmp,
                          restartable=restart_at is not None)
            try:
                _feed_loop(d, lambda i: _write_batch(src, i, batches[i]),
                           n_batches, restart_at, restart_before)
            finally:
                d.stop()
            cols_out = ["k", "a_v", "b_v", "c_v"]
            got = _norm(d.emissions(), cols_out)
            _mk_tables(env, f"{tag}_b", src, streaming=False, cols=cols,
                       wm_col="ts")
            want = _norm(
                env.execute_sql(mr.format(T=f"{tag}_b")).collect(),
                cols_out,
            )
            return got, want

        if shape == "upsert_agg":
            # Non-windowed streaming GROUP BY materialized into a
            # PRIMARY KEY file sink (the SinkUpsertMaterializer path:
            # per-epoch keyed upsert, snapshot swap) — final sink
            # snapshot vs the batch GROUP BY, same query text.  Restart
            # mode re-executes the INSERT against the sink-derived
            # checkpoint, covering epoch-swap recovery.
            outdir = os.path.join(tmp, "out")
            env.execute_sql(
                f"CREATE TABLE {tag}_sink (gk BIGINT, cnt BIGINT, "
                f"total BIGINT, lo BIGINT, hi BIGINT, "
                f"PRIMARY KEY (gk) NOT ENFORCED) WITH ("
                f"'connector'='filesystem','path'='{outdir}',"
                f"'format'='parquet')"
            )
            body = (
                "SELECT k % 3 AS gk, count(*) AS cnt, "
                "sum(v) AS total, min(v) AS lo, max(v) AS hi "
                "FROM {T} GROUP BY k % 3"
            )
            d = _InsertDrain(
                env, f"INSERT INTO {tag}_sink " + body.format(T=f"{tag}_s")
            )
            try:
                _feed_loop(d, lambda i: _write_batch(src, i, batches[i]),
                           n_batches, restart_at, restart_before)
            finally:
                d.stop()
            cols_out = ["gk", "cnt", "total", "lo", "hi"]
            got = _norm(
                env.execute_sql(f"SELECT * FROM {tag}_sink").collect(),
                cols_out,
            )
            _mk_tables(env, f"{tag}_b", src, streaming=False, cols=cols,
                       wm_col="ts")
            want = _norm(
                env.execute_sql(body.format(T=f"{tag}_b")).collect(),
                cols_out,
            )
            return got, want

        if shape == "window_topn":
            # WINDOW Top-N (StreamExecWindowRank.java:77): rank within a
            # tumbling window — the streaming_topn composition keyed by
            # the window bucket (state per (window, key) bounded by N; a
            # closed window's leaderboard simply stops changing) vs the
            # batch ROW_NUMBER over the TUMBLE TVF.  No watermark close
            # is needed: the update-mode fold's final state per
            # (window, key, rank) equals the batch rank over ALL rows.
            from pyspark.sql import functions as F

            from flink_1_20_spark.streaming.rank import streaming_topn

            def _build_wtn():
                stream = spark.table(f"{tag}_s").withColumn(
                    "w", F.date_trunc("minute", F.col("ts"))
                )
                return streaming_topn(
                    stream, ["w", "k"], "v", n=2, ascending=True
                )

            d = _MemDrain(env, spark, _build_wtn, tag, "update", tmp,
                          restartable=restart_at is not None)
            try:
                _feed_loop(d, lambda i: _write_batch(src, i, batches[i]),
                           n_batches, restart_at, restart_before)
            finally:
                d.stop()
            final: dict[tuple, tuple] = {}
            for r in d.emissions():
                final[(str(r["w"]), r["k"], r["rn"])] = (
                    str(r["w"]), str(r["k"]), str(r["v"]), str(r["rn"])
                )
            got = sorted(final.values())
            _mk_tables(env, f"{tag}_b", src, streaming=False, cols=cols,
                       wm_col="ts")
            want = _norm(
                env.execute_sql(
                    "SELECT window_start AS w, k, v, rn FROM ("
                    "  SELECT window_start, k, v, ROW_NUMBER() OVER ("
                    "    PARTITION BY window_start, k ORDER BY v ASC"
                    "  ) AS rn FROM TABLE(TUMBLE(TABLE " + f"{tag}_b" + ", "
                    "DESCRIPTOR(ts), INTERVAL '1' MINUTE))"
                    ") WHERE rn <= 2"
                ).collect(),
                ["w", "k", "v", "rn"],
            )
            return got, want

        if shape == "session_dynamic":
            # dynamic-gap SESSION (DataStream DynamicSessionWindows /
            # SessionWindowTimeGapExtractor): per-event gap expression —
            # Spark's session_window accepts a gap COLUMN; merged end =
            # running max(ts + gap), merge inclusive at the boundary
            # (Flink TimeWindow.intersects, r11 find).  Gap 8s/20s vs
            # the 60s band spacing: sessions merge within a band and
            # occasionally across the boundary (max offset 53 → next
            # band 60 is 7s < both gaps).  Oracle = gaps-and-islands
            # with a running-max end (a plain lag is wrong once gaps
            # vary — wtvf_session_dynamic_gap precedent).
            from pyspark.sql import functions as F

            def _build_sdyn():
                # {tag}_s already carries the declared WATERMARK —
                # re-applying one here trips "Redefining watermark"
                stream = spark.table(f"{tag}_s")
                gap = F.when(
                    F.col("v") % 2 == 0, F.lit("20 seconds")
                ).otherwise(F.lit("8 seconds"))
                return (
                    stream
                    .groupBy(F.session_window("ts", gap), F.col("k"))
                    .agg(F.count("*").alias("n"), F.sum("v").alias("total"))
                    .select(
                        F.col("session_window.start").alias("ws"),
                        F.col("session_window.end").alias("we"),
                        "k", "n", "total",
                    )
                )

            d = _MemDrain(env, spark, _build_sdyn, tag, "append", tmp,
                          restartable=restart_at is not None)
            try:
                _feed_loop(d, lambda i: _write_batch(src, i, batches[i]),
                           n_batches, restart_at, restart_before)
                _write_batch(
                    src, n_batches,
                    [{"k": 1, "ts": _fmt(FLUSH_TS), "v": 1}],
                )
                d.process()
            finally:
                d.stop()
            cols_out = ["ws", "we", "k", "n", "total"]
            got = _norm(d.emissions(), cols_out)
            _mk_tables(env, f"{tag}_b", src, streaming=False, cols=cols,
                       wm_col="ts")
            want = _norm(
                env.execute_sql(
                    "WITH g AS (SELECT k, ts, v, CASE WHEN v % 2 = 0 "
                    "THEN 20 ELSE 8 END AS gap FROM " + f"{tag}_b" + "), "
                    "o AS (SELECT *, max(ts + make_interval(0,0,0,0,0,0,"
                    "gap)) OVER (PARTITION BY k ORDER BY ts ROWS BETWEEN "
                    "UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end "
                    "FROM g), "
                    "f AS (SELECT *, CASE WHEN prev_end IS NULL OR ts > "
                    "prev_end THEN 1 ELSE 0 END AS new_s FROM o), "
                    "s AS (SELECT *, sum(new_s) OVER (PARTITION BY k "
                    "ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM f) "
                    "SELECT min(ts) AS ws, max(ts + make_interval(0,0,0,"
                    "0,0,0,gap)) AS we, k, count(*) AS n, "
                    "sum(v) AS total FROM s GROUP BY k, sid "
                    f"HAVING we <= TIMESTAMP '{wm_cut}'"
                ).collect(),
                cols_out,
            )
            return got, want

        if shape == "cep_all_rows":
            # streaming MATCH_RECOGNIZE with ALL ROWS PER MATCH: one
            # output row per bound input row, CLASSIFIER() + per-key
            # MATCH_NUMBER() persisted in state across micro-batches —
            # vs the batch NFA, same text.  Fixed-length pattern under
            # TO_NEXT_ROW: matches complete in position order per key,
            # so the stream's completion-order numbering equals the
            # batch scan-order numbering.
            mr = """
                SELECT k, ts, v, cls, mno
                FROM {T} MATCH_RECOGNIZE (
                  PARTITION BY k ORDER BY ts
                  MEASURES CLASSIFIER() AS cls, MATCH_NUMBER() AS mno
                  ALL ROWS PER MATCH
                  AFTER MATCH SKIP TO NEXT ROW
                  PATTERN (A B C)
                  DEFINE A AS A.v % 2 = 0, B AS B.v % 3 <> 0,
                         C AS C.v % 2 = 1
                ) AS m"""
            d = _MemDrain(env, spark, mr.format(T=f"{tag}_s"), tag,
                          "update", tmp,
                          restartable=restart_at is not None)
            try:
                _feed_loop(d, lambda i: _write_batch(src, i, batches[i]),
                           n_batches, restart_at, restart_before)
            finally:
                d.stop()
            cols_out = ["k", "ts", "v", "cls", "mno"]
            got = _norm(d.emissions(), cols_out)
            _mk_tables(env, f"{tag}_b", src, streaming=False, cols=cols,
                       wm_col="ts")
            want = _norm(
                env.execute_sql(mr.format(T=f"{tag}_b")).collect(),
                cols_out,
            )
            return got, want

        if shape == "cep_skip_extend":
            # the SKIP_TO_LAST + variable-length decider (VERDICT r11
            # task 5): greedy B+ whose step conditions OVERLAP C's
            # (multiples of 6 satisfy both), so a match completed by
            # BACKTRACKING at a batch boundary (C bound at buffer end
            # while B+ wanted more) CAN be reshaped by later input —
            # the class where the recomputed skip-jump chain could
            # diverge from the batch single-pass chain.
            mr = """
                SELECT k, a_v, b_last, c_v
                FROM {T} MATCH_RECOGNIZE (
                  PARTITION BY k ORDER BY ts
                  MEASURES A.v AS a_v, LAST(B.v) AS b_last, C.v AS c_v
                  ONE ROW PER MATCH
                  AFTER MATCH SKIP TO LAST B
                  PATTERN (A B+ C)
                  DEFINE A AS A.v % 5 = 0, B AS B.v % 2 = 0,
                         C AS C.v % 3 = 0
                ) AS m"""
            d = _MemDrain(env, spark, mr.format(T=f"{tag}_s"), tag,
                          "update", tmp,
                          restartable=restart_at is not None)
            try:
                _feed_loop(d, lambda i: _write_batch(src, i, batches[i]),
                           n_batches, restart_at, restart_before)
                # per-key finalizers: v=7 fails A (%5), B (%2) and C
                # (%3), so a HELD greedy match at true end-of-input gets
                # its proof of non-extendability and emits — the role
                # Flink's end-of-input MAX_WATERMARK plays on a bounded
                # stream.  The batch side sees the same rows and matches
                # nothing on them.
                _write_batch(
                    src, n_batches,
                    [{"k": kk, "ts": _fmt(FLUSH_TS), "v": 7}
                     for kk in range(1, 5)],
                )
                d.process()
            finally:
                d.stop()
            cols_out = ["k", "a_v", "b_last", "c_v"]
            got = _norm(d.emissions(), cols_out)
            _mk_tables(env, f"{tag}_b", src, streaming=False, cols=cols,
                       wm_col="ts")
            want = _norm(
                env.execute_sql(mr.format(T=f"{tag}_b")).collect(),
                cols_out,
            )
            return got, want

        if shape == "proctime_lookup":
            # processing-time lookup join (TemporalProcessTimeJoinOperator
            # .java:48 / CommonExecLookupJoin): a streaming fact with a
            # PROCTIME() attribute enriches against the dim's CURRENT
            # snapshot per micro-batch (stream-static join).  The dim is
            # fixed for the whole run — the deterministic case — so the
            # batch oracle is the same text over the accumulated fact
            # files; covers the lowering (alias stripping, LEFT nulls)
            # and its restart recovery.
            dim_path = os.path.join(tmp, "dim.csv")
            with open(dim_path, "w") as f:
                f.write("k,name\n1,one\n2,two\n3,three\n")  # k=4 missing
            env.execute_sql(
                f"CREATE TABLE {tag}_d (k BIGINT, name STRING) WITH ("
                f"'connector'='filesystem','path'='{dim_path}',"
                f"'format'='csv')"
            )
            env.execute_sql(
                f"CREATE TABLE {tag}_f (k BIGINT, ts TIMESTAMP(3), "
                f"v BIGINT, pt AS PROCTIME()) WITH ("
                f"'connector'='filesystem','path'='{src}',"
                f"'format'='json','scan.streaming'='true')"
            )
            jq = """
                SELECT f.k AS k, f.v AS v, d.name AS dname
                FROM {F} f
                LEFT JOIN {D} FOR SYSTEM_TIME AS OF f.pt AS d
                ON f.k = d.k"""
            d = _MemDrain(env, spark, jq.format(F=f"{tag}_f", D=f"{tag}_d"),
                          tag, "append", tmp,
                          restartable=restart_at is not None)
            try:
                _feed_loop(d, lambda i: _write_batch(src, i, batches[i]),
                           n_batches, restart_at, restart_before)
            finally:
                d.stop()
            cols_out = ["k", "v", "dname"]
            got = _norm(d.emissions(), cols_out)
            env.execute_sql(
                f"CREATE TABLE {tag}_fb (k BIGINT, ts TIMESTAMP(3), "
                f"v BIGINT, pt AS PROCTIME()) WITH ("
                f"'connector'='filesystem','path'='{src}',"
                f"'format'='json')"
            )
            want = _norm(
                env.execute_sql(
                    jq.format(F=f"{tag}_fb", D=f"{tag}_d")
                ).collect(),
                cols_out,
            )
            return got, want

        if shape == "cdc_source":
            # CDC/changelog source (ChangelogSourceITCase): a
            # monitored-dir debezium-json table feeds a retract-aware
            # streaming GROUP BY (the changelog-agg lowering: -U/-D
            # subtract; a group whose live count hits 0 is DELETED at
            # the sink) into a PRIMARY KEY upsert sink — final table vs
            # the batch aggregate over the MATERIALIZED final image of
            # the same files.  The generator maintains a live-row model
            # and emits insert/update/delete envelopes (updates may
            # MOVE a row between groups — the retraction crosses group
            # boundaries); whole groups drain to empty with real
            # probability under the small key domain.
            outdir = os.path.join(tmp, "out")
            env.execute_sql(
                f"CREATE TABLE {tag}_c (id BIGINT, gk BIGINT, amt BIGINT)"
                f" WITH ('connector'='filesystem','path'='{src}',"
                f"'format'='debezium-json','scan.streaming'='true')"
            )
            env.execute_sql(
                f"CREATE TABLE {tag}_sink (gk BIGINT, total BIGINT, "
                f"cnt BIGINT, PRIMARY KEY (gk) NOT ENFORCED) WITH ("
                f"'connector'='filesystem','path'='{outdir}',"
                f"'format'='parquet')"
            )
            d = _InsertDrain(
                env,
                f"INSERT INTO {tag}_sink SELECT gk, sum(amt) AS total, "
                f"count(*) AS cnt FROM {tag}_c GROUP BY gk",
            )
            live: dict[int, tuple[int, int]] = {}
            next_id, seq = 1, 0

            def _wf_cdc(i):
                nonlocal next_id, seq
                ops = []
                for _ in range(rng.randint(3, 10)):
                    seq += 1
                    roll = rng.random()
                    if live and roll < 0.3:  # delete
                        rid = rng.choice(sorted(live))
                        gk, amt = live.pop(rid)
                        ops.append({"op": "d", "ts_ms": seq,
                                    "before": {"id": rid, "gk": gk,
                                               "amt": amt},
                                    "after": None})
                    elif live and roll < 0.55:  # update (may move group)
                        rid = rng.choice(sorted(live))
                        gk, amt = live[rid]
                        ngk = rng.randint(0, 3)
                        namt = rng.randint(1, 100)
                        live[rid] = (ngk, namt)
                        ops.append({"op": "u", "ts_ms": seq,
                                    "before": {"id": rid, "gk": gk,
                                               "amt": amt},
                                    "after": {"id": rid, "gk": ngk,
                                              "amt": namt}})
                    else:  # insert
                        rid = next_id
                        next_id += 1
                        gk = rng.randint(0, 3)
                        amt = rng.randint(1, 100)
                        live[rid] = (gk, amt)
                        ops.append({"op": "c", "ts_ms": seq,
                                    "before": None,
                                    "after": {"id": rid, "gk": gk,
                                              "amt": amt}})
                _write_batch(src, i, ops)

            try:
                _feed_loop(d, _wf_cdc, n_batches, restart_at,
                           restart_before)
            finally:
                d.stop()
            cols_out = ["gk", "total", "cnt"]
            got = _norm(
                env.execute_sql(f"SELECT * FROM {tag}_sink").collect(),
                cols_out,
            )
            env.execute_sql(
                f"CREATE TABLE {tag}_cb (id BIGINT, gk BIGINT, "
                f"amt BIGINT) WITH ('connector'='filesystem',"
                f"'path'='{src}','format'='debezium-json')"
            )
            want = _norm(
                env.execute_sql(
                    "SELECT gk, CAST(sum(amt) AS BIGINT) AS total, "
                    "count(*) AS cnt FROM ("
                    "  SELECT id, gk, amt FROM ("
                    "    SELECT *, ROW_NUMBER() OVER (PARTITION BY id "
                    "ORDER BY ts_ms DESC) AS rn "
                    f"    FROM {tag}_cb WHERE row_kind <> '-U'"
                    "  ) WHERE rn = 1 AND row_kind <> '-D'"
                    ") GROUP BY gk"
                ).collect(),
                cols_out,
            )
            return got, want

        if shape == "cdc_minmax":
            # Retractable MIN/MAX + AVG over a CDC changelog source:
            # the multiset-state path (Flink's
            # Min/MaxWithRetractAggFunction) — a retraction of the
            # current extreme must expose the NEXT-BEST live value,
            # which no signed decomposition can answer.  Same envelope
            # generator as cdc_source (insert/update/delete with
            # group-moving updates and full group drains); the final
            # sink table must equal MIN/MAX/AVG/COUNT over the batch
            # materialization of the same files.
            outdir = os.path.join(tmp, "out")
            env.execute_sql(
                f"CREATE TABLE {tag}_c (id BIGINT, gk BIGINT, amt BIGINT)"
                f" WITH ('connector'='filesystem','path'='{src}',"
                f"'format'='debezium-json','scan.streaming'='true')"
            )
            env.execute_sql(
                f"CREATE TABLE {tag}_sink (gk BIGINT, mn BIGINT, "
                f"mx BIGINT, av DOUBLE, cnt BIGINT, "
                f"PRIMARY KEY (gk) NOT ENFORCED) WITH ("
                f"'connector'='filesystem','path'='{outdir}',"
                f"'format'='parquet')"
            )
            d = _InsertDrain(
                env,
                f"INSERT INTO {tag}_sink SELECT gk, min(amt) AS mn, "
                f"max(amt) AS mx, avg(amt) AS av, count(*) AS cnt "
                f"FROM {tag}_c GROUP BY gk",
            )
            live: dict[int, tuple[int, int]] = {}
            next_id, seq = 1, 0

            def _wf_mm(i):
                nonlocal next_id, seq
                ops = []
                for _ in range(rng.randint(3, 10)):
                    seq += 1
                    roll = rng.random()
                    if live and roll < 0.3:  # delete
                        rid = rng.choice(sorted(live))
                        gk, amt = live.pop(rid)
                        ops.append({"op": "d", "ts_ms": seq,
                                    "before": {"id": rid, "gk": gk,
                                               "amt": amt},
                                    "after": None})
                    elif live and roll < 0.55:  # update (may move group)
                        rid = rng.choice(sorted(live))
                        gk, amt = live[rid]
                        ngk = rng.randint(0, 3)
                        # small value domain so duplicate amts are
                        # common — the count-based multiset (not a set)
                        # is what keeps min/max right when ONE of two
                        # equal extremes retracts
                        namt = rng.randint(1, 12)
                        live[rid] = (ngk, namt)
                        ops.append({"op": "u", "ts_ms": seq,
                                    "before": {"id": rid, "gk": gk,
                                               "amt": amt},
                                    "after": {"id": rid, "gk": ngk,
                                              "amt": namt}})
                    else:  # insert
                        rid = next_id
                        next_id += 1
                        gk = rng.randint(0, 3)
                        amt = rng.randint(1, 12)
                        live[rid] = (gk, amt)
                        ops.append({"op": "c", "ts_ms": seq,
                                    "before": None,
                                    "after": {"id": rid, "gk": gk,
                                              "amt": amt}})
                _write_batch(src, i, ops)

            try:
                _feed_loop(d, _wf_mm, n_batches, restart_at,
                           restart_before)
            finally:
                d.stop()
            cols_out = ["gk", "mn", "mx", "av", "cnt"]
            got = _norm(
                env.execute_sql(f"SELECT * FROM {tag}_sink").collect(),
                cols_out,
            )
            env.execute_sql(
                f"CREATE TABLE {tag}_cb (id BIGINT, gk BIGINT, "
                f"amt BIGINT) WITH ('connector'='filesystem',"
                f"'path'='{src}','format'='debezium-json')"
            )
            want = _norm(
                env.execute_sql(
                    "SELECT gk, CAST(min(amt) AS BIGINT) AS mn, "
                    "CAST(max(amt) AS BIGINT) AS mx, avg(amt) AS av, "
                    "count(*) AS cnt FROM ("
                    "  SELECT id, gk, amt FROM ("
                    "    SELECT *, ROW_NUMBER() OVER (PARTITION BY id "
                    "ORDER BY ts_ms DESC) AS rn "
                    f"    FROM {tag}_cb WHERE row_kind <> '-U'"
                    "  ) WHERE rn = 1 AND row_kind <> '-D'"
                    ") GROUP BY gk"
                ).collect(),
                cols_out,
            )
            return got, want

        if shape == "cdc_stddev":
            # Retractable STDDEV/VAR over a CDC changelog source (r13,
            # VERDICT r12 task 5): the signed (count, sum,
            # sum-of-squares) decomposition — Flink's
            # VarPop/VarSampAggFunction retract methods.  The batch
            # oracle computes the SAME closed form over the
            # materialized final image (not native stddev_samp, whose
            # M2-merge accumulation differs in final ulps): all inputs
            # are exact integers, so identical expression shape =
            # bit-identical doubles and the string compare is exact.
            outdir = os.path.join(tmp, "out")
            env.execute_sql(
                f"CREATE TABLE {tag}_c (id BIGINT, gk BIGINT, amt BIGINT)"
                f" WITH ('connector'='filesystem','path'='{src}',"
                f"'format'='debezium-json','scan.streaming'='true')"
            )
            env.execute_sql(
                f"CREATE TABLE {tag}_sink (gk BIGINT, sd DOUBLE, "
                f"vp DOUBLE, cnt BIGINT, "
                f"PRIMARY KEY (gk) NOT ENFORCED) WITH ("
                f"'connector'='filesystem','path'='{outdir}',"
                f"'format'='parquet')"
            )
            d = _InsertDrain(
                env,
                f"INSERT INTO {tag}_sink SELECT gk, "
                f"stddev_samp(amt) AS sd, var_pop(amt) AS vp, "
                f"count(*) AS cnt FROM {tag}_c GROUP BY gk",
            )
            live: dict[int, tuple[int, int]] = {}
            next_id, seq = 1, 0

            def _wf_sd(i):
                nonlocal next_id, seq
                ops = []
                for _ in range(rng.randint(3, 10)):
                    seq += 1
                    roll = rng.random()
                    if live and roll < 0.3:  # delete
                        rid = rng.choice(sorted(live))
                        gk, amt = live.pop(rid)
                        ops.append({"op": "d", "ts_ms": seq,
                                    "before": {"id": rid, "gk": gk,
                                               "amt": amt},
                                    "after": None})
                    elif live and roll < 0.55:  # update (may move group)
                        rid = rng.choice(sorted(live))
                        gk, amt = live[rid]
                        ngk = rng.randint(0, 3)
                        namt = rng.randint(1, 100)
                        live[rid] = (ngk, namt)
                        ops.append({"op": "u", "ts_ms": seq,
                                    "before": {"id": rid, "gk": gk,
                                               "amt": amt},
                                    "after": {"id": rid, "gk": ngk,
                                              "amt": namt}})
                    else:  # insert
                        rid = next_id
                        next_id += 1
                        gk = rng.randint(0, 3)
                        amt = rng.randint(1, 100)
                        live[rid] = (gk, amt)
                        ops.append({"op": "c", "ts_ms": seq,
                                    "before": None,
                                    "after": {"id": rid, "gk": gk,
                                              "amt": amt}})
                _write_batch(src, i, ops)

            try:
                _feed_loop(d, _wf_sd, n_batches, restart_at,
                           restart_before)
            finally:
                d.stop()
            cols_out = ["gk", "sd", "vp", "cnt"]
            got = _norm(
                env.execute_sql(f"SELECT * FROM {tag}_sink").collect(),
                cols_out,
            )
            env.execute_sql(
                f"CREATE TABLE {tag}_cb (id BIGINT, gk BIGINT, "
                f"amt BIGINT) WITH ('connector'='filesystem',"
                f"'path'='{src}','format'='debezium-json')"
            )
            # image = latest row per id, deletes removed; then the
            # exact mirror of the streaming lowering's closed forms
            n_ = "sum(CASE WHEN (amt) IS NOT NULL THEN 1 ELSE 0 END)"
            s_ = "sum(CAST((amt) AS DOUBLE) * 1)"
            ss_ = "sum(CAST((amt) AS DOUBLE) * (amt) * 1)"
            sd_sql = (
                f"SQRT(CASE WHEN ({n_}) >= 2 THEN "
                f"GREATEST(CAST(0 AS DOUBLE), (({ss_}) - ({s_}) * "
                f"({s_}) / ({n_})) / (({n_}) - 1)) END)"
            )
            vp_sql = (
                f"(CASE WHEN ({n_}) >= 1 THEN "
                f"GREATEST(CAST(0 AS DOUBLE), ({ss_}) / ({n_}) "
                f"- POWER(({s_}) / ({n_}), 2)) END)"
            )
            want = _norm(
                env.execute_sql(
                    f"SELECT gk, {sd_sql} AS sd, {vp_sql} AS vp, "
                    "count(*) AS cnt FROM ("
                    "  SELECT id, gk, amt FROM ("
                    "    SELECT *, ROW_NUMBER() OVER (PARTITION BY id "
                    "ORDER BY ts_ms DESC) AS rn "
                    f"    FROM {tag}_cb WHERE row_kind <> '-U'"
                    "  ) WHERE rn = 1 AND row_kind <> '-D'"
                    ") GROUP BY gk"
                ).collect(),
                cols_out,
            )
            return got, want

        if shape == "cascade":
            # CASCADING WINDOW AGGREGATION (the reference's documented
            # composition, window-agg.md 'cascading window
            # aggregation': a 1-minute TUMBLE agg view — window columns
            # ALIASED, window_time AS rowtime, exactly as the docs
            # require — feeding a 5-minute TUMBLE rollup over the
            # propagated time attribute).  The streaming side exercises
            # the metadata-propagating view rebuild (window_time(__w));
            # partial sums must compose across micro-batches before the
            # outer windows close.  (src + the {tag}_s streaming table
            # come from the shared single-source setup.)
            env.execute_sql(
                f"CREATE VIEW {tag}_v AS "
                f"SELECT window_start AS iws, window_end AS iwe, "
                f"window_time AS rowtime, k, count(*) AS n, "
                f"CAST(sum(v) AS BIGINT) AS total "
                f"FROM TABLE(TUMBLE(TABLE {tag}_s, DESCRIPTOR(ts), "
                f"INTERVAL '1' MINUTE)) "
                f"GROUP BY window_start, window_end, window_time, k"
            )
            body = (
                "SELECT window_start, window_end, k, "
                "CAST(sum(n) AS BIGINT) AS n5, "
                "CAST(sum(total) AS BIGINT) AS total5 "
                "FROM TABLE(TUMBLE(TABLE {V}, DESCRIPTOR(rowtime), "
                "INTERVAL '5' MINUTE)) "
                "GROUP BY window_start, window_end, k"
            )
            d = _MemDrain(env, spark, body.format(V=f"{tag}_v"), tag,
                          "append", tmp,
                          restartable=restart_at is not None)
            try:
                _feed_loop(d,
                           lambda i: _write_batch(src, i, batches[i]),
                           n_batches, restart_at, restart_before)
                _write_batch(
                    src, n_batches,
                    [{"k": 1, "ts": _fmt(FLUSH_TS), "v": 1}],
                )
                d.process()
            finally:
                d.stop()
            cols_out = ["window_start", "window_end", "k", "n5", "total5"]
            got = _norm(d.emissions(), cols_out)
            _mk_tables(env, f"{tag}_b", src, streaming=False, cols=cols,
                       wm_col="ts")
            env.execute_sql(
                f"CREATE VIEW {tag}_vb AS "
                f"SELECT window_start AS iws, window_end AS iwe, "
                f"window_time AS rowtime, k, count(*) AS n, "
                f"CAST(sum(v) AS BIGINT) AS total "
                f"FROM TABLE(TUMBLE(TABLE {tag}_b, DESCRIPTOR(ts), "
                f"INTERVAL '1' MINUTE)) "
                f"GROUP BY window_start, window_end, window_time, k"
            )
            # batch rowtime is end - 1ms, the streaming rebuild's is
            # end - 1us — same OUTER window assignment, and neither
            # appears in the compared output
            want = _norm(
                env.execute_sql(
                    body.format(V=f"{tag}_vb")
                    + f" HAVING window_end <= TIMESTAMP '{wm_cut}'"
                ).collect(),
                cols_out,
            )
            for v in (f"{tag}_v", f"{tag}_vb"):
                try:
                    env.execute_sql(f"DROP VIEW IF EXISTS {v}")
                except Exception:
                    pass
            return got, want

        raise ValueError(f"unknown shape: {shape}")
    finally:
        for t in (f"{tag}_s", f"{tag}_b", f"{tag}_l", f"{tag}_r",
                  f"{tag}_lb", f"{tag}_rb", f"{tag}_sink",
                  f"{tag}_e", f"{tag}_d", f"{tag}_eb", f"{tag}_db",
                  f"{tag}_f", f"{tag}_fb", f"{tag}_c", f"{tag}_cb"):
            try:
                env.execute_sql(f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--soak", type=int, default=0,
                    help="run N consecutive seeds starting at --seed")
    ap.add_argument("--shapes", nargs="*", default=list(SHAPES))
    ap.add_argument("--restart", action="store_true",
                    help="stop + restart each streaming query from its "
                         "checkpoint at a seed-chosen batch boundary "
                         "(exactly-once recovery differential)")
    args = ap.parse_args()
    from flink_1_20_spark import get_spark

    spark = get_spark("streaming-differential")
    seeds = (
        range(args.seed, args.seed + args.soak)
        if args.soak
        else [args.seed]
    )
    n_fail = 0
    for seed in seeds:
        for shape in args.shapes:
            got, want = run_shape(spark, shape, seed, restart=args.restart)
            ok = got == want
            n_fail += not ok
            print(
                f"{'PASS' if ok else 'FAIL'}  seed={seed} {shape}"
                f"{' +restart' if args.restart else ''}: "
                f"stream={len(got)} batch={len(want)} rows",
                flush=True,
            )
            if not ok:
                only_s = [r for r in got if r not in want][:5]
                only_b = [r for r in want if r not in got][:5]
                print(f"  only-stream: {only_s}\n  only-batch:  {only_b}")
    print(f"{'OK' if not n_fail else 'FAILURES: %d' % n_fail}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
