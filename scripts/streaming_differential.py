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

Usage:
    python scripts/streaming_differential.py --seed 42          # one seed, all shapes
    python scripts/streaming_differential.py --soak 20          # N fresh seeds
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


def _drain_memory(env, query: str, sink: str, mode: str, tmp: str):
    """Run the streaming SELECT into a memory sink, feeding batches is
    the caller's job via the returned handle."""
    out = env.execute_sql(query)
    assert out.isStreaming, "shape did not produce a streaming frame"
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode(mode)
        .option("checkpointLocation", os.path.join(tmp, f"ckpt_{sink}"))
        .start()
    )
    return q


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
              rows_per_batch: int = 12):
    """Run one shape for one seed; returns (streaming_rows, batch_rows)
    as normalized sorted tuple lists — equal on success."""
    from flink_1_20_spark.sql_ddl import TableEnvironment

    rng = Random(seed)
    batches = gen_batches(rng, n_batches, rows_per_batch)
    tag = f"sd_{shape}_{seed}_{abs(hash((shape, seed))) % 99999}"
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
            q = _drain_memory(
                env, jq.format(L=f"{tag}_l", R=f"{tag}_r"),
                f"{tag}_out", "append", tmp,
            )
            try:
                for i, (lb, rb) in enumerate(zip(batches, rbatches)):
                    _write_batch(
                        lsrc, i,
                        [{"k": r["k"], "lts": r["ts"], "lv": r["v"]}
                         for r in lb],
                    )
                    _write_batch(
                        rsrc, i,
                        [{"k": r["k"], "rts": r["ts"], "rv": r["v"]}
                         for r in rb],
                    )
                    q.processAllAvailable()
            finally:
                q.stop()
            got = _norm(spark.table(f"{tag}_out").collect(), ["k", "lv", "rv"])
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
            q = env.execute_sql(
                f"INSERT INTO {tag}_sink "
                f"SELECT k FROM {tag}_l {op} SELECT k FROM {tag}_r"
            )
            try:
                for i in range(n_batches):
                    for d in (lsrc, rsrc):
                        _write_batch(
                            d, i,
                            [{"k": rng.randint(0, 6)}
                             for _ in range(rng.randint(1, 10))],
                        )
                    q.processAllAvailable()
            finally:
                q.stop()
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
                q = env.execute_sql(
                    f"INSERT INTO {tag}_sink "
                    + body.format(T=f"{tag}_s")
                )
            else:
                q = _drain_memory(
                    env, body.format(T=f"{tag}_s"), f"{tag}_out",
                    "append", tmp,
                )
            try:
                for i, b in enumerate(batches):
                    _write_batch(src, i, b)
                    q.processAllAvailable()
                # flush row closes every real window
                _write_batch(
                    src, n_batches,
                    [{"k": 1, "ts": _fmt(FLUSH_TS), "v": 1}],
                )
                q.processAllAvailable()
            finally:
                q.stop()
            cols_out = ["window_start", "window_end", "k", "n", "total"]
            if shape == "tumble":
                emitted = spark.read.parquet(outdir).collect()
            else:
                emitted = spark.table(f"{tag}_out").collect()
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
            q = _drain_memory(
                env, body.format(T=f"{tag}_s"), f"{tag}_out",
                "complete", tmp,
            )
            try:
                for i, b in enumerate(batches):
                    _write_batch(src, i, b)
                    q.processAllAvailable()
            finally:
                q.stop()
            got = _norm(spark.table(f"{tag}_out").collect(), ["k", "ts", "v"])
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
            q = _drain_memory(
                env, body.format(T=f"{tag}_s"), f"{tag}_out",
                "update", tmp,
            )
            try:
                for i, b in enumerate(batches):
                    _write_batch(src, i, b)
                    q.processAllAvailable()
            finally:
                q.stop()
            # update-mode changelog keyed on (k, rn): final state is the
            # LAST emission per key — memory-sink rows arrive in batch
            # order, so last occurrence wins
            final: dict[tuple, tuple] = {}
            for r in spark.table(f"{tag}_out").collect():
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
            q = _drain_memory(
                env, body.format(T=f"{tag}_s"), f"{tag}_out",
                "complete", tmp,
            )
            try:
                for i, b in enumerate(batches):
                    _write_batch(src, i, b)
                    q.processAllAvailable()
            finally:
                q.stop()
            cols_out = ["k", "n", "total", "lo", "hi"]
            got = _norm(spark.table(f"{tag}_out").collect(), cols_out)
            _mk_tables(env, f"{tag}_b", src, streaming=False, cols=cols,
                       wm_col="ts")
            want = _norm(
                env.execute_sql(body.format(T=f"{tag}_b")).collect(),
                cols_out,
            )
            return got, want

        if shape == "over_range":
            # event-time RANGE over-agg → streaming_over_range keyed-
            # state facade (one emission per input row, update mode,
            # windows span micro-batches). The band generator keeps
            # every in-range predecessor in an earlier-or-same batch
            # (band spacing 60s > the 30s bound + band width), so no
            # emission can miss a late frame member — the contract
            # Flink enforces by buffering to the watermark.
            body = (
                "SELECT k, ts, v, SUM(v) OVER w AS wsum, "
                "COUNT(*) OVER w AS wcnt, AVG(v) OVER w AS wavg "
                "FROM {T} "
                "WINDOW w AS (PARTITION BY k ORDER BY ts "
                "RANGE BETWEEN INTERVAL '30' SECOND PRECEDING "
                "AND CURRENT ROW)"
            )
            q = _drain_memory(
                env, body.format(T=f"{tag}_s"), f"{tag}_out",
                "update", tmp,
            )
            try:
                for i, b in enumerate(batches):
                    _write_batch(src, i, b)
                    q.processAllAvailable()
            finally:
                q.stop()
            cols_out = ["k", "ts", "v", "wsum", "wcnt", "wavg"]
            # update-mode changelog keyed on (k, ts): last emission wins
            final: dict[tuple, tuple] = {}
            for r in spark.table(f"{tag}_out").collect():
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

        raise ValueError(f"unknown shape: {shape}")
    finally:
        for t in (f"{tag}_s", f"{tag}_b", f"{tag}_l", f"{tag}_r",
                  f"{tag}_lb", f"{tag}_rb", f"{tag}_sink"):
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
            got, want = run_shape(spark, shape, seed)
            ok = got == want
            n_fail += not ok
            print(
                f"{'PASS' if ok else 'FAIL'}  seed={seed} {shape}: "
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
