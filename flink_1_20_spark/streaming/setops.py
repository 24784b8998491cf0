"""Streaming EXCEPT / INTERSECT ALL materialization (StreamExecMinus /
StreamExecIntersect with retraction, FLIP — Flink computes both set
operations over unbounded streams by keeping per-row multiset counts on
each side and emitting a retraction changelog as multiplicities change:
flink-table-planner's rewrite of Minus/Intersect plus the retract
machinery of flink-table-runtime).

Spark has no stream-stream anti join and no retracting DataFrame, so
the result cannot be RETURNED as a streaming DataFrame — but it can be
MATERIALIZED into a table, which is what a Flink upsert/retract sink
does with the changelog anyway.  Spark-first composition, reusing the
signed-count multiset model proven in operators/changelog_join.py:

1. both (append-only) sides union into ONE stream with a __side tag —
   a single source of micro-batches, so the two sides can never race
   on the state;
2. foreachBatch folds each batch's per-row counts into a persisted
   state table (row values -> cnt_l, cnt_r): exactly the state
   StreamExecMinus keeps, stored as a versioned parquet snapshot whose
   directory name carries the epoch id — replayed epochs (crash
   between state commit and sink commit) are detected and NOT
   re-folded, which keeps the pipeline exactly-once at the table
   level;
3. the output multiplicity per distinct row is pure algebra over the
   state — EXCEPT ALL: max(cnt_l - cnt_r, 0); EXCEPT [DISTINCT]:
   1 if cnt_l > 0 and cnt_r = 0; INTERSECT ALL: min(cnt_l, cnt_r) —
   and only the keys touched by the batch are rewritten in the sink
   (read current table, null-safe anti-join out the affected keys,
   append their recomputed copies, write-then-swap like
   streaming/sinks.upsert_foreach_batch).

Retraction happens naturally: a right-side arrival that kills an
EXCEPT row makes its recomputed multiplicity 0, so the merge removes
its copies from the sink — the behavior Flink's retract sink shows.

100 TB scale: state is O(distinct rows across both inputs) — the same
bound as Flink's Minus state — partitioned by row hash; every step is
a keyed join/aggregate (no collect, no cross join).  The per-epoch
sink rewrite is the parquet-sink limitation shared with
upsert_foreach_batch; swap in a MERGE-capable table format
(Delta/Iceberg) for in-place deletes — the foreachBatch contract is
identical.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SIDE_COL = "__side"
_STATE_SUFFIX = ".__setop_state__"


def _null_safe_on(left: DataFrame, right: DataFrame, cols: list[str]) -> Column:
    cond = None
    for c in cols:
        e = left[c].eqNullSafe(right[c])
        cond = e if cond is None else cond & e
    return cond


def _multiplicity(op: str, is_all: bool) -> Column:
    l, r = F.col("cnt_l"), F.col("cnt_r")
    if op == "EXCEPT" and is_all:
        return F.greatest(l - r, F.lit(0))
    if op == "EXCEPT":
        return F.when((l > 0) & (r == 0), F.lit(1)).otherwise(F.lit(0))
    if op == "INTERSECT" and is_all:
        return F.least(l, r)
    return F.when((l > 0) & (r > 0), F.lit(1)).otherwise(F.lit(0))


def _state_dir(root: str) -> tuple[str | None, int]:
    """(current snapshot path, its epoch id); (None, -1) before epoch 0.
    Snapshots are named e<id> and committed atomically by rename, so the
    newest complete directory is always a consistent state."""
    if not os.path.isdir(root):
        return None, -1
    best = -1
    for d in os.listdir(root):
        m = re.fullmatch(r"e(\d+)", d)
        if m:
            best = max(best, int(m.group(1)))
    return (os.path.join(root, f"e{best}"), best) if best >= 0 else (None, -1)


def setop_foreach_batch(
    tagged: DataFrame,
    value_cols: list[str],
    op: str,
    is_all: bool,
    path: str,
    checkpoint: str,
    sink_types: list[str] | None = None,
    overwrite: bool = False,
):
    """Start the materializing query over the __side-tagged union
    stream; the sink table at `path` always holds the current set-op
    result (ALL variants as physical row copies).

    Sink ownership contract: the materialized view IS the query's
    content, so starting with a FRESH checkpoint (no committed offsets)
    rebuilds the sink from scratch.  Because Flink's INSERT INTO
    appends and never truncates, a fresh start against a sink that
    ALREADY holds data refuses to run unless ``overwrite`` is set
    (INSERT OVERWRITE) — a silent wipe would delete rows written by
    earlier inserts the SQL user never agreed to lose; resume from the
    retained checkpoint to keep accumulated state instead.

    ``sink_types`` (aligned with ``value_cols``) is the positional sink
    cast.  Counts fold on the PRE-cast query values — Flink evaluates
    the set op on the query's values and applies the implicit sink cast
    afterwards, so a lossy cast (DOUBLE query into an INT sink) must
    not merge rows the set op treats as distinct — and the cast applies
    to the exploded output rows at write time.  The affected-key sink
    merge keys on the POST-cast projection: every post-cast key touched
    by a batch is recomputed from the full state, so distinct pre-cast
    values that collide after the cast still rewrite consistently."""
    if op not in ("EXCEPT", "INTERSECT"):
        raise ValueError(f"unsupported set op {op!r}")
    reserved = {SIDE_COL, "cnt_l", "cnt_r", "__m", "__i"} & set(value_cols)
    if reserved:
        raise ValueError(
            f"column names {sorted(reserved)} are reserved by the "
            "set-op materializer — alias them in the query"
        )
    state_root = path + _STATE_SUFFIX
    if os.path.abspath(checkpoint).startswith(os.path.abspath(path) + os.sep) or (
        os.path.abspath(checkpoint) == os.path.abspath(path)
    ):
        raise ValueError(
            f"checkpoint {checkpoint!r} lies inside the sink path "
            f"{path!r} — the per-epoch swap would destroy it"
        )
    # A FRESH checkpoint (no committed offsets) replays every source
    # file from scratch with epoch ids restarting at 0.  Surviving
    # count state from an earlier run (its epoch ids arbitrarily high)
    # would make every replayed batch look like a duplicate and be
    # silently discarded — and folding them instead would double-count;
    # surviving SINK rows whose keys never reappear would dodge the
    # affected-key merge forever.  The stream IS the content (the same
    # rule as the materialized-table FULL→CONTINUOUS rebuild), so a
    # fresh checkpoint rebuilds BOTH: sink dirs first, the state root
    # LAST — it is the witness that cleanup is needed, so a crash
    # mid-cleanup re-runs it on the next start.  A sink that already
    # holds data (and is not a leftover of OUR crashed swap) only falls
    # to the rebuild under explicit opt-in — see the docstring.
    offsets = os.path.join(checkpoint, "offsets")
    if not (os.path.isdir(offsets) and os.listdir(offsets)):
        from flink_1_20_spark.sources.connectors import has_data_files

        # No carve-out for a surviving state root: a crash mid-cleanup
        # removed the sink dirs FIRST (has_data_files is false), and a
        # crash mid-swap implies committed offsets (this branch never
        # runs) — so sink data + fresh checkpoint always means rows the
        # user could lose, whether foreign inserts or a deliberately
        # retained materialization. Refuse either way; OVERWRITE is the
        # opt-in.
        if has_data_files(path) and not overwrite:
            raise ValueError(
                f"sink {path!r} already contains data but the set-op "
                "checkpoint is fresh — a streaming EXCEPT/INTERSECT "
                "materialization owns its sink and would rebuild it "
                "from scratch, deleting those rows. Resume from the "
                "retained checkpoint to keep accumulated state, use "
                "INSERT OVERWRITE to rebuild deliberately, or point "
                "the sink at an empty path"
            )
        for stale in (path, f"{path}.__old__", f"{path}.__staging__"):
            shutil.rmtree(stale, ignore_errors=True)
        shutil.rmtree(state_root, ignore_errors=True)

    def _sink_cast(df: DataFrame) -> DataFrame:
        """Positional sink cast (names unchanged) — applied AFTER the
        multiset algebra, mirroring Flink's implicit sink cast."""
        if not sink_types:
            return df
        return df.select(
            [df[c].cast(t).alias(c) for c, t in zip(value_cols, sink_types)]
        )

    def fold(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        from flink_1_20_spark.sources.connectors import has_data_files, recover_swap

        cur_state, cur_epoch = _state_dir(state_root)
        delta = None
        try:
            if epoch_id > cur_epoch:
                # fold this batch's per-side counts into the state;
                # persist — the delta feeds the state write AND both
                # sink joins
                delta = batch.groupBy(*value_cols).agg(
                    F.sum(F.when(F.col(SIDE_COL) == 1, 1).otherwise(0))
                    .cast("long")
                    .alias("cnt_l"),
                    F.sum(F.when(F.col(SIDE_COL) == 0, 1).otherwise(0))
                    .cast("long")
                    .alias("cnt_r"),
                ).persist()
                if cur_state is not None:
                    old = spark.read.parquet(cur_state)
                    merged = (
                        old.unionByName(delta)
                        .groupBy(*value_cols)
                        .agg(
                            F.sum("cnt_l").alias("cnt_l"),
                            F.sum("cnt_r").alias("cnt_r"),
                        )
                    )
                else:
                    merged = delta
                staging = os.path.join(state_root, f"__staging_e{epoch_id}__")
                merged.write.mode("overwrite").parquet(staging)
                os.rename(staging, os.path.join(state_root, f"e{epoch_id}"))
                if cur_state is not None:  # keep only the committed snapshot
                    shutil.rmtree(cur_state, ignore_errors=True)
                affected = delta.select(*value_cols)
                state = spark.read.parquet(
                    os.path.join(state_root, f"e{epoch_id}")
                )
            else:
                # replayed epoch (crash after state commit): the state
                # already contains it — rebuild the sink for ALL keys
                affected = None
                state = spark.read.parquet(cur_state)

            # multiset algebra on PRE-cast values; the sink cast comes
            # after, so a lossy cast cannot merge rows the set op keeps
            # distinct.  The merge keys on the POST-cast projection:
            # `out` covers the FULL state, so every post-cast key a
            # batch touches is recomputed from all pre-cast values that
            # collide into it.
            out = _sink_cast(
                state.withColumn("__m", _multiplicity(op, is_all).cast("int"))
                .filter(F.col("__m") > 0)
                .withColumn("__i", F.explode(F.sequence(F.lit(1), F.col("__m"))))
                .select(*value_cols)
            )
            recover_swap(path)
            if affected is not None and has_data_files(path):
                affected = _sink_cast(affected).distinct()
                current = spark.read.parquet(path)
                kept = current.join(
                    affected, on=_null_safe_on(current, affected, value_cols),
                    how="left_anti",
                )
                new_rows = out.join(
                    affected, on=_null_safe_on(out, affected, value_cols),
                    how="left_semi",
                )
                merged_sink = kept.unionByName(new_rows)
            else:
                merged_sink = out
            tmp, old_dir = f"{path}.__staging__", f"{path}.__old__"
            merged_sink.write.mode("overwrite").parquet(tmp)
        finally:
            # covers the STATE write too — a disk-full/schema failure
            # there must not leak the cached delta across restarts
            if delta is not None:
                delta.unpersist()
        if os.path.exists(old_dir):
            shutil.rmtree(old_dir)
        if os.path.exists(path):
            os.rename(path, old_dir)
        os.rename(tmp, path)
        if os.path.exists(old_dir):
            shutil.rmtree(old_dir, ignore_errors=True)

    os.makedirs(state_root, exist_ok=True)
    return (
        tagged.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
