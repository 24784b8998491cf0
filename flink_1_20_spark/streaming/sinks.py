"""Streaming sinks.

Reference parity (SURVEY.md §2.1):
- collect()/TestValuesTableFactory sink → memory sink (`run_to_memory`)
- upsert sinks (upsert-kafka, JDBC upsert; RowKind +U/-D changelog,
  RowKind.java:31-52) → `upsert_foreach_batch`: keyed merge per
  micro-batch, the Structured-Streaming-idiomatic changelog consumer.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def run_to_memory(
    df: DataFrame,
    name: str,
    output_mode: str = "append",
    trigger: dict | None = None,
) -> "StreamingQuery":  # noqa: F821 — pyspark streaming query
    """Start `df` into an in-memory table `name` and return the query.
    Caller drives with `q.processAllAvailable()` then reads
    `spark.table(name)`.

    `trigger`: per-query pacing, Spark's (coarser) counterpart of
    Flink's trigger configs — e.g. {"processingTime": "5 seconds"},
    {"availableNow": True} (bounded drain then stop ≈ batch-over-stream),
    {"once": True}. Flink's EARLY-FIRE triggers
    (ContinuousEventTimeTrigger / table.exec.emit.early-fire) map to
    output_mode="update": each micro-batch re-emits the partial
    aggregate of every window it UPDATED (quiet windows emit nothing —
    no heartbeat re-emission of unchanged windows) before the watermark
    closes it (proven in
    tests/test_streaming.py::test_early_firing_update_mode); per-window
    COUNT triggers are the count-window operators
    (queries/changelog_count.py). Only delta/purging triggers remain a
    non-goal (SURVEY.md §2.5)."""
    w = df.writeStream.format("memory").queryName(name).outputMode(output_mode)
    if trigger:
        w = w.trigger(**trigger)
    return w.start()


def upsert_foreach_batch(
    df: DataFrame,
    keys: list[str],
    path: str,
    order_col: str | None = None,
    output_mode: str = "append",
    checkpoint: str | None = None,
    retract_col: str | None = None,
) -> "StreamingQuery":  # noqa: F821
    """Upsert each micro-batch into a parquet table at `path`.

    Within a batch the last row per key wins (ordered by `order_col` if
    given, else arrival order) — Flink's upsert materialization
    (SinkUpsertMaterializer.java). Merge = read current table, anti-join
    out replaced keys, append the batch. At scale, swap the parquet
    rewrite for a MERGE INTO on a table format (Delta/Iceberg) — the
    foreachBatch contract is identical.

    `output_mode="update"` materializes an UPDATING plan (non-windowed
    streaming aggregation — each epoch carries only the changed keys);
    the per-key merge makes redelivered epochs idempotent, so restart
    from `checkpoint` stays exactly-once at the table level. The
    checkpoint must live OUTSIDE `path`: the merge swaps the whole data
    directory per epoch, and a checkpoint inside it would be swapped
    away mid-stream.

    `retract_col`: name of a hidden live-count marker column (the
    changelog-agg lowering's __retract_live) — a key whose latest row
    carries 0 is DELETED from the table instead of upserted (Flink's
    GroupAggFunction emits DELETE when the count accumulator hits
    zero); the column itself never reaches the written files.
    """
    if checkpoint is not None and (
        os.path.abspath(checkpoint) == os.path.abspath(path)
        or os.path.abspath(checkpoint).startswith(
            os.path.abspath(path) + os.sep
        )
    ):
        raise ValueError(
            f"checkpoint {checkpoint!r} lies inside the upsert table "
            f"path {path!r} — the per-epoch directory swap would "
            "destroy it; use a sibling directory"
        )

    def merge(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if order_col is not None:
            from pyspark.sql import Window

            w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
            batch = (
                batch.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            batch = batch.dropDuplicates(keys)
        if retract_col is not None:
            # every batch key is replaced below (anti-join on ALL batch
            # keys); only live ones come back, so a zero-live key is a
            # delete — and the marker column never reaches the files
            live = batch.filter(F.col(retract_col) != 0).drop(retract_col)
        else:
            live = batch
        import os
        import shutil

        from flink_1_20_spark.sources.connectors import (
            has_data_files,
            recover_swap,
        )

        old = f"{path}.__old__"
        # crashed mid-swap last time (after path→old, before
        # staging→path): roll the previous table back. The directory
        # can also pre-exist holding only metadata droppings (a
        # _checkpoint from a rejected append attempt, _SUCCESS) —
        # data means non-hidden entries.
        recover_swap(path)
        if has_data_files(path):
            current = spark.read.parquet(path)
            merged = current.join(batch.select(*keys), on=keys, how="left_anti").unionByName(
                live
            )
        else:
            merged = live  # first batch — no table yet
        # Write-then-swap: can't overwrite the path being read. The write
        # is fully distributed; the swap is two metadata renames with the
        # previous table parked at `old` until the new one is in place —
        # a crash at any point leaves a recoverable table (rmtree of the
        # LIVE table never happens before its replacement is committed).
        tmp = f"{path}.__staging__"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        if os.path.exists(old):
            shutil.rmtree(old)

    writer = df.writeStream.foreachBatch(merge).outputMode(output_mode)
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def console_sink(df: DataFrame, output_mode: str = "append") -> "StreamingQuery":  # noqa: F821
    """Debug print sink (Flink's print connector)."""
    return df.writeStream.format("console").outputMode(output_mode).start()


def foreach_batch_sink(
    df: DataFrame, fn: Callable[[DataFrame, int], None]
) -> "StreamingQuery":  # noqa: F821
    """Generic per-micro-batch callback (Flink SinkFunction.invoke)."""
    return df.writeStream.foreachBatch(fn).start()


def side_output_sink(
    df: DataFrame,
    side_predicate: "F.Column",
    main_fn: Callable[[DataFrame, int], None],
    side_fn: Callable[[DataFrame, int], None],
) -> "StreamingQuery":  # noqa: F821
    """Side outputs (SingleOutputStreamOperator.getSideOutput:402 /
    ProcessFunction ctx.output): one pass over each micro-batch, rows
    matching `side_predicate` routed to `side_fn`, the rest to
    `main_fn`. The batch is persisted so the two filters don't recompute
    the upstream — the Spark-idiomatic form of Flink's tagged side
    streams (single scan, two sinks)."""

    def route(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            side_fn(batch.filter(side_predicate), batch_id)
            main_fn(batch.filter(~side_predicate), batch_id)
        finally:
            batch.unpersist()

    return df.writeStream.foreachBatch(route).start()


class LateDataSplitter:
    """sideOutputLateData (WindowedStream.sideOutputLateData:141 /
    WindowOperator.java:429 — late rows to a side output instead of
    silently dropped).

    Spark's stateful operators drop late rows internally with no hook,
    so the split happens BEFORE them: a foreachBatch gate tracks the
    watermark (max event time seen minus the allowed delay, monotonic)
    and routes rows older than it to the late sink, current rows to the
    main sink — Flink's definition of lateness, applied at micro-batch
    granularity. Feed the main sink's rows into the downstream stateful
    query (e.g. via parquet + a second stream, or direct writes).
    """

    def __init__(self, ts_col: str, allowed_delay_seconds: float):
        self.ts_col = ts_col
        self.delay = allowed_delay_seconds
        self.watermark = None  # driver-held, monotonic

    def split(self, batch: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Returns (on_time, late) for this batch, then advances the
        watermark to max(ts) - delay."""
        import datetime as _dt

        if self.watermark is None:
            on_time, late = batch, batch.limit(0)
        else:
            cond = F.col(self.ts_col) >= F.lit(self.watermark)
            on_time, late = batch.filter(cond), batch.filter(~cond)
        mx = batch.agg(F.max(self.ts_col)).first()[0]
        if mx is not None:
            new_wm = mx - _dt.timedelta(seconds=self.delay)
            if self.watermark is None or new_wm > self.watermark:
                self.watermark = new_wm
        return on_time, late

    def step(self, main_fn, late_fn):
        """foreachBatch callback routing each batch through the split."""

        def _fn(batch: DataFrame, batch_id: int) -> None:
            batch.persist()
            try:
                on_time, late = self.split(batch)
                late_fn(late, batch_id)
                main_fn(on_time, batch_id)
            finally:
                batch.unpersist()

        return _fn
