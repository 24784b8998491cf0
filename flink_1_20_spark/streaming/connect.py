"""Connected streams / CoProcess: two inputs, one keyed stateful operator.

Reference parity (SURVEY.md §2.9): DataStream.connect:255,277 +
KeyedCoProcessFunction (processElement1/processElement2 sharing one keyed
state scope), and broadcast state for the control-stream pattern.

Spark mapping: Spark stateful operators are single-input, so the two
streams are tagged and unioned into ONE stream feeding ONE
applyInPandasWithState operator — per key, both inputs land in the same
state scope, exactly the invariant KeyedCoProcessFunction relies on. The
tag column tells the user function which input each row came from (in
place of the two processElement callbacks).

Scale: the union introduces no extra shuffle — both inputs hash-shuffle
on the key once, straight into the stateful exchange, same as Flink's
two-input keyed operator wiring.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TAG_COL = "__input"


def connect_streams(first: DataFrame, second: DataFrame) -> DataFrame:
    """Tag and union two (streaming or batch) DataFrames into one.

    Rows from `first` get __input=1, `second` __input=2; columns are
    aligned by name with nulls for the side that lacks them
    (DataStream.connect:255 — ConnectedStreams keeps both types, here
    flattened into one nullable schema)."""
    left = first.withColumn(TAG_COL, F.lit(1))
    right = second.withColumn(TAG_COL, F.lit(2))
    return left.unionByName(right, allowMissingColumns=True)


def keyed_co_process(
    first: DataFrame,
    second: DataFrame,
    keys: list[str],
    fn: Callable[[tuple, Iterator[pd.DataFrame], GroupState], Iterator[pd.DataFrame]],
    output_schema: str,
    state_schema: str,
    output_mode: str = "update",
) -> DataFrame:
    """KeyedCoProcessFunction: `fn(key, batches, state)` sees both
    inputs' rows (distinguished by the __input tag column) in one keyed
    state scope."""
    return (
        connect_streams(first, second)
        .groupBy(*keys)
        .applyInPandasWithState(
            fn, output_schema, state_schema, output_mode, GroupStateTimeout.NoTimeout
        )
    )


def gated_stream(
    data: DataFrame,
    control: DataFrame,
    keys: list[str],
    ts: str,
    value_col: str,
    enabled_col: str = "enabled",
    output_schema: str | None = None,
) -> DataFrame:
    """Canned CoProcess: a control stream toggles a per-key gate; data
    rows pass only while the latest control row said enabled (the
    canonical connect/broadcast-state example — control persists in
    state across micro-batches). Rows are applied in event-time order
    within each batch; the gate starts closed."""
    key_cols = list(keys)
    out_schema = output_schema or (
        ", ".join(f"{k} bigint" for k in key_cols) + f", {ts} timestamp, {value_col} double"
    )

    def fn(key: tuple, batches: Iterator[pd.DataFrame], state: GroupState):
        enabled = bool(state.get[0]) if state.exists else False
        rows = []
        for pdf in batches:
            rows.extend(pdf.to_dict("records"))
        rows.sort(key=lambda r: r[ts])
        out = []
        for r in rows:
            if r[TAG_COL] == 2:  # control row
                enabled = bool(r[enabled_col])
            elif enabled:
                rec = dict(zip(key_cols, key))
                rec[ts] = r[ts]
                rec[value_col] = r[value_col]
                out.append(rec)
        state.update((enabled,))
        if out:
            yield pd.DataFrame(out)

    return keyed_co_process(
        data, control, key_cols, fn, out_schema, "enabled boolean", "update"
    )


class BroadcastControlGate:
    """Broadcast state (BroadcastConnectedStream / BroadcastProcessFunction):
    a LOW-volume control stream whose latest state applies to EVERY key
    of the data stream — unlike `gated_stream`, where control is keyed.

    Spark mapping: keyed state can't see other keys, so the control
    state lives on the driver and is re-broadcast per micro-batch via
    foreachBatch — faithful to Flink's model, where broadcast state is
    replicated to every task and must stay small. `process_batch`
    applies the newest control (a plain dict) to the batch's data rows.

    Streaming wiring: tag+union the two streams (connect_streams), then
    `stream.writeStream.foreachBatch(gate.step(sink_fn))`.
    """

    def __init__(self, control_cols: list[str]):
        self.control_cols = list(control_cols)
        self.state: dict = {}

    def process_batch(self, batch: DataFrame) -> DataFrame:
        """Fold this batch's control rows (tag 2) into the broadcast
        state, then return the data rows (tag 1) filtered by it.
        Control payload: {enabled: bool[, min_value: double]}."""
        ctrl = batch.filter(F.col(TAG_COL) == 2).select(*self.control_cols).collect()
        for r in ctrl:  # tiny by contract — broadcast state must be small
            self.state.update({k: v for k, v in r.asDict().items() if v is not None})
        data = batch.filter(F.col(TAG_COL) == 1)
        if not self.state.get("enabled", False):
            return data.limit(0)
        if "min_value" in self.state:
            data = data.filter(F.col("value") >= F.lit(self.state["min_value"]))
        return data

    def step(self, sink_fn):
        """foreachBatch callback: route each micro-batch through the
        gate into `sink_fn(filtered_df, batch_id)`."""

        def _fn(batch: DataFrame, batch_id: int) -> None:
            sink_fn(self.process_batch(batch), batch_id)

        return _fn
