"""KeyedProcessFunction v2: true per-row processing with named keyed
state primitives and REAL timers (onTimer callbacks), on Spark 4.x
``transformWithStateInPandas``.

Reference parity (SURVEY.md §2.9): KeyedProcessFunction.java:53 —
``open`` (state descriptor registration), ``processElement:71`` with a
``Context`` exposing state + a TimerService, and ``onTimer:85`` fired
by the engine when a registered timer expires. The v1 facade
(streaming/process.py keyed_process) maps timers onto
applyInPandasWithState TIMEOUTS — one timeout per key, no timestamps.
This v2 maps 1:1: named ValueState/ListState/MapState descriptors
(flink-core/.../api/common/state/ValueStateDescriptor.java etc., with
TTL ≈ StateTtlConfig), ``register_*_timer(ts)`` with MULTIPLE
concurrent timers per key, and a real on_timer(timestamp) callback.

Per-row Python is the right cost model here: this surface exists for
logic that is genuinely imperative (Flink's too — processElement is a
per-record virtual call). Everything expressible declaratively should
use the DataFrame/SQL operators instead.

Scale: state lives in the engine's state store (RocksDB-capable,
checkpointed); rows arrive Arrow-batched per key. The facade only adds
a thin per-row loop inside the executor Python worker.

ENVIRONMENT NOTE: executing transformWithStateInPandas requires the
`google.protobuf` runtime in the Python workers (the state API client
is protobuf-RPC — pyspark/sql/streaming/proto/StateMessage_pb2.py).
This container ships pyspark without the protobuf wheel and has no
network, so tests/test_process_v2.py skips at import-probe when the
runtime is absent (probed 2026-08-14, re-confirmed 2026-08-15 and 2026-08-17: google.protobuf absent, DNS resolution unavailable). On a normally-provisioned
cluster (protobuf is a standard pyspark extra) the facade runs
unchanged; the applyInPandasWithState path (streaming/process.py) is
the fully-tested fallback here.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)


class RuntimeContext:
    """Passed to ``open``: registers named state (Flink's
    ValueStateDescriptor / ListStateDescriptor / MapStateDescriptor,
    optional TTL ≈ StateTtlConfig.newBuilder(ttl))."""

    def __init__(self, handle: StatefulProcessorHandle):
        self._handle = handle

    def value_state(self, name: str, schema: str, ttl_ms: int | None = None):
        return _ValueStateView(self._handle.getValueState(name, schema, ttl_ms))

    def list_state(self, name: str, schema: str, ttl_ms: int | None = None):
        return _ListStateView(self._handle.getListState(name, schema, ttl_ms))

    def map_state(
        self,
        name: str,
        key_schema: str,
        value_schema: str,
        ttl_ms: int | None = None,
    ):
        return _MapStateView(
            self._handle.getMapState(name, key_schema, value_schema, ttl_ms)
        )


class _ValueStateView:
    """Single-value keyed state. Values are tuples matching the schema;
    single-column schemas accept/return the bare value."""

    def __init__(self, st):
        self._st = st

    def value(self):
        if not self._st.exists():
            return None
        v = self._st.get()
        return v[0] if len(v) == 1 else v

    def update(self, value) -> None:
        self._st.update(value if isinstance(value, tuple) else (value,))

    def clear(self) -> None:
        self._st.clear()


class _ListStateView:
    def __init__(self, st):
        self._st = st

    def get(self) -> list:
        if not self._st.exists():
            return []
        out = []
        for v in self._st.get():
            out.append(v[0] if len(v) == 1 else v)
        return out

    def add(self, value) -> None:
        self._st.appendValue(value if isinstance(value, tuple) else (value,))

    def update(self, values: list) -> None:
        self._st.put([v if isinstance(v, tuple) else (v,) for v in values])

    def clear(self) -> None:
        self._st.clear()


class _MapStateView:
    def __init__(self, st):
        self._st = st

    @staticmethod
    def _k(key):
        return key if isinstance(key, tuple) else (key,)

    def get(self, key):
        if not self._st.containsKey(self._k(key)):
            return None
        v = self._st.getValue(self._k(key))
        return v[0] if len(v) == 1 else v

    def put(self, key, value) -> None:
        self._st.updateValue(
            self._k(key), value if isinstance(value, tuple) else (value,)
        )

    def contains(self, key) -> bool:
        return self._st.containsKey(self._k(key))

    def remove(self, key) -> None:
        self._st.removeKey(self._k(key))

    def keys(self) -> list:
        return [k[0] if len(k) == 1 else k for k in self._st.keys()]

    def clear(self) -> None:
        self._st.clear()


class TimerService:
    """Flink TimerService: multiple concurrent timers per key; expiry
    fires ``on_timer`` with the timestamp."""

    def __init__(self, handle: StatefulProcessorHandle, timer_values: TimerValues):
        self._handle = handle
        self._tv = timer_values

    def register_timer(self, timestamp_ms: int) -> None:
        self._handle.registerTimer(int(timestamp_ms))

    def delete_timer(self, timestamp_ms: int) -> None:
        self._handle.deleteTimer(int(timestamp_ms))

    def timers(self) -> list[int]:
        return list(self._handle.listTimers())

    def current_processing_time(self) -> int:
        return self._tv.getCurrentProcessingTimeInMs()

    def current_watermark(self) -> int:
        return self._tv.getCurrentWatermarkInMs()


class Context:
    """processElement/onTimer context: current key + timer service."""

    def __init__(self, key: tuple, timer_service: TimerService):
        self.key = key if len(key) != 1 else key[0]
        self.timer_service = timer_service


class KeyedProcessFunction:
    """Subclass and override; mirrors
    org.apache.flink.streaming.api.functions.KeyedProcessFunction."""

    def open(self, ctx: RuntimeContext) -> None:  # state registration
        pass

    def process_element(self, row: Any, ctx: Context) -> Iterable[dict]:
        """Called once per input row (a pandas namedtuple). Yield output
        rows as dicts matching the declared output schema."""
        return ()

    def on_timer(self, timestamp_ms: int, ctx: Context) -> Iterable[dict]:
        """Called when a timer registered via ctx.timer_service fires."""
        return ()


class _Adapter(StatefulProcessor):
    def __init__(self, factory):
        self._factory = factory

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._fn: KeyedProcessFunction = self._factory()
        self._fn.open(RuntimeContext(handle))

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timer_values: TimerValues
    ) -> Iterator[pd.DataFrame]:
        ctx = Context(key, TimerService(self._handle, timer_values))
        out: list[dict] = []
        for pdf in rows:
            for row in pdf.itertuples(index=False):
                out.extend(self._fn.process_element(row, ctx))
        if out:
            yield pd.DataFrame(out)

    def handleExpiredTimer(
        self, key: tuple, timer_values: TimerValues, expired: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        ctx = Context(key, TimerService(self._handle, timer_values))
        out = list(self._fn.on_timer(expired.getExpiryTimeInMs(), ctx))
        if out:
            yield pd.DataFrame(out)

    def close(self) -> None:
        pass


def keyed_process_v2(
    df: DataFrame,
    keys: list[str],
    fn_factory,
    output_schema: str,
    output_mode: str = "Update",
    time_mode: str = "ProcessingTime",
    event_time_col: str = "",
) -> DataFrame:
    """Run a KeyedProcessFunction per key with engine-managed state and
    timers.

    ``fn_factory``: zero-arg callable returning a KeyedProcessFunction
    (a class object works). ``time_mode``: "ProcessingTime" |
    "EventTime" | "None" — with EventTime, pass ``event_time_col`` and
    put a watermark on the input; timers fire against the watermark
    (Flink's event-time timer contract)."""
    return df.groupBy(*keys).transformWithStateInPandas(
        _Adapter(fn_factory),
        output_schema,
        output_mode,
        time_mode,
        eventTimeColumnName=event_time_col,
    )
