"""Flink DataStream API facade (SURVEY.md §3.3).

Reference parity: StreamExecutionEnvironment / DataStream / KeyedStream
(flink-streaming-java/.../datastream/DataStream.java:140 map,
:321-512 keyBy/rebalance family, KeyedStream.java reduce/process,
WindowedStream.java aggregate). Flink executes the user topology as
written; Spark's answer is a declarative plan — so this facade maps
each fluent call onto the equivalent DataFrame (batch or streaming)
transformation and lets Catalyst own the physical topology:

    map/flat_map/filter  → selectExpr / explode / where  (codegen)
    map(python_fn)       → mapInPandas                   (Arrow batches)
    key_by               → hash repartition (operators/partitioning)
    keyed reduce         → groupBy().agg() (batch) — streaming running
                           aggregates live in streaming/process.py
    window(...)          → tumbling window agg (streaming/windows.py)
    keyed process        → applyInPandasWithState (streaming/process.py)

Works uniformly on bounded and unbounded DataFrames where the
underlying Spark op supports it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StreamExecutionEnvironment:
    """getExecutionEnvironment analogue: the session wrapper."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def from_collection(self, data: list, schema: str) -> "DataStream":
        return DataStream(self.spark.createDataFrame(data, schema))

    def from_source(self, df: DataFrame) -> "DataStream":
        """Wrap any (batch or streaming) DataFrame as a stream."""
        return DataStream(df)


class DataStream:
    def __init__(self, df: DataFrame):
        self._df = df

    # -- row-level ops (Calc / StreamMap / StreamFlatMap) ---------------
    def map(self, expr: str | Callable, schema: str | None = None) -> "DataStream":
        """String expressions stay JVM-side; a Python callable runs as
        an Arrow-batched mapInPandas (fn: pdf -> pdf, `schema` required)."""
        if callable(expr):
            if schema is None:
                raise ValueError("map(python_fn) requires an output schema")
            fn = expr
            return DataStream(self._df.mapInPandas(lambda it: (fn(p) for p in it), schema))
        return DataStream(self._df.selectExpr("*", expr))

    def select(self, *exprs: str) -> "DataStream":
        return DataStream(self._df.selectExpr(*exprs))

    def filter(self, predicate: str) -> "DataStream":
        return DataStream(self._df.where(predicate))

    def flat_map(self, expr: str, alias: str) -> "DataStream":
        """Explode an array-producing expression (one input row → N)."""
        return DataStream(
            self._df.select("*", F.explode(F.expr(expr)).alias(alias))
        )

    def union(self, *others: "DataStream") -> "DataStream":
        df = self._df
        for o in others:
            df = df.unionByName(o._df)
        return DataStream(df)

    # -- partitioning family (DataStream.java:321-512) ------------------
    def key_by(self, *cols: str) -> "KeyedStream":
        from flink_1_20_spark.operators.partitioning import key_by

        return KeyedStream(key_by(self._df, *cols), list(cols))

    def rebalance(self, n: int | None = None) -> "DataStream":
        from flink_1_20_spark.operators.partitioning import rebalance

        return DataStream(rebalance(self._df, n))

    def assign_timestamps_and_watermarks(
        self, ts_col: str, delay: str
    ) -> "DataStream":
        """BoundedOutOfOrderness watermark strategy."""
        return DataStream(self._df.withWatermark(ts_col, delay))

    # -- execution -------------------------------------------------------
    def execute_and_collect(self):
        return self._df.collect()

    def to_data_frame(self) -> DataFrame:
        return self._df


class KeyedStream(DataStream):
    def __init__(self, df: DataFrame, keys: list[str]):
        super().__init__(df)
        self._keys = keys

    def reduce(self, *agg_exprs: str) -> "DataStream":
        """Keyed aggregation (KeyedStream.reduce generalized to
        aggregate expressions — Flink's reduce is a binary fold; the
        declarative form is the same associative aggregation)."""
        return DataStream(
            self._df.groupBy(*self._keys).agg(*[F.expr(e) for e in agg_exprs])
        )

    def window(self, ts_col: str, size: str) -> "WindowedStream":
        return WindowedStream(self._df, self._keys, ts_col, size)

    def process(
        self,
        fn,
        output_schema: str,
        state_schema: str,
        timeout: str = "NoTimeout",
    ) -> "DataStream":
        """KeyedProcessFunction (keyed state + timers):
        applyInPandasWithState via streaming/process.py semantics.
        `fn(key, pdf_iter, state) -> iter[pdf]` — the raw Spark contract,
        which IS Flink's processElement+state, batched."""
        from pyspark.sql.streaming.state import GroupStateTimeout

        timeouts = {
            "NoTimeout": GroupStateTimeout.NoTimeout,
            "ProcessingTimeTimeout": GroupStateTimeout.ProcessingTimeTimeout,
            "EventTimeTimeout": GroupStateTimeout.EventTimeTimeout,
        }
        return DataStream(
            self._df.groupBy(*self._keys).applyInPandasWithState(
                fn, output_schema, state_schema, "update", timeouts[timeout]
            )
        )


class WindowedStream:
    """WindowedStream.aggregate over a tumbling event-time window."""

    def __init__(self, df: DataFrame, keys: list[str], ts_col: str, size: str):
        self._df, self._keys, self._ts, self._size = df, keys, ts_col, size

    def aggregate(self, *agg_exprs: str) -> DataStream:
        g = self._df.groupBy(
            F.window(self._ts, self._size).alias("w"), *self._keys
        ).agg(*[F.expr(e) for e in agg_exprs])
        return DataStream(
            g.select(
                F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"),
                *[c for c in g.columns if c != "w"],
            )
        )
