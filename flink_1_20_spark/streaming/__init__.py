"""Structured-Streaming surface — the engine's DataStream-equivalent layer.

Reference parity map (SURVEY.md §2.5, §2.9):
- event-time windows + watermark → `windows.py`
- deduplication (first/last row) → `dedup.py`
- stream-stream interval join    → `joins.py`
- sources (rate / file)          → `sources.py`
- sinks (memory / upsert)        → `sinks.py`

Design: every helper takes/returns plain DataFrames so batch and
streaming share one code path where Spark allows (Flink's
batch-as-bounded-stream unification, SURVEY.md §1.3).
"""

from flink_1_20_spark.streaming.cep_stream import match_recognize_stream
from flink_1_20_spark.streaming.connect import connect_streams, gated_stream, keyed_co_process
from flink_1_20_spark.streaming.dedup import deduplicate
from flink_1_20_spark.streaming.process import keyed_process, running_aggregate
from flink_1_20_spark.streaming.rank import streaming_topn
from flink_1_20_spark.streaming.joins import interval_join, window_join
from flink_1_20_spark.streaming.sinks import run_to_memory, upsert_foreach_batch
from flink_1_20_spark.streaming.sources import file_source, rate_source
from flink_1_20_spark.streaming.temporal_stream import temporal_join_stream
from flink_1_20_spark.streaming.windows import (
    cumulate_window_agg,
    hop_window_agg,
    session_window_agg,
    tumble_window_agg,
)

__all__ = [
    "connect_streams",
    "cumulate_window_agg",
    "gated_stream",
    "keyed_co_process",
    "deduplicate",
    "file_source",
    "keyed_process",
    "match_recognize_stream",
    "running_aggregate",
    "streaming_topn",
    "hop_window_agg",
    "interval_join",
    "rate_source",
    "run_to_memory",
    "session_window_agg",
    "temporal_join_stream",
    "tumble_window_agg",
    "upsert_foreach_batch",
    "window_join",
]
