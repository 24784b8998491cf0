"""Sources & sinks — the FileSystem connector surface.

Reference parity (SURVEY.md §2.1): flink-connector-files
(FileSource.java:105, FileSink), format factories for csv/json/parquet/
orc (flink-formats/), partitioned sinks with dynamic partition commit.

Spark mapping: `spark.read/write.format(...)` — declarative, so Catalyst
keeps pushdown/pruning. Partitioned writes (`partitionBy`) give
directory-partitioned layouts whose partition columns prune at read time
(PartitionFilters — Flink's filesystem partition pruning,
PushPartitionIntoTableSourceScanRule).
"""

from flink_1_20_spark.sources.connectors import (
    read_file,
    write_file,
    write_partitioned,
)

__all__ = ["read_file", "write_file", "write_partitioned"]
