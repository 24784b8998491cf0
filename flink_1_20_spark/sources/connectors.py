"""File connectors: csv / json / parquet read + write.

Reference parity: FileSource.java:105 (bounded + monitored reads),
FileSink (bulk + row formats), flink-formats/{flink-csv,flink-json,
flink-parquet,flink-orc}. Streaming file reads live in
streaming/sources.py (`file_source`).

Scale notes: writes control file sizing via partition count —
`df.repartition(n)` before write sets output file count (the analogue
of FileSink's rolling policy); partitioned layouts put the partition
column in the directory, so readers prune whole directories
(PartitionFilters in the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_FORMATS = ("parquet", "csv", "json", "orc")


def read_file(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Bounded file read. csv defaults to header=true; pass an explicit
    schema for csv/json in production (inference scans the data twice —
    Flink requires declared schemas for the same reason)."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
        if schema is None:
            reader = reader.option("inferSchema", "true")
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_file(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    num_files: int | None = None,
    **options: str,
) -> None:
    """Bounded file write. `num_files` repartitions before writing (file
    sizing — FileSink rolling-policy analogue)."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    if num_files is not None:
        df = df.repartition(num_files)
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Directory-partitioned write (FileSink partitioned bucket
    assigner). Readers filtering on `partition_cols` prune whole
    directories — verify via PartitionFilters in the scan plan."""
    df.write.format(fmt).mode(mode).partitionBy(*partition_cols).save(path)
