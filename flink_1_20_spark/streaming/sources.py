"""Streaming sources.

Reference parity (SURVEY.md §2.1):
- DataGeneratorSource (flink-connector-datagen) → Spark `rate` source
- FileSource (flink-connector-files FileSource.java:105, continuous
  monitoring mode) → Spark file stream source (directory monitoring)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def rate_source(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    """Monotonic (timestamp, value) generator — Flink's datagen source."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def file_source(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "json",
    **options: str,
) -> DataFrame:
    """Continuously monitor a directory for new files (FileSource.java:105
    `forRecordStreamFormat(...).monitorContinuously(...)`). Schema must be
    explicit — streaming file sources don't infer (Flink requires declared
    schemas everywhere, SURVEY.md §1.2)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if fmt == "csv":
        # same convention as the bounded read (connectors.read_file):
        # csv carries a header line; without this the monitored stream
        # ingests every file's header as a data row where the batch
        # read of the same directory would not
        reader = reader.option("header", options.pop("header", "true"))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)
