"""Table catalog over the driver-generated parquet datasets.

Reference parity: Flink's CatalogManager + GenericInMemoryCatalog
(flink-table/flink-table-api-java/.../catalog/CatalogManager.java:80,
GenericInMemoryCatalog.java:52) resolve table names for the planner. Here
the Spark session catalog plays that role; this module is the thin glue
that maps the fixture dataset (TESTDATA.md / FIXTURES.md) into it.

Scans stay declarative (`spark.read.parquet`) so Catalyst gets predicate
pushdown, column pruning and partition pruning for free — the Spark
equivalent of Flink's PushFilterIntoTableSourceScanRule /
PushProjectIntoTableSourceScanRule (FlinkStreamRuleSets.scala:177,234).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, normalizing physical-format quirks.

    `events.ts` is parquet `timestamp[us]` without a timezone at every
    scale factor, which Spark reads as TIMESTAMP_NTZ — the same naive
    micros DuckDB sees, so cross-engine hashes line up and the dtype is
    left as-is. (A legacy INT64 TIMESTAMP(NANOS) encoding is also
    handled: read nanos as long and truncate to µs, DuckDB's own
    truncation, keeping the scan vectorized.) Functions that require
    TIMESTAMP (e.g. `unix_micros`) cast at the call site — exact under
    the UTC session — rather than here, so projected schemas stay
    oracle-compatible.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table as a DataFrame keyed by name."""
    return {name: read_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each fixture table as a temp view (for `spark.sql`).

    Re-registration is cheap and idempotent; callers may switch sf_dir
    between calls (views always reflect the latest registration).
    """
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
