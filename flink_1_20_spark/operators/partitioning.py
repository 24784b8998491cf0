"""Repartitioning family — Flink's keyBy/shuffle/rebalance/rescale/global.

Reference parity (SURVEY.md §2.9): DataStream.java keyBy:321,
shuffle:457, rebalance:477, rescale:500, global:512, broadcast:428,
partitionCustom:364. In Spark these are physical-distribution hints the
planner usually inserts itself; explicit forms below for pipeline
authors who need to pin a distribution (e.g. pre-partitioning both
sides of a repeated join, or forcing single-file output).

Each helper documents the Exchange it produces — asserted in
tests/test_plans.py — because at 100 TB an accidental extra exchange IS
the cost model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def key_by(df: DataFrame, *cols: str | Column, n: int | None = None) -> DataFrame:
    """keyBy (DataStream.java:321): hash-distribute by key columns →
    `Exchange hashpartitioning`. Co-locates equal keys; a following
    groupBy/join on the same keys reuses the distribution (no second
    shuffle)."""
    return df.repartition(n, *cols) if n else df.repartition(*cols)


def rebalance(df: DataFrame, n: int) -> DataFrame:
    """rebalance (DataStream.java:477): round-robin redistribute to n
    even partitions → `Exchange roundrobinpartitioning`. The skew-killer
    before an expensive narrow stage."""
    return df.repartition(n)


def rescale(df: DataFrame, n: int) -> DataFrame:
    """rescale (DataStream.java:500): reduce parallelism WITHOUT a
    shuffle — `coalesce` merges co-located partitions (narrow
    dependency), Spark's analogue of Flink's local-only redistribution."""
    return df.coalesce(n)


def global_single(df: DataFrame) -> DataFrame:
    """global (DataStream.java:512): everything to one partition →
    `Exchange SinglePartition`. Only for tiny finals (a sorted report,
    a single output file) — never mid-pipeline at scale."""
    return df.coalesce(1)


def broadcast_hint(df: DataFrame) -> DataFrame:
    """broadcast (DataStream.java:428): replicate to every task — in
    Spark a join-side hint (`BroadcastExchange` under the join), not a
    standalone stream transform."""
    return F.broadcast(df)


def partition_custom(df: DataFrame, expr: Column, n: int) -> DataFrame:
    """partitionCustom (DataStream.java:364): distribute by an arbitrary
    expression — hash-partition on a computed column (e.g. a salt, a
    bucket id, `pmod(hash(col), n)`). The expression is dropped after
    distribution."""
    tagged = df.withColumn("__pc", expr)
    return tagged.repartition(n, F.col("__pc")).drop("__pc")
