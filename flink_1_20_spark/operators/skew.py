"""Skew mitigation: salted two-phase aggregation and skew-aware joins.

Reference parity: Flink splits skewed COUNT(DISTINCT) via
TABLE_OPTIMIZER_DISTINCT_AGG_SPLIT_ENABLED (OptimizerConfigOptions.java:64)
— a salt-bucket rewrite; its adaptive batch scheduler handles skewed
joins. Spark's AQE (skewJoin.enabled) covers the join side at runtime;
explicit salting remains the tool for *aggregation* hot keys and for
deterministic plans.

At 100 TB a single hot key (null user_id, empty string, bot traffic) can
pin one reducer for hours — the salt spreads one group across
`num_salts` reducers, then a cheap second agg over num_salts rows/key
merges the partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial_expr, merge_fn) per supported aggregate — the decomposition
# Flink's Local/GlobalGroupAggregate applies (SURVEY.md §2.4).
_MERGES = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    num_salts: int = 32,
) -> DataFrame:
    """Two-phase aggregation with an explicit salt.

    `aggs`: output_name -> (fn, col) with fn in {sum, count, min, max}
    (the decomposable aggregates; avg = sum/count at the call site).
    Phase 1 groups by (keys..., salt) — hot keys fan out over num_salts
    reducers; phase 2 merges the ≤ num_salts partial rows per key."""
    for name, (fn, _c) in aggs.items():
        if fn not in _MERGES:
            raise ValueError(f"{name}: {fn!r} is not decomposable (use sum/count/min/max)")
    salted = df.withColumn("__salt", (F.rand(seed=7) * num_salts).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            (F.count(c) if fn == "count" else getattr(F, fn)(c)).alias(f"__p_{name}")
            for name, (fn, c) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGES[fn](f"__p_{name}").alias(name)
            for name, (fn, _c) in aggs.items()
        ]
    )


def salted_count_distinct(
    df: DataFrame, keys: list[str], distinct_col: str, num_salts: int = 32
) -> DataFrame:
    """Skew-split COUNT(DISTINCT) — the exact rewrite of Flink's
    distinct-agg split (OptimizerConfigOptions.java:64): bucket the
    distinct values by hash, count distinct per bucket, sum buckets.
    Output: keys..., n_distinct."""
    bucket = F.pmod(F.hash(F.col(distinct_col)), F.lit(num_salts))
    partial = (
        df.withColumn("__bkt", bucket)
        .groupBy(*keys, "__bkt")
        .agg(F.count_distinct(F.col(distinct_col)).alias("__pd"))
    )
    return partial.groupBy(*keys).agg(F.sum("__pd").alias("n_distinct"))


def salted_skew_join(
    skewed: DataFrame,
    other: DataFrame,
    skewed_key: str,
    other_key: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Deterministic skew-join: salt the SKEWED side, replicate the
    other side once per salt, equi-join on (key, salt).

    AQE's skew-join split (spark.sql.adaptive.skewJoin.enabled) handles
    this at runtime by splitting oversized partitions — prefer it when
    available. The explicit salt remains the tool when (a) the plan must
    be deterministic across runs (benchmarked pipelines), (b) the engine
    runs with AQE off, or (c) a single key is SO hot that even a split
    partition's build side overflows (the salt also spreads the build
    rows). Replication cost: other × num_salts rows through the shuffle,
    so keep the replicated side the SMALLER one.

    Output columns: both sides' columns (salt dropped). Supported how:
    inner / left (left = the skewed side preserved).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_skew_join supports how='inner'|'left'")
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(num_salts))
    s = skewed.withColumn("__salt", salt)
    r = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    cond = (s[skewed_key] == r[other_key]) & (s["__salt"] == r["__salt"])
    out = s.join(r, cond, how)
    return out.drop(s["__salt"]).drop(r["__salt"])
