"""As-of (temporal) join: each left row matches the latest right row at or
before its event time, per key.

Reference parity: Flink's event-time temporal join
(TemporalRowTimeJoinOperator.java:78 — buffers right-side versions in
keyed state, emits the version valid at the left row's time) and
`FOR SYSTEM_TIME AS OF` (StreamExecTemporalJoin.java).

Spark-first design — NOT a join at all physically. A join formulation
(equi-key + range + groupBy max) explodes to O(|L|·|R|) per key before
aggregation. Instead: union both sides tagged, sort per key by time (one
shuffle, one sort — exactly Flink's keyed-state ordering), and carry the
right side's latest values forward with last(ignorenulls) over rows
unbounded preceding. Cost: one shuffle of |L|+|R| rows; no blowup; skew
behaves like any keyed window (salt keys upstream if one key dominates).

At 100 TB: this is the classic distributed merge-asof — the same plan a
range-partitioned sort-merge would give, expressed declaratively so AQE
still handles partition sizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Backward as-of join (pandas.merge_asof semantics, distributed).

    For each left row, attach the right row with the greatest
    `right_ts` <= `left_ts` (or < if not `allow_exact_matches`) within
    the same `on` key; null columns when no such row. `tolerance`
    (interval string, e.g. "30 minutes") bounds how stale the match may
    be — Flink's state-retention analogue
    (TemporalRowTimeJoinOperator.java:78 cleanup timer).

    `right_cols`: right columns to attach (default: all non-key,
    non-time). Names must not collide with left's.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_ts]
    collisions = set(right_cols) & set(left.columns)
    if collisions:
        raise ValueError(f"right_cols collide with left columns: {sorted(collisions)}")

    left_payload = [c for c in left.columns if c not in on and c != left_ts]
    # Tag sides and align schemas for the union. Right rows carry null
    # left-payload and vice versa.
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast("timestamp").alias("__rts"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in right_cols],
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_payload],
        F.col(right_ts).alias("__rts"),
        *[F.col(c) for c in right_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)

    from pyspark.sql import Window

    # Right rows sort before left at equal time iff exact matches count.
    tie = F.col("__is_left").asc() if allow_exact_matches else F.col("__is_left").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), tie)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *unioned.columns,
        F.last("__rts", ignorenulls=True).over(w).alias("__m_rts"),
        *[F.last(c, ignorenulls=True).over(w).alias(f"__m_{c}") for c in right_cols],
    )
    out = carried.filter(F.col("__is_left") == 1)
    if not allow_exact_matches:
        # tie order already excluded same-instant rights for this row, but
        # an equal-__t right from an earlier window position could have
        # been carried; mask matches at exactly __t.
        out = out.withColumn(
            "__stale_ok", F.col("__m_rts").isNull() | (F.col("__m_rts") < F.col("__t"))
        )
    else:
        out = out.withColumn("__stale_ok", F.lit(True))
    if tolerance is not None:
        out = out.withColumn(
            "__stale_ok",
            F.col("__stale_ok")
            & (F.col("__m_rts") >= F.col("__t") - F.expr(f"INTERVAL {tolerance}")),
        )
    matched = [
        F.when(F.col("__stale_ok"), F.col(f"__m_{c}")).alias(c) for c in right_cols
    ]
    matched_ts = F.when(F.col("__stale_ok"), F.col("__m_rts")).alias("__matched_ts")
    return out.select(
        *on,
        F.col("__t").alias(left_ts),
        *left_payload,
        matched_ts,
        *matched,
    ).withColumnRenamed("__matched_ts", f"{right_ts}_matched")
