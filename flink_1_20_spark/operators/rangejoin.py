"""Banded range join — point-in-interval joins without an equi key.

Reference context: Flink executes a non-equi join predicate as a
nested-loop (flink-table/flink-table-runtime/.../join/
NestedLoopJoinOperator / the batch hash-join falls back when no equi
key exists), and Spark likewise plans BroadcastNestedLoopJoin — O(n·m)
compute even when the match set is tiny. The banded form restores an
equi key: quantize the value domain into fixed-width bands, explode
each interval onto every band it overlaps, and equi-join on the band
index, then refine with the exact predicate.

Correctness: a point lives in exactly ONE band, so each qualifying
(point, interval) pair meets exactly once — no dedup pass needed.

Scale: shuffle keys are band indices → both sides hash-partition; cost
is O(n + m·bands_per_interval + output). Choose `band` near the typical
interval width so intervals explode to ~2 bands. Skewed bands (a hot
value range) are split by AQE skew-join handling like any equi join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BAND = "__band"


def banded_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    band: float,
    how: str = "inner",
) -> DataFrame:
    """Join rows of `points` to rows of `intervals` where
    ``lo_col <= point_col <= hi_col`` via a band-index equi join.

    Column names must be disjoint across the two inputs (rename before
    calling). `band` is the quantization width in value units."""

    def b(c: Column) -> Column:
        return F.floor(c / F.lit(band)).cast("bigint")

    p = points.withColumn(_BAND, b(F.col(point_col)))
    i = intervals.withColumn(
        _BAND, F.explode(F.sequence(b(F.col(lo_col)), b(F.col(hi_col))))
    )
    return (
        p.join(i, _BAND, how)
        .where((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col)))
        .drop(_BAND)
    )


def banded_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    band: float,
) -> DataFrame:
    """Interval×interval overlap join (``l_lo <= r_hi AND r_lo <= l_hi``)
    as a band equi join.

    Both sides explode onto their covered bands; a qualifying pair
    shares every band the overlap region touches, so to emit exactly
    once the join keeps only the band containing the overlap's START
    (``max(l_lo, r_lo)``) — the first shared band. No distinct pass.
    Column names must be disjoint across the inputs."""

    def b(c: Column) -> Column:
        return F.floor(c / F.lit(band)).cast("bigint")

    l = left.withColumn(_BAND, F.explode(F.sequence(b(F.col(l_lo)), b(F.col(l_hi)))))
    r = right.withColumn(_BAND, F.explode(F.sequence(b(F.col(r_lo)), b(F.col(r_hi)))))
    return (
        l.join(r, _BAND)
        .where(
            (F.col(l_lo) <= F.col(r_hi))
            & (F.col(r_lo) <= F.col(l_hi))
            & (F.col(_BAND) == b(F.greatest(F.col(l_lo), F.col(r_lo))))
        )
        .drop(_BAND)
    )
