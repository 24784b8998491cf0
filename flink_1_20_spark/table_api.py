"""Flink Table API surface: fluent `table.filter(...).group_by(...)
.select(...)` with Flink's method names and string expressions.

Reference parity: Table.java (flink-table/flink-table-api-java/.../api/
Table.java — select:129, filter:199, groupBy:234, join:262, orderBy:622)
and the Expression DSL. Spark's DataFrame API *is* this layer
(SURVEY.md §3.2); this wrapper lets Flink Table-API code run with its
own spelling — `group_by` before `select` (aggregates resolved in the
select, as Flink does), Flink expression strings (`a.sum AS total`,
`f0.upperCase`), `left_outer_join`, `fetch/offset`, `execute().collect()`.

Expression strings accept plain SQL (passed to Catalyst) plus the two
Flink-isms worth translating mechanically: the postfix aggregate/
function call (`price.sum`, `name.upperCase()`) and `AS` aliasing.
Anything else is already valid Spark SQL — Catalyst parses it.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# Flink postfix-call → SQL function (the common Table API vocabulary)
_POSTFIX_FNS = {
    "sum": "sum", "sum0": "sum", "min": "min", "max": "max", "avg": "avg",
    "mean": "avg", "count": "count", "upperCase": "upper",
    "lowerCase": "lower", "trim": "trim", "abs": "abs", "floor": "floor",
    "ceil": "ceil", "distinct": "distinct", "charLength": "char_length",
    "sqrt": "sqrt", "ln": "ln", "exp": "exp",
}

_POSTFIX_RE = re.compile(
    r"\b(\w+)\.(" + "|".join(_POSTFIX_FNS) + r")(\(\))?(?!\w)"
)


def _translate(expr: str) -> str:
    """Rewrite Flink postfix calls (`a.sum`, `s.upperCase()`) into SQL
    calls (`sum(a)`, `upper(s)`); leave everything else to Catalyst."""
    out = expr
    while True:
        new = _POSTFIX_RE.sub(lambda m: f"{_POSTFIX_FNS[m.group(2)]}({m.group(1)})", out)
        if new == out:
            return new
        out = new


class Table:
    """Fluent Flink-Table facade over a DataFrame (QueryOperation tree ≙
    the lazily-built DataFrame plan)."""

    def __init__(self, df: DataFrame, group_cols: list[str] | None = None):
        self._df = df
        self._group_cols = group_cols  # set between group_by() and select()

    # -- projection / filter --------------------------------------------
    def select(self, *exprs: str) -> "Table":
        cols = [_translate(e) for e in exprs]
        if self._group_cols is not None:
            # Flink resolves aggregates inside the post-groupBy select
            return Table(_grouped_select(self._df, self._group_cols, cols))
        return Table(self._df.selectExpr(*cols))

    def filter(self, predicate: str) -> "Table":
        return Table(self._df.where(_translate(predicate)), self._group_cols)

    where = filter

    def add_columns(self, *exprs: str) -> "Table":
        return Table(self._df.selectExpr("*", *[_translate(e) for e in exprs]))

    def rename_columns(self, *renames: str) -> "Table":
        df = self._df
        for r in renames:
            m = re.match(r"\s*(\w+)\s+AS\s+(\w+)\s*$", r, re.I)
            df = df.withColumnRenamed(m.group(1), m.group(2))
        return Table(df)

    def drop_columns(self, *cols: str) -> "Table":
        return Table(self._df.drop(*cols))

    # -- grouping --------------------------------------------------------
    def group_by(self, *cols: str) -> "Table":
        return Table(self._df, [_translate(c) for c in cols])

    def distinct(self) -> "Table":
        return Table(self._df.distinct())

    # -- joins / set ops -------------------------------------------------
    def join(self, other: "Table", on: str | None = None) -> "Table":
        if on is None:
            return Table(self._df.crossJoin(other._df))
        return Table(self._df.join(other._df, F_expr(_translate(on)), "inner"))

    def left_outer_join(self, other: "Table", on: str) -> "Table":
        return Table(self._df.join(other._df, F_expr(_translate(on)), "left"))

    def right_outer_join(self, other: "Table", on: str) -> "Table":
        return Table(self._df.join(other._df, F_expr(_translate(on)), "right"))

    def full_outer_join(self, other: "Table", on: str) -> "Table":
        return Table(self._df.join(other._df, F_expr(_translate(on)), "full"))

    def union_all(self, other: "Table") -> "Table":
        return Table(self._df.unionByName(other._df))

    def union(self, other: "Table") -> "Table":
        return Table(self._df.unionByName(other._df).distinct())

    def intersect(self, other: "Table") -> "Table":
        return Table(self._df.intersect(other._df))

    def minus(self, other: "Table") -> "Table":
        return Table(self._df.exceptAll(other._df).distinct())

    # -- ordering / limits ----------------------------------------------
    def order_by(self, *exprs: str) -> "Table":
        cols = []
        for e in exprs:
            m = re.match(r"\s*(.+?)\.(asc|desc)\s*$", e) or re.match(
                r"\s*(.+?)\s+(asc|desc)\s*$", e, re.I
            )
            if m:
                c = F_expr(_translate(m.group(1)))
                cols.append(c.desc() if m.group(2).lower() == "desc" else c.asc())
            else:
                cols.append(F_expr(_translate(e)))
        return Table(self._df.orderBy(*cols))

    def fetch(self, n: int) -> "Table":
        return Table(self._df.limit(n))

    def offset(self, n: int) -> "Table":
        return Table(self._df.offset(n))

    limit = fetch

    def as_(self, *new_names: str) -> "Table":
        return Table(self._df.toDF(*new_names))

    # -- execution -------------------------------------------------------
    def execute(self) -> "TableResult":
        return TableResult(self._df)

    def to_data_frame(self) -> DataFrame:
        return self._df

    @property
    def columns(self) -> list[str]:
        return self._df.columns


class TableResult:
    """executeQueryOperation's TableResult: iterable rows + print()."""

    def __init__(self, df: DataFrame):
        self._df = df

    def collect(self):
        return self._df.collect()

    def print(self) -> None:
        self._df.show(truncate=False)


def _is_group_ref(c: str, group_cols: list[str]) -> bool:
    return c in group_cols


def F_expr(e: str):
    from pyspark.sql import functions as F

    return F.expr(e)


def _grouped_select(df: DataFrame, group_cols: list[str], cols: list[str]):
    aggs = [F_expr(c) for c in cols if not _is_group_ref(c, group_cols)]
    out = df.groupBy(*[F_expr(g) for g in group_cols]).agg(*aggs)
    # Flink's select controls output order: re-project in the asked order
    names = [re.search(r"(?:AS\s+)?(\w+)\s*$", c, re.I).group(1) for c in cols]
    return out.select(*names)


def from_data_frame(df: DataFrame) -> Table:
    """StreamTableEnvironment.fromDataStream analogue."""
    return Table(df)
