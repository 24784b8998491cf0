"""Retractable MIN/MAX (+ mixed SUM/COUNT/AVG) changelog aggregation.

Reference parity (SURVEY.md §2.4 / §2.1 CDC): Flink's
MinWithRetractAggFunction / MaxWithRetractAggFunction
(flink-table/flink-table-runtime/src/main/java/org/apache/flink/table/
runtime/functions/aggregate/MinWithRetractAggFunction.java:60) keep a
MapState<value, count> multiset per group so a retraction (-U/-D) can
expose the next-best value; AvgAggFunction's retract path keeps
(sum, count).  GroupAggFunction (StreamExecGroupAggregate) calls
accumulate/retract per changelog row and emits the group's refreshed
row, emitting DELETE when the group's live count hits zero.

Spark-first mapping: the decomposable aggregates (SUM/COUNT/AVG) stay
on the signed-aggregation SQL plan (streaming_sql._maybe_changelog_agg
— map-side partials, no Python in the path).  MIN/MAX cannot be signed
away: after a retraction the next-best value must come from somewhere,
and that somewhere is per-group multiset state.  This module holds that
multiset in `applyInPandasWithState` keyed state (engine-managed,
checkpointed — the analogue of Flink's keyed MapState), folds each
micro-batch's signed rows into it (the fold is commutative, so
within-batch order is irrelevant — exactly why Flink's retract model
uses count-signed accumulators), and emits one refreshed row per
touched group with the hidden `__retract_live` marker the upsert
materializer consumes for count-0 DELETEs.

The multiset path is per-row Python over the group's BATCH rows only
(state carries the digest, never the history); groups not touched by a
batch cost nothing.  Decomposable-only queries never enter this module.
"""

from __future__ import annotations

import datetime
import json
import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FRACTIONAL = (T.FloatType, T.DoubleType)


def _nrm(s: str) -> str:
    return re.sub(r"[`\s]", "", s).lower()


def _enc_kind(dt: T.DataType) -> str:
    """JSON encoding class for a multiset value of Spark type `dt`."""
    if isinstance(dt, _INTEGRAL + _FRACTIONAL):
        return "num"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.TimestampType):
        return "ts"
    if isinstance(dt, T.DateType):
        return "date"
    return ""


def _encode(v, kind: str):
    if kind == "ts":
        return pd.Timestamp(v).isoformat()
    if kind == "date":
        return v.isoformat() if isinstance(v, datetime.date) else str(v)
    if kind == "num" and isinstance(v, float) and v.is_integer():
        # int64 columns with nulls arrive as float64 in pandas; keep
        # whole values as JSON ints so 5 and 5.0 share one multiset slot
        return int(v)
    return v


def _decode(v, kind: str):
    if kind == "ts":
        return pd.Timestamp(v)
    if kind == "date":
        return datetime.date.fromisoformat(v)
    return v


def retractable_changelog_agg(
    spark: SparkSession,
    inner_sql: str,
    keys: list[str],
    parsed_items: list[tuple],
) -> DataFrame:
    """Build the stateful retractable aggregation over the signed
    changelog subquery `inner_sql` (which exposes `__sign` = +1/-1).

    `keys` are the GROUP BY expression strings; `parsed_items` is the
    ordered select list as ("pass", text) passthroughs or
    (kind, arg_sql, alias) aggregates with kind in
    {"sum","count_star","count","avg","min","max"}.
    """
    # passthrough select items must BE group keys (the canonical
    # ChangelogSourceITCase shape selects its group keys) — grouping by
    # anything else would change group identity
    key_nrm = [_nrm(k) for k in keys]
    pass_to_key: dict[int, int] = {}
    for i, item in enumerate(parsed_items):
        if item[0] != "pass":
            continue
        txt = item[1]
        txt_n = _nrm(re.sub(r"\s+AS\s+`?\w+`?\s*$", "", txt, flags=re.I))
        if txt_n not in key_nrm:
            raise ValueError(
                f"changelog aggregation: non-aggregate select item "
                f"{txt!r} must be one of the GROUP BY keys"
            )
        pass_to_key[i] = key_nrm.index(txt_n)

    sel = [f"{k} AS __k{i}" for i, k in enumerate(keys)]
    agg_specs: list[tuple] = []  # (kind, proj_col|None)
    for item in parsed_items:
        if item[0] == "pass":
            continue
        kind, arg, _alias = item
        if kind == "count_star":
            agg_specs.append((kind, None))
        else:
            col = f"__a{len(agg_specs)}"
            sel.append(f"({arg}) AS {col}")
            agg_specs.append((kind, col))
    sel.append("__sign")
    proj = spark.sql(f"SELECT {', '.join(sel)} FROM {inner_sql}")
    ftypes = {f.name: f.dataType for f in proj.schema.fields}

    # output schema in select-list order + the hidden retract marker
    out_fields: list[T.StructField] = []
    enc_kinds: list[str] = []  # per agg_spec, "" for non-multiset
    agg_j = 0
    for i, item in enumerate(parsed_items):
        if item[0] == "pass":
            name = re.split(r"\s+AS\s+", item[1], flags=re.I)[-1].strip(
                "` "
            )
            out_fields.append(
                T.StructField(name, ftypes[f"__k{pass_to_key[i]}"])
            )
            continue
        kind, arg, alias = item
        name = (alias or f"__agg{agg_j}").strip("`")
        col = agg_specs[agg_j][1]
        dt = ftypes[col] if col else T.LongType()
        if kind in ("count_star", "count"):
            out = T.LongType()
            enc_kinds.append("")
        elif kind in ("var_pop", "var_samp", "stddev_pop", "stddev_samp"):
            # signed (count, sum, sum-of-squares) — Flink's
            # VarPop/VarSampAggFunction retract accumulators
            if not isinstance(dt, _INTEGRAL + _FRACTIONAL):
                raise ValueError(
                    f"changelog aggregation: {kind.upper()}({arg}) over "
                    f"type {dt.simpleString()} has no retractable "
                    "accumulator here — materialize the final image "
                    "first (operators/changelog.materialize_changelog)"
                )
            out = T.DoubleType()
            enc_kinds.append("")
        elif kind in ("sum", "avg"):
            if not isinstance(dt, _INTEGRAL + _FRACTIONAL):
                raise ValueError(
                    f"changelog aggregation: {kind.upper()}({arg}) over "
                    f"type {dt.simpleString()} has no retractable "
                    "accumulator here — materialize the final image "
                    "first (operators/changelog.materialize_changelog)"
                )
            out = (
                T.DoubleType()
                if kind == "avg" or isinstance(dt, _FRACTIONAL)
                else T.LongType()
            )
            enc_kinds.append("")
        else:  # min / max — multiset-backed
            ek = _enc_kind(dt)
            if not ek:
                raise ValueError(
                    f"changelog aggregation: {kind.upper()}({arg}) over "
                    f"type {dt.simpleString()} has no retractable "
                    "multiset encoding — materialize the final image "
                    "first (operators/changelog.materialize_changelog)"
                )
            out = dt
            enc_kinds.append(ek)
        out_fields.append(T.StructField(name, out))
        agg_j += 1
    out_fields.append(T.StructField("__retract_live", T.LongType()))
    out_schema = T.StructType(out_fields)
    out_names = [f.name for f in out_fields]
    is_long_out = [isinstance(f.dataType, T.LongType) for f in out_fields]

    n_aggs = len(agg_specs)
    item_order = parsed_items  # closed over by the fold

    def fold(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {
                "live": 0,
                "a": [
                    []
                    if k in ("min", "max")
                    else [0, 0, 0]
                    if k.startswith(("var_", "stddev_"))
                    else [0, 0]
                    for k, _ in agg_specs
                ],
            }
        # multisets as dicts in memory, pair lists in JSON
        msets = [
            dict((tuple(p) for p in st["a"][j]))
            if agg_specs[j][0] in ("min", "max")
            else None
            for j in range(n_aggs)
        ]
        for pdf in pdfs:
            if pdf.empty:
                continue
            signs = pdf["__sign"].tolist()
            st["live"] += int(sum(signs))
            for j, (kind, col) in enumerate(agg_specs):
                a = st["a"][j]
                if kind == "count_star":
                    a[0] += int(sum(signs))
                    continue
                vals = pdf[col].tolist()
                if kind == "count":
                    a[0] += int(
                        sum(s for v, s in zip(vals, signs) if v is not None and v == v)
                    )
                elif kind in ("sum", "avg"):
                    for v, s in zip(vals, signs):
                        if v is None or v != v:
                            continue
                        a[0] += v * s
                        a[1] += s
                elif kind.startswith(("var_", "stddev_")):
                    for v, s in zip(vals, signs):
                        if v is None or v != v:
                            continue
                        a[0] += v * s
                        a[1] += s
                        a[2] += v * v * s
                else:  # min / max
                    d = msets[j]
                    ek = enc_kinds[j]
                    for v, s in zip(vals, signs):
                        if v is None or v != v:
                            continue
                        e = _encode(v, ek)
                        d[e] = d.get(e, 0) + s
        row = []
        i_agg = 0
        for i, item in enumerate(item_order):
            if item[0] == "pass":
                row.append(key[pass_to_key[i]])
                continue
            kind = agg_specs[i_agg][0]
            a = st["a"][i_agg]
            if kind in ("count_star", "count"):
                row.append(a[0])
            elif kind == "sum":
                row.append(None if a[1] == 0 else a[0])
            elif kind == "avg":
                row.append(None if a[1] == 0 else a[0] / a[1])
            elif kind.startswith(("var_", "stddev_")):
                s_, n_, ss_ = a
                if kind.endswith("_pop"):
                    var = (
                        None
                        if n_ < 1
                        else max(0.0, ss_ / n_ - (s_ / n_) ** 2)
                    )
                else:
                    var = (
                        None
                        if n_ < 2
                        else max(0.0, (ss_ - s_ * s_ / n_) / (n_ - 1))
                    )
                if kind.startswith("stddev_") and var is not None:
                    var = var ** 0.5
                row.append(var)
            else:
                d = msets[i_agg]
                live_vals = [
                    _decode(v, enc_kinds[i_agg])
                    for v, c in d.items()
                    if c > 0
                ]
                if not live_vals:
                    row.append(None)
                elif kind == "min":
                    row.append(min(live_vals))
                else:
                    row.append(max(live_vals))
            i_agg += 1
        row.append(st["live"])
        # prune dead multiset entries before persisting (Flink's map
        # state removes count-0 keys in retract())
        for j in range(n_aggs):
            if msets[j] is not None:
                st["a"][j] = [
                    [v, c] for v, c in msets[j].items() if c != 0
                ]
        if st["live"] == 0 and all(
            not st["a"][j]
            for j in range(n_aggs)
            if agg_specs[j][0] in ("min", "max")
        ):
            # fully retracted group: emit the __retract_live=0 delete
            # row below but CLEAR the keyed state instead of persisting
            # an all-zero digest — Flink's GroupAggFunction clears state
            # when the group count reaches zero (r12 ADVICE: a
            # high-churn CDC keyspace otherwise grows dead-group state
            # without bound for the query's lifetime).  A later insert
            # for the key re-creates fresh zero state, which is the
            # same accumulator the pruned digest represents.
            if state.exists:
                state.remove()
        else:
            state.update((json.dumps(st),))
        out = {}
        for name, v, lng in zip(out_names, row, is_long_out):
            if lng and v is not None:
                v = int(v)
            out[name] = [v]
        yield pd.DataFrame(out, columns=out_names)

    return proj.groupBy(
        *[f"__k{i}" for i in range(len(keys))]
    ).applyInPandasWithState(
        fold, out_schema, "js string", "update", GroupStateTimeout.NoTimeout
    )
