"""Shared keyed-state record marshalling for stateful Python operators
(cep_stream, rank): project payload columns to plain-JSON records and
back, with one place that knows the rules — numpy scalars unbox,
timestamps round-trip as isoformat strings (lexicographic ==
chronological, so string comparison still orders them), NaT/None map to
None.

Columns whose values are not JSON-representable (DATE, DECIMAL, BINARY,
ARRAY, MAP) are NOT silently supported: operators validate their payload
schemas up front and raise a clear error instead of dying inside
json.dumps mid-stream.
"""

from __future__ import annotations

import pandas as pd

# Spark SQL types whose pandas values survive json.dumps + the reverse
# Arrow conversion against the declared output schema
_JSONABLE_TYPES = (
    "LongType",
    "IntegerType",
    "ShortType",
    "ByteType",
    "DoubleType",
    "FloatType",
    "StringType",
    "BooleanType",
    "TimestampType",
    "TimestampNTZType",
)


def json_default(o):
    """Serialize numpy scalars (np.int64/np.float64/np.bool_) that leak
    out of pandas rows — json.dumps raises TypeError on them otherwise."""
    import numpy as np

    if isinstance(o, np.generic):
        return o.item()
    raise TypeError(f"not JSON serializable: {type(o).__name__}")


def validate_payload_schema(schema, cols: list[str], op: str) -> None:
    """Fail fast (at operator construction) on payload columns whose
    values cannot round-trip the JSON state encoding."""
    bad = [
        (f.name, type(f.dataType).__name__)
        for f in schema.fields
        if f.name in cols and type(f.dataType).__name__ not in _JSONABLE_TYPES
    ]
    if bad:
        raise NotImplementedError(
            f"{op}: payload columns {bad} cannot round-trip the JSON "
            "keyed-state encoding (supported: numeric/string/boolean/"
            "timestamp) — project them away or encode them to a "
            "supported type before the operator"
        )


def marshal_records(
    pdf: pd.DataFrame, cols: list[str], ts_cols: list[str]
) -> list[dict]:
    """Project `cols` into state records; every column in `ts_cols`
    becomes an isoformat string (NaT → None) — column-wise, no
    per-row iterrows."""
    proj = pdf[cols].copy() if cols else pd.DataFrame(index=pdf.index)
    for c in ts_cols:
        proj[c] = proj[c].map(lambda t: None if pd.isna(t) else t.isoformat())
    return proj.to_dict("records")
