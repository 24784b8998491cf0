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
