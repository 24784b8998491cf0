"""Oracle output-dtype guard (round-4 verdict item 1).

The driver's cross-engine value hash diverges when the DuckDB oracle
emits a HUGEINT (DuckDB's SUM over integers widens) or a DECIMAL whose
precision/scale differs from the Spark result's, EVEN when every value
is string-identical. Rounds 1-4 lost driver-green rows to exactly this
(sessionization_gap, cdc_retract_agg, join_range_banded + 7 latent).

This test makes the whole class impossible to reintroduce:
  1. no registered oracle may output a HUGEINT column, and
  2. every DECIMAL oracle column must match the Spark query's declared
     DecimalType precision/scale exactly.

Convention (proven green since round 1): float aggregates go through
ROUND(...) -> DOUBLE on both engines (queries/_util.money); integer
sums are CAST(... AS BIGINT) in the oracle; decimals, where exactness
demands them, are pinned to one explicit DECIMAL(p,s) on BOTH sides.
"""

from __future__ import annotations

import duckdb
import pytest

from flink_1_20_spark.catalog import TABLE_NAMES
from flink_1_20_spark.registry import get_oracles, get_queries


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


def test_decimal_oracle_columns_match_spark_schema(oracle_types, spark, sf_dir):
    """Every DECIMAL oracle column must agree with Spark's DecimalType
    exactly (analysis-only — no job is run)."""
    decimal_queries = {
        name: [(c, ty) for c, ty in cols if ty.startswith("DECIMAL")]
        for name, cols in oracle_types.items()
    }
    decimal_queries = {n: c for n, c in decimal_queries.items() if c}
    queries = get_queries()
    mismatches = []
    for name, cols in decimal_queries.items():
        schema = {f.name: f.dataType for f in queries[name](spark, sf_dir).schema}
        for col, duck_ty in cols:
            spark_ty = schema.get(col)
            # DuckDB "DECIMAL(18,2)" vs Spark "DecimalType(18,2)"
            want = "DecimalType(" + duck_ty[len("DECIMAL(") :]
            if str(spark_ty) != want:
                mismatches.append((name, col, duck_ty, str(spark_ty)))
    assert not mismatches, (
        "DECIMAL precision/scale drift between oracle and Spark (pin one "
        f"explicit DECIMAL(p,s) on both sides, or ROUND to DOUBLE): {mismatches}"
    )
