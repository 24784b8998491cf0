"""DDL round-trip property test (r10): seeded random Flink schemas →
CREATE TABLE → SHOW CREATE TABLE → re-execute the emitted DDL →
DESCRIBE equality + emission fixpoint.  Flink's SHOW CREATE prints
re-executable DDL (ShowCreateUtil), so the emitted text must parse back
through this module's own CREATE TABLE path with an identical resolved
schema.

Found on first run: SHOW CREATE emitted Spark's ``STRUCT<X:INT>``
spelling for ROW columns — not valid Flink DDL and not re-executable
even here (the type parser split on the comma inside the angle
brackets).  Fixed by spark_type_to_flink (sqlenv/text.py); this test is
the regression net.
"""

from __future__ import annotations

import random

from flink_1_20_spark.sql_ddl import TableEnvironment

# the physical-type surface CREATE TABLE accepts, nested forms included
FLINK_TYPES = [
    "STRING", "INT", "BIGINT", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
    "BOOLEAN", "DATE", "TIMESTAMP(3)", "DECIMAL(10,2)", "DECIMAL(38,10)",
    "VARCHAR(40)", "CHAR(5)", "BYTES",
    "ARRAY<INT>", "ARRAY<ROW<z DECIMAL(10,2)>>",
    "MAP<STRING, DOUBLE>", "MAP<STRING, ROW<q INT>>",
    "ROW<x INT, y STRING>", "ROW<a INT, b ROW<c STRING>>",
]


def test_show_create_roundtrip_property(spark, tmp_path):
    env = TableEnvironment(spark)
    rng = random.Random(20260815)
    for case in range(12):
        ncols = rng.randint(1, 8)
        cols = [(f"c{i}", rng.choice(FLINK_TYPES)) for i in range(ncols)]
        lines = [f"`{n}` {t}" for n, t in cols]
        has_ts = [n for n, t in cols if t.startswith("TIMESTAMP")]
        if rng.random() < 0.5:
            lines.append("pt AS PROCTIME()")
        if has_ts and rng.random() < 0.5:
            ts = has_ts[0]
            lines.append(
                f"WATERMARK FOR {ts} AS {ts} - INTERVAL '5' SECOND"
            )
        if rng.random() < 0.4:
            lines.append(f"PRIMARY KEY (`{cols[0][0]}`) NOT ENFORCED")
        part = ""
        if (
            rng.random() < 0.3
            and ncols >= 2
            and cols[1][1] in ("STRING", "INT", "BIGINT")
        ):
            part = f" PARTITIONED BY (`{cols[1][0]}`)"
        fmt = rng.choice(["parquet", "json"])  # nested types: no csv
        name = f"rtp_{case}"
        ddl = (
            f"CREATE TABLE {name} (" + ", ".join(lines) + f"){part} "
            f"WITH ('connector'='filesystem',"
            f"'path'='{tmp_path}/{name}','format'='{fmt}')"
        )
        env.execute_sql(ddl)
        sct = env.execute_sql(f"SHOW CREATE TABLE {name}").collect()[0][0]
        # the emitted DDL must re-execute through the same parser
        env.execute_sql(sct.replace(f"`{name}`", f"`{name}_rt`", 1))
        d1 = [tuple(r) for r in env.execute_sql(f"DESCRIBE {name}").collect()]
        d2 = [
            tuple(r) for r in env.execute_sql(f"DESCRIBE {name}_rt").collect()
        ]
        assert d1 == d2, (case, sct)
        # ... and the second emission is a FIXPOINT (no drift on
        # repeated round-trips)
        sct2 = env.execute_sql(f"SHOW CREATE TABLE {name}_rt").collect()[0][0]
        assert sct2.replace(f"`{name}_rt`", f"`{name}`", 1) == sct, (case, sct, sct2)
