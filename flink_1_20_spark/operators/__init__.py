"""Custom operators — capabilities Spark lacks as built-ins.

Reference parity (SURVEY.md §7 M3):
- as-of / temporal join → `asof.py` (TemporalRowTimeJoinOperator.java:78)
- lookup join           → `lookup.py` (CommonExecLookupJoin.java:141)
- CEP / MATCH_RECOGNIZE → `cep.py`   (CepOperator.java:82, NFA.java:85)

Each is a DataFrame→DataFrame transform built from declarative ops where
possible so Catalyst keeps optimizing through it.
"""

from flink_1_20_spark.operators.asof import asof_join
from flink_1_20_spark.operators.cep import Pattern, match_recognize
from flink_1_20_spark.operators.lookup import lookup_join

__all__ = ["Pattern", "asof_join", "lookup_join", "match_recognize"]
