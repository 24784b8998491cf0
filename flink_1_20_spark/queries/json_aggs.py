"""JSON aggregate functions — JSON_ARRAYAGG / JSON_OBJECTAGG
(BuiltInFunctionDefinitions.java:2455, 2416).

Spark composes them from collect_list + to_json; entries are sorted so
both engines emit byte-identical compact JSON (probed: Spark to_json and
DuckDB to_json/string_agg agree on format).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_20_spark.registry import register

from ._util import T


@register(
    "agg_json_arrayagg",
    oracle="""
    SELECT event_type,
           to_json(list(event_id ORDER BY event_id))::VARCHAR AS ids_json
    FROM events WHERE event_id <= 200
    GROUP BY event_type
    """,
)
def agg_json_arrayagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON_ARRAYAGG (BFD:2455): sorted for cross-engine determinism
    (Flink's is also input-order-defined; a canonical order is the
    distributed-safe contract)."""
    e = T(spark, sf_dir, "events").filter(F.col("event_id") <= 200)
    return e.groupBy("event_type").agg(
        F.to_json(F.sort_array(F.collect_list("event_id"))).alias("ids_json")
    )


@register(
    "agg_json_objectagg",
    oracle="""
    WITH counts AS (
        SELECT event_type, CAST(user_id AS VARCHAR) AS uid, count(*) AS cnt
        FROM events WHERE user_id < 20
        GROUP BY event_type, user_id
    )
    SELECT event_type,
           '{' || string_agg('"' || uid || '":' || cnt, ',' ORDER BY uid) || '}'
               AS per_user_json
    FROM counts GROUP BY event_type
    """,
)
def agg_json_objectagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON_OBJECTAGG (BFD:2416): key-sorted map serialized to compact
    JSON — map_from_entries(sorted entries) then to_json."""
    e = T(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    counts = e.groupBy("event_type", F.col("user_id").cast("string").alias("uid")).agg(
        F.count("*").alias("cnt")
    )
    return counts.groupBy("event_type").agg(
        F.to_json(
            F.map_from_entries(F.sort_array(F.collect_list(F.struct("uid", "cnt"))))
        ).alias("per_user_json")
    )
