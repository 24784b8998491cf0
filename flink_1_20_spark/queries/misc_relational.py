"""Remaining relational operators: window dedup, changelog normalize,
map functions, temporal sort (SURVEY.md §2.5-2.8 stragglers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_1_20_spark.registry import register

from ._util import T


@register(
    "window_dedup",
    oracle="""
    WITH in_win AS (
        SELECT user_id, ts, value,
               time_bucket(INTERVAL '1 hour', ts) AS window_start,
               row_number() OVER (PARTITION BY time_bucket(INTERVAL '1 hour', ts), user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    )
    SELECT window_start, user_id, ts AS first_ts, round(value, 4) AS first_value
    FROM in_win WHERE rn = 1
    """,
)
def window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window deduplicate: first row per key per TVF window
    (StreamExecWindowDeduplicate.java:69 — rank-1 special case with the
    window in the partition key)."""
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy(F.window("ts", "1 hour"), "user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.window("ts", "1 hour").getField("start").alias("window_start"),
            "user_id",
            F.col("ts").alias("first_ts"),
            F.round("value", 4).alias("first_value"),
        )
    )


@register(
    "changelog_normalize",
    oracle="""
    WITH upsert AS (
        SELECT user_id, ts, round(value, 4) AS value,
               lag(round(value, 4)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_value
        FROM events WHERE event_type IN ('signup', 'purchase')
    ),
    emitted AS (
        SELECT user_id, ts, prev_value AS value, '-U' AS op
        FROM upsert WHERE prev_value IS NOT NULL
        UNION ALL
        SELECT user_id, ts, value,
               CASE WHEN prev_value IS NULL THEN '+I' ELSE '+U' END AS op
        FROM upsert
    )
    SELECT user_id, ts, value, op FROM emitted
    """,
)
def changelog_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ChangelogNormalize (StreamExecChangelogNormalize.java:77): turn an
    upsert-only stream (no retractions) into a full ±U changelog — emit
    UPDATE_BEFORE carrying the previous image ahead of each UPDATE_AFTER.
    One shuffle on the key; the lag() carries the prior image exactly
    like the operator's ValueState."""
    e = T(spark, sf_dir, "events").filter(F.col("event_type").isin("signup", "purchase"))
    w = Window.partitionBy("user_id").orderBy("ts")
    upsert = e.select(
        "user_id", "ts", F.round("value", 4).alias("value")
    ).withColumn("prev_value", F.lag("value").over(w))
    before = upsert.filter(F.col("prev_value").isNotNull()).select(
        "user_id", "ts", F.col("prev_value").alias("value"), F.lit("-U").alias("op")
    )
    after = upsert.select(
        "user_id",
        "ts",
        "value",
        F.when(F.col("prev_value").isNull(), "+I").otherwise("+U").alias("op"),
    )
    return before.unionByName(after)


@register(
    "fn_map",
    oracle="""
    WITH m AS (
        SELECT event_id,
               MAP(['type', 'uid'], [event_type, CAST(user_id AS VARCHAR)]) AS meta
        FROM events WHERE event_id <= 500
    )
    SELECT event_id,
           coalesce(array_to_string(map_keys(meta), ','), '')   AS ks,
           coalesce(array_to_string(map_values(meta), ','), '') AS vs,
           map_extract(meta, 'type')[1]            AS typ,
           CAST(cardinality(meta) AS BIGINT)       AS n_entries,
           CAST(json_extract(
               (SELECT props FROM events e2 WHERE e2.event_id = m.event_id),
               '$.k') AS INT)                      AS prop_k
    FROM m
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP constructors/accessors (BFD:147-195, map:2079) +
    STR_TO_MAP-adjacent JSON prop extraction. map_from_arrays /
    map_keys / map_values / element_at / size."""
    e = T(spark, sf_dir, "events").filter(F.col("event_id") <= 500)
    meta = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("uid")),
        F.array(F.col("event_type"), F.col("user_id").cast("string")),
    )
    return e.select(
        "event_id",
        F.array_join(F.map_keys(meta), ",").alias("ks"),
        F.array_join(F.map_values(meta), ",").alias("vs"),
        F.element_at(meta, "type").alias("typ"),
        F.size(meta).cast("long").alias("n_entries"),
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


@register(
    "temporal_sort",
    oracle="""
    SELECT event_id, ts, user_id, event_type
    FROM events
    ORDER BY ts, event_id
    LIMIT 500
    """,
)
def temporal_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal sort (StreamExecTemporalSort.java:64 — streams sort only
    by the time attribute). Batch: orderBy(ts) + limit compiles to
    TakeOrderedAndProject (no full sort materialization)."""
    e = T(spark, sf_dir, "events")
    return e.select("event_id", "ts", "user_id", "event_type").orderBy("ts", "event_id").limit(500)


@register(
    "script_transform_pipe",
    oracle="""
    SELECT CAST(n_nationkey AS INT) AS nationkey, upper(n_name) AS name_upper
    FROM nation
    """,
)
def script_transform_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Script transform (BatchExecScriptTransform.java:43 — Hive
    TRANSFORM): rows piped tab-delimited through an external process,
    one subprocess per partition. Spark's native no-serde TRANSFORM
    (BaseScriptTransformationExec) — executor-side, scales with
    partition count; the pipe never sees the whole dataset."""
    from ._util import V

    V(spark, sf_dir, "nation")
    return spark.sql(
        """
        SELECT CAST(t.k AS INT) AS nationkey, t.name_upper
        FROM (
          SELECT TRANSFORM(n_nationkey, n_name)
          USING 'tr a-z A-Z'
          AS (k STRING, name_upper STRING)
          FROM nation
        ) t
        """
    )
