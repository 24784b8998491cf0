"""Repetition-based quality signals (SURVEY.md §7 M4) — the
Gopher/RefinedWeb "repetition rules": documents dominated by repeated
n-grams are boilerplate/spam and get filtered before training.

Metric: fraction of 3-gram INSTANCES whose gram occurs more than once
in the document (character-weighted variants differ only by a weight),
plus the hottest gram's count. Plan: explode grams → two keyed
aggregations (doc_id, gram) then (doc_id) — both partial-agg friendly,
no joins, scales linearly in corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_20_spark.operators.textdedup import normalized_words
from flink_1_20_spark.registry import register

from ._util import T
from .text_analysis import _WORDS_SQL

_REPETITION_ORACLE = (
    "WITH words AS (SELECT doc_id, " + _WORDS_SQL + " AS w FROM documents),\n"
    "g AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(w) - 2, 0) + 1),"
    " i -> array_to_string(w[i:i+2], ' '))) AS g FROM words),\n"
    "per AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g)\n"
    "SELECT doc_id,\n"
    "  CAST(sum(c) AS BIGINT) AS n_grams,\n"
    "  round(sum(CASE WHEN c > 1 THEN c ELSE 0 END) * 1.0 / sum(c), 6) AS dup_frac,\n"
    "  CAST(max(c) AS BIGINT) AS max_gram_count\n"
    "FROM per GROUP BY doc_id"
)


@register("text_repetition", oracle=_REPETITION_ORACLE)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-3-gram fraction per document (docs with <3 words have
    no grams and drop out on both engines). NON-distinct shingles —
    repetition is exactly what dedup's distinct shingling erases."""
    d = T(spark, sf_dir, "documents")
    base = d.select("doc_id", normalized_words(F.col("text")).alias("w"))
    grams = F.expr(
        "transform(sequence(1, greatest(size(w) - 2, 0)),"
        " i -> concat(w[i-1], ' ', w[i], ' ', w[i+1]))"
    )
    ex = base.select("doc_id", F.explode(grams).alias("g"))
    per = ex.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    return per.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.round(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)) / F.sum("c"), 6
        ).alias("dup_frac"),
        F.max("c").alias("max_gram_count"),
    )
