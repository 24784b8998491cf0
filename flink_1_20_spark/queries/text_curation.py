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


_LM_ORACLE = r"""
WITH toks AS (SELECT doc_id,
                     list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                 t -> t <> '') AS ts
              FROM documents),
big AS (SELECT doc_id, g.i AS pos, ts[g.i] AS w1, ts[g.i + 1] AS w2
        FROM toks, LATERAL (SELECT unnest(range(1, len(ts))) AS i) g),
c2 AS (SELECT w1, w2, count(*) AS n2 FROM big GROUP BY w1, w2),
c1 AS (SELECT w1, count(*) AS n1 FROM big GROUP BY w1),
vocab AS (SELECT count(DISTINCT t) AS v
          FROM (SELECT unnest(ts) AS t FROM toks)),
scored AS (SELECT b.doc_id, b.pos,
                  ln((COALESCE(c2.n2, 0) + 1)
                     / CAST(c1.n1 + vocab.v AS DOUBLE)) AS lp
           FROM big b LEFT JOIN c2 USING (w1, w2)
                JOIN c1 USING (w1) CROSS JOIN vocab),
agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               list_reduce(list(lp ORDER BY pos), (acc, x) -> acc + x) AS s
        FROM scored GROUP BY doc_id)
SELECT doc_id, n_bigrams, round(s / n_bigrams, 6) AS lm_score FROM agg
"""


@register("text_lm_score", oracle=_LM_ORACLE)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KenLM-style corpus quality gate: every document scored by its
    mean add-one-smoothed bigram log-likelihood under counts estimated
    from the corpus itself — garbled / out-of-distribution text surfaces
    with low scores for filtering or re-weighting before training.

    The per-document sum runs left-to-right over the token-ordered
    logprob array on BOTH engines (a GROUP BY SUM would accumulate in
    scan order and diverge bit-wise), so the score is deterministic
    across engines and cluster sizes.

    Scale: two map-side-combined count aggs + one equi-join of the
    bigram stream against them + a broadcast vocabulary scalar; the
    operator's `min_count` knob prunes the count table like a real LM
    vocabulary cut at 100 TB."""
    from flink_1_20_spark.operators.lm_score import bigram_lm_scores

    d = T(spark, sf_dir, "documents")
    return bigram_lm_scores(d, "doc_id", "text")
