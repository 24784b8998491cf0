"""Corpus-level bigram language-model quality scoring.

Beyond-reference surface (training-data pipeline): the KenLM-style
quality gate — score every document by its average bigram
log-likelihood under counts estimated from the corpus itself, so
out-of-distribution / garbled documents surface with low scores and can
be filtered or re-weighted before training.

Model: add-one-smoothed conditional bigram probability
    p(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)
where c(w1 w2) is the corpus bigram count, c(w1 ·) the count of bigrams
starting with w1, and V the corpus vocabulary size. A document's score
is the mean of ln p over its bigrams IN TOKEN ORDER — the per-document
sum runs left-to-right over an ordered array, so the floating-point
result is identical on any engine and any cluster size (a GROUP BY SUM
would sum in scan order and diverge bit-wise between engines).

Scale: two count aggregations (map-side combined) + one equi-join of
the bigram stream against the count tables + V broadcast as a scalar.
`min_count` prunes the count table like a real LM's vocabulary cut:
rare bigrams below the cut fall back to count 0 (still smoothed), which
bounds the join's build side on a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bigram_lm_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 1,
    round_to: int = 6,
) -> DataFrame:
    """Score each document by mean bigram log-likelihood.

    Output: (id, n_bigrams, lm_score) — documents with fewer than two
    tokens carry no bigram evidence and are omitted. Lower scores mean
    less corpus-typical text.
    """
    # tokenize + bigram explode are CPU-bound per row — compact-input
    # guard (r10; metadata-only, no-op on real multi-file corpora)
    from flink_1_20_spark.operators.util import ensure_scan_parallelism

    docs = ensure_scan_parallelism(docs)
    toks = F.expr(
        f"filter(split(trim(lower({text_col})), '\\\\s+'), t -> t <> '')"
    )
    base = docs.select(F.col(id_col).alias("doc"), toks.alias("ts"))
    big = base.select(
        "doc",
        F.explode(F.expr("sequence(1, greatest(size(ts) - 1, 1))")).alias("pos"),
        "ts",
    ).filter(F.col("pos") <= F.size("ts") - 1).select(
        "doc",
        "pos",
        F.expr("element_at(ts, pos)").alias("w1"),
        F.expr("element_at(ts, CAST(pos + 1 AS INT))").alias("w2"),
    )
    c2_full = big.groupBy("w1", "w2").agg(F.count("*").alias("n2"))
    # c1 re-aggregates the (pre-cut) bigram counts instead of exploding
    # the corpus a second time: c(w1 ·) = sum over w2 of c(w1 w2)
    c1 = c2_full.groupBy("w1").agg(F.sum("n2").alias("n1"))
    c2 = (
        c2_full.filter(F.col("n2") >= min_count) if min_count > 1 else c2_full
    )
    vocab = base.select(F.explode("ts").alias("t")).agg(
        F.countDistinct("t").alias("v")
    )
    scored = (
        big.join(c2, ["w1", "w2"], "left")
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc",
            "pos",
            F.log(
                (F.coalesce(F.col("n2"), F.lit(0)) + 1)
                / (F.col("n1") + F.col("v")).cast("double")
            ).alias("lp"),
        )
    )
    # ordered-array sum: deterministic left-to-right accumulation
    return (
        scored.groupBy("doc")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.expr(
                "aggregate(transform(array_sort(collect_list(struct(pos, lp))),"
                " s -> s.lp), 0D, (acc, x) -> acc + x)"
            ).alias("lp_sum"),
        )
        .select(
            F.col("doc").alias(id_col),
            "n_bigrams",
            F.round(F.col("lp_sum") / F.col("n_bigrams"), round_to).alias(
                "lm_score"
            ),
        )
    )
