"""End-to-end corpus-curation pipeline query (SURVEY.md §7 M4).

Composes the individually-verified training-data operators into the
funnel a real pre-training corpus build runs:

    quality gate → exact dedup → MinHash near-dup clustering → keep

Every document is attributed to the FIRST stage that drops it
(`quality_fail` / `exact_dup` / `near_dup`) or `kept`, and the output is
the per-language funnel summary plus the token budget of the surviving
corpus — the number a data engineer actually reads off this pipeline.

Scale: each stage is the already-plan-audited operator — quality gate is
pure codegen, exact dedup one hash shuffle, MinHash a band equi-join,
clustering the checkpointed hash-to-min loop. No driver collect anywhere;
the funnel summary is a final tiny groupBy(lang).

Oracle: the same funnel in one DuckDB statement, reusing the exact SQL
mirrors of each stage (same md5-derived hashes, same thresholds), with a
recursive CTE for the transitive closure of the near-dup pair graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_1_20_spark.operators.components import dedup_assignment
from flink_1_20_spark.operators.textdedup import minhash_lsh_pairs, normalized_words
from flink_1_20_spark.registry import register

from ._util import T
from .dedup_docs import _MINHASH_ORACLE
from .text_analysis import _WORDS_SQL

# BPE-ish token count (same segmentation as text_tokens)
_TOKS_SQL = r"len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))"

# Near-dup pair derivation restricted to the docs that survived the
# quality gate + exact dedup: the shared MinHash SQL with its source
# swapped from the full table to the `rem` CTE.
_PAIRS_ON_REM = _MINHASH_ORACLE.replace("FROM documents", "FROM rem").replace("\n", " ")

_PIPELINE_ORACLE = (
    "WITH RECURSIVE base AS (\n"
    "  SELECT doc_id, lang, text, " + _WORDS_SQL + " AS w, " + _TOKS_SQL + " AS toks\n"
    "  FROM documents),\n"
    "q AS (SELECT doc_id, lang, text, toks,\n"
    "        (len(w) BETWEEN 10 AND 100000)\n"
    "          AND (len(list_distinct(w)) * 1.0 / greatest(len(w), 1) >= 0.1) AS passes\n"
    "      FROM base),\n"
    "canon AS (SELECT doc_id, text,\n"
    "            min(doc_id) OVER (PARTITION BY md5(text)) AS canonical\n"
    "          FROM q WHERE passes),\n"
    "rem AS (SELECT doc_id, text FROM canon WHERE doc_id = canonical),\n"
    "pairs_base AS (" + _PAIRS_ON_REM + "),\n"
    "edges AS (SELECT id_a AS u, id_b AS v FROM pairs_base\n"
    "          UNION SELECT id_b, id_a FROM pairs_base\n"
    "          UNION SELECT id_a, id_a FROM pairs_base\n"
    "          UNION SELECT id_b, id_b FROM pairs_base),\n"
    "reach AS (\n"
    "    SELECT u AS src, v AS dst FROM edges\n"
    "    UNION\n"
    "    SELECT r.src, e.v AS dst FROM reach r JOIN edges e ON r.dst = e.u\n"
    "),\n"
    "labels AS (SELECT src AS doc, min(dst) AS cluster FROM reach GROUP BY src),\n"
    "near AS (SELECT r.doc_id,\n"
    "           coalesce(l.cluster, r.doc_id) <> r.doc_id AS is_near\n"
    "         FROM rem r LEFT JOIN labels l ON r.doc_id = l.doc),\n"
    "staged AS (SELECT q.doc_id, q.lang, q.toks,\n"
    "    CASE WHEN NOT q.passes THEN 'quality_fail'\n"
    "         WHEN c.doc_id <> c.canonical THEN 'exact_dup'\n"
    "         WHEN n.is_near THEN 'near_dup'\n"
    "         ELSE 'kept' END AS stage\n"
    "  FROM q LEFT JOIN canon c ON q.doc_id = c.doc_id\n"
    "         LEFT JOIN near n ON q.doc_id = n.doc_id)\n"
    "SELECT lang,\n"
    "  CAST(count(*) AS BIGINT) AS n_docs,\n"
    "  CAST(count_if(stage = 'quality_fail') AS BIGINT) AS n_quality_fail,\n"
    "  CAST(count_if(stage = 'exact_dup') AS BIGINT) AS n_exact_dup,\n"
    "  CAST(count_if(stage = 'near_dup') AS BIGINT) AS n_near_dup,\n"
    "  CAST(count_if(stage = 'kept') AS BIGINT) AS n_kept,\n"
    "  CAST(coalesce(sum(CASE WHEN stage = 'kept' THEN toks END), 0) AS BIGINT)\n"
    "    AS kept_tokens\n"
    "FROM staged GROUP BY lang"
)


@register("pipeline_corpus_curation", oracle=_PIPELINE_ORACLE)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate → exact dedup → MinHash(16)+LSH(4×4) near-dup
    clusters → per-language funnel counts + kept-token budget.

    Same stage definitions as text_quality / dedup_exact /
    dedup_minhash_lsh / dedup_connected_clusters, composed end-to-end
    (the pipeline shape of e.g. C4/RefinedWeb corpus builds)."""
    docs = T(spark, sf_dir, "documents")
    w = normalized_words(F.col("text"))
    toks = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    ).cast("long")
    n_words = F.size("w")
    uniq = F.size(F.array_distinct("w")) / F.greatest(n_words, F.lit(1))
    q = docs.select(
        "doc_id", "lang", "text", w.alias("w"), toks.alias("toks")
    ).withColumn("passes", F.col("w").isNotNull() & n_words.between(10, 100000) & (uniq >= 0.1))

    canon = (
        q.filter("passes")
        .select("doc_id", "text")
        .withColumn("canonical", F.min("doc_id").over(Window.partitionBy(F.md5("text"))))
    )
    rem = canon.filter(F.col("doc_id") == F.col("canonical")).select("doc_id", "text")

    pairs = minhash_lsh_pairs(
        rem, "doc_id", "text", shingle_n=3, num_hashes=16, rows_per_band=4,
        jaccard_threshold=0.5,
    )
    near = dedup_assignment(rem, pairs, "doc_id").select(
        F.col("doc").alias("doc_id"), F.col("is_duplicate").alias("is_near")
    )

    staged = (
        q.select("doc_id", "lang", "toks", "passes")
        .join(canon.select("doc_id", "canonical"), "doc_id", "left")
        .join(near, "doc_id", "left")
        .withColumn(
            "stage",
            F.when(~F.col("passes"), "quality_fail")
            .when(F.col("doc_id") != F.col("canonical"), "exact_dup")
            .when(F.col("is_near"), "near_dup")
            .otherwise("kept"),
        )
    )

    def _n(cond):
        return F.sum(cond.cast("long"))

    return staged.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        _n(F.col("stage") == "quality_fail").alias("n_quality_fail"),
        _n(F.col("stage") == "exact_dup").alias("n_exact_dup"),
        _n(F.col("stage") == "near_dup").alias("n_near_dup"),
        _n(F.col("stage") == "kept").alias("n_kept"),
        F.coalesce(
            F.sum(F.when(F.col("stage") == "kept", F.col("toks"))), F.lit(0).cast("long")
        ).alias("kept_tokens"),
    )


_BUDGET = 20_000  # per-language token budget for the sampling demo

_SAMPLE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang, {_TOKS_SQL} AS toks FROM documents),
per_lang AS (SELECT lang, sum(toks) AS total FROM tok GROUP BY lang),
rated AS (
  SELECT t.doc_id, t.lang, t.toks,
         CASE WHEN p.total <= {_BUDGET} THEN 1.0
              ELSE {_BUDGET} * 1.0 / p.total END AS rate
  FROM tok t JOIN per_lang p ON t.lang = p.lang)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS sampled_tokens
FROM rated
WHERE (doc_id * 2654435761) % 1000000 < rate * 1000000
GROUP BY lang
"""


@register("pipeline_token_budget_sample", oracle=_SAMPLE_ORACLE)
def pipeline_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language token-budget sampling — the standard
    mixture-weighting step of a pre-training data build: each language
    is downsampled to ~a fixed token budget with a reproducible
    keep-decision per document (Knuth multiplicative hash of doc_id, so
    reruns and both engines agree row-for-row; no rand()).

    Scale: one aggregate for per-language totals (tiny — #languages
    rows, broadcast back), one stateless filter over the corpus — no
    extra shuffle of the documents themselves, no sort, no sampling
    collect. At 100 TB the filter is pure codegen against a broadcast
    map of rates."""
    docs = T(spark, sf_dir, "documents")
    toks = F.size(
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0
        )
    ).cast("long")
    tok = docs.select("doc_id", "lang", toks.alias("toks"))
    per_lang = tok.groupBy("lang").agg(F.sum("toks").alias("total"))
    rated = tok.join(F.broadcast(per_lang), "lang").withColumn(
        "rate",
        F.when(F.col("total") <= _BUDGET, F.lit(1.0)).otherwise(
            F.lit(float(_BUDGET)) / F.col("total")
        ),
    )
    kept = rated.filter(
        (F.col("doc_id") * F.lit(2654435761)) % 1_000_000
        < F.col("rate") * 1_000_000
    )
    return kept.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("sampled_tokens"),
    )


_MIX_BUDGET = 60_000  # total token budget across all sources
# temperature alpha is fixed at 0.5 (sqrt) — hardcoded identically in
# the oracle SQL and the Spark expression below

_MIX_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents),
per_src AS (SELECT source, CAST(sum(toks) AS BIGINT) AS total
            FROM tok GROUP BY source),
-- normalizer folded left-to-right in source order so the double is
-- bit-identical on both engines (a bare SUM() accumulates in scan order)
z AS (SELECT list_reduce(list(sqrt(total) ORDER BY source),
                         (acc, x) -> acc + x) AS z FROM per_src),
rated AS (
  SELECT p.source, p.total,
         least(1.0, {_MIX_BUDGET} * (sqrt(p.total) / z.z) / p.total) AS rate
  FROM per_src p CROSS JOIN z)
SELECT t.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(t.toks) AS BIGINT) AS sampled_tokens,
       round(any_value(r.rate), 6) AS rate
FROM tok t JOIN rated r ON t.source = r.source
WHERE (t.doc_id * 2654435761) % 1000000 < r.rate * 1000000
GROUP BY t.source
"""


@register("pipeline_temperature_mix", oracle=_MIX_ORACLE)
def pipeline_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture sampling across sources (the T5 /
    multilingual-pretraining alpha-weighting, alpha = 0.5): target share
    of source s is sqrt(n_s) / sum_s sqrt(n_s), so large sources are
    downweighted and small ones upweighted relative to proportional
    sampling; each source is then thinned to its share of the total
    token budget with the same deterministic multiplicative-hash keep
    decision as the per-language budget sampler (no rand(), reruns and
    both engines agree row-for-row).

    The share normalizer folds left-to-right over the source-ordered
    array (sources are few), so the rates are bit-identical across
    engines and cluster sizes — a bare SUM would accumulate in scan
    order and could flip a boundary document.

    Scale: one tiny per-source aggregate broadcast back, one codegen
    filter over the corpus — no extra shuffle of the documents."""
    docs = T(spark, sf_dir, "documents")
    toks = F.size(
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0
        )
    ).cast("long")
    tok = docs.select("doc_id", "source", toks.alias("toks"))
    per_src = tok.groupBy("source").agg(F.sum("toks").alias("total"))
    z = per_src.agg(
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(source, "
            "sqrt(total) AS s))), x -> x.s), 0D, (acc, x) -> acc + x)"
        ).alias("z")
    )
    rated = per_src.crossJoin(F.broadcast(z)).withColumn(
        "rate",
        F.least(
            F.lit(1.0),
            F.lit(float(_MIX_BUDGET))
            * (F.sqrt("total") / F.col("z"))
            / F.col("total"),
        ),
    )
    kept = tok.join(F.broadcast(rated.select("source", "rate")), "source").filter(
        (F.col("doc_id") * F.lit(2654435761)) % 1_000_000
        < F.col("rate") * 1_000_000
    )
    return kept.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("sampled_tokens"),
        F.round(F.first("rate"), 6).alias("rate"),
    )
