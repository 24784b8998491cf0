"""Text-analysis queries — language-ID, quality scoring, token counting,
document fingerprinting (SURVEY.md §7 M4: training-data pipeline ops).

All computed with built-in string/array functions (codegen, no Python),
each mirrored exactly in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_20_spark.operators.textdedup import hash60, normalized_words, word_shingles
from flink_1_20_spark.registry import register

from ._util import T, canon_join

# Tiny per-language stopword lists (public, standard function words).
_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "zu", "den", "von", "ist", "mit", "nicht"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "no", "por"],
    "fr": ["le", "la", "de", "et", "un", "que", "est", "pour", "qui", "dans"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "这", "人"],
}


def _ratio_expr_spark(words, lang: str):
    sw = F.array(*[F.lit(s) for s in _STOPWORDS[lang]])
    n_sw = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    return (n_sw / F.greatest(F.size(words), F.lit(1))).alias(f"r_{lang}")


def _ratio_sql(lang: str) -> str:
    lst = "[" + ", ".join("'" + s + "'" for s in _STOPWORDS[lang]) + "]"
    return (
        f"len(list_filter(w, x -> list_contains({lst}, x))) * 1.0"
        f" / greatest(len(w), 1) AS r_{lang}"
    )


_WORDS_SQL = (
    "list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),"
    " '\\s+'), x -> x <> '')"
)

_LANGS = sorted(_STOPWORDS)

_LANGID_ORACLE = (
    "WITH words AS (SELECT doc_id, lang, " + _WORDS_SQL + " AS w FROM documents),\n"
    "r AS (SELECT doc_id, lang, " + ", ".join(_ratio_sql(lg) for lg in _LANGS) + " FROM words)\n"
    "SELECT doc_id, lang AS actual_lang,\n"
    "  CASE greatest(" + ", ".join(f"r_{lg}" for lg in _LANGS) + ")\n"
    + "".join(f"    WHEN r_{lg} THEN '{lg}'\n" for lg in _LANGS)
    + "  END AS pred_lang,\n"
    "  round(greatest(" + ", ".join(f"r_{lg}" for lg in _LANGS) + "), 6) AS best_ratio\n"
    "FROM r"
)


@register("text_langid", oracle=_LANGID_ORACLE)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language ID: per-language function-word hit rate,
    argmax with first-wins tie-break in fixed lang order (deterministic
    heuristic — the operator contract, not a trained model)."""
    d = T(spark, sf_dir, "documents")
    words = normalized_words(F.col("text"))
    r = d.select("doc_id", F.col("lang").alias("actual_lang"), *[
        _ratio_expr_spark(words, lg) for lg in _LANGS
    ])
    best = F.greatest(*[F.col(f"r_{lg}") for lg in _LANGS])
    pred = F.lit(None).cast("string")
    # first-wins in _LANGS order, matching the SQL CASE
    expr = None
    for lg in _LANGS:
        cond = F.col(f"r_{lg}") == best
        expr = F.when(cond, lg) if expr is None else expr.when(cond, lg)
    return r.select(
        "doc_id", "actual_lang", expr.alias("pred_lang"), F.round(best, 6).alias("best_ratio")
    )


_QUALITY_ORACLE = (
    "WITH base AS (SELECT doc_id, text, " + _WORDS_SQL + " AS w FROM documents)\n"
    "SELECT doc_id,\n"
    "  length(text) AS n_chars,\n"
    "  len(w) AS n_words,\n"
    "  round(length(text) * 1.0 / greatest(len(w), 1), 6) AS avg_word_span,\n"
    "  round(len(list_distinct(w)) * 1.0 / greatest(len(w), 1), 6) AS uniq_ratio,\n"
    "  round((length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')))\n"
    "        * 1.0 / greatest(length(text), 1), 6) AS punct_ratio,\n"
    "  round(len(list_filter(w, x -> regexp_matches(x, '^[0-9]+$'))) * 1.0\n"
    "        / greatest(len(w), 1), 6) AS digit_word_ratio,\n"
    "  (len(w) BETWEEN 10 AND 100000)\n"
    "    AND (len(list_distinct(w)) * 1.0 / greatest(len(w), 1) >= 0.1) AS passes_quality\n"
    "FROM base"
)


@register("text_quality", oracle=_QUALITY_ORACLE)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality features + a pass/fail gate (length band,
    lexical diversity) — the C4/Gopher-style pre-training filter shape."""
    d = T(spark, sf_dir, "documents")
    w = normalized_words(F.col("text"))
    base = d.select("doc_id", "text", w.alias("w"))
    n_words = F.greatest(F.size("w"), F.lit(1))
    n_chars = F.length("text")
    uniq = F.size(F.array_distinct("w")) / n_words
    stripped = F.regexp_replace("text", "[^a-z0-9 ]", "")
    return base.select(
        "doc_id",
        n_chars.alias("n_chars"),
        F.size("w").alias("n_words"),
        F.round(n_chars / n_words, 6).alias("avg_word_span"),
        F.round(uniq, 6).alias("uniq_ratio"),
        F.round((n_chars - F.length(stripped)) / F.greatest(n_chars, F.lit(1)), 6).alias(
            "punct_ratio"
        ),
        F.round(
            F.size(F.filter(F.col("w"), lambda x: x.rlike("^[0-9]+$"))) / n_words, 6
        ).alias("digit_word_ratio"),
        (F.size("w").between(10, 100000) & (uniq >= 0.1)).alias("passes_quality"),
    )


_TOKENS_ORACLE = """
SELECT doc_id,
       len(string_split_regex(trim(text), '\\s+')) AS ws_tokens,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS bpe_ish_tokens,
       round(length(text) * 1.0
             / greatest(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')), 1),
             6) AS chars_per_token
FROM documents
"""


@register("text_tokens", oracle=_TOKENS_ORACLE)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex segmentation
    (letter runs / digit runs / single symbols) — the cheap token-budget
    estimator for corpus sizing."""
    d = T(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    return d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("ws_tokens"),
        F.size(bpe).alias("bpe_ish_tokens"),
        F.round(
            F.length("text") / F.greatest(F.size(bpe), F.lit(1)), 6
        ).alias("chars_per_token"),
    )


_FP_ORACLE = (
    "WITH words AS (SELECT doc_id, " + _WORDS_SQL + " AS w FROM documents),\n"
    "sh AS (SELECT doc_id,\n"
    "  list_distinct(list_transform(range(1, greatest(len(w) - 4, 0) + 1),"
    " i -> array_to_string(w[i:i+4], ' '))) AS sh FROM words),\n"
    "h AS (SELECT doc_id, list_sort(list_transform(sh,"
    " s -> CAST(('0x' || substring(md5(s), 1, 15)) AS BIGINT))) AS hs FROM sh)\n"
    "SELECT doc_id, coalesce(array_to_string(hs[1:4], ','), '') AS sketch,"
    " len(hs) AS n_shingles FROM h"
)


@register("text_fingerprint", oracle=_FP_ORACLE)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: 4-min-hash sketch (bottom-k of 5-word
    shingle hashes) — winnowing-style content signature usable for
    containment joins."""
    d = T(spark, sf_dir, "documents")
    words = normalized_words(F.col("text"))
    base = d.select("doc_id", word_shingles(words, 5).alias("sh"))
    # explode → one hash per shingle → agg: shingles computed once per
    # doc (array-expression reuse would recompute them per reference)
    ex = base.select("doc_id", F.explode_outer("sh").alias("s")).withColumn(
        "h", hash60(F.col("s"))
    )
    return ex.groupBy("doc_id").agg(
        canon_join(F.slice(F.sort_array(F.collect_list("h")), 1, 4)).alias(
            "sketch"
        ),
        F.count("h").alias("n_shingles"),
    )


_MIX_REPORT_ORACLE = """
WITH s AS (
  SELECT source,
         count(*) AS n_docs,
         CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS ws_tokens,
         count(DISTINCT md5(text)) AS n_unique
  FROM documents GROUP BY source)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       ws_tokens,
       round(1.0 - n_unique * 1.0 / n_docs, 6) AS dup_rate,
       round(n_docs * 1.0 / sum(n_docs) OVER (), 6) AS corpus_share
FROM s
"""


@register("text_domain_mix_report", oracle=_MIX_REPORT_ORACLE)
def text_domain_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus observability: document count, whitespace-token
    budget, exact-duplicate rate (1 − distinct-hash/count) and share of
    the corpus — the mixing report every multi-source training pipeline
    monitors. Plan: one map-combined agg keyed by source (the natural
    partition key), one tiny window over the per-source rollup — no
    per-document shuffle."""
    from pyspark.sql import Window

    d = T(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.trim(F.col("text")), " "))).alias("ws_tokens"),
        F.count_distinct(F.md5("text")).alias("n_unique"),
    )
    return per_src.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("ws_tokens").cast("long").alias("ws_tokens"),
        F.round(1.0 - F.col("n_unique") / F.col("n_docs"), 6).alias("dup_rate"),
        F.round(
            F.col("n_docs") / F.sum("n_docs").over(Window.partitionBy()), 6
        ).alias("corpus_share"),
    )
