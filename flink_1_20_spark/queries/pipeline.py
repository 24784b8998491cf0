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

    # canon as a GROUPED map joined back by content hash, not a window
    # over md5(text) (r12): the window shuffles and sorts every passing
    # document's full text once per downstream plan branch (staged,
    # rem, near all re-derive it — 314 s at the 5M-doc flagship probe;
    # 10 s after this restructure + the normalized_words single-split
    # rewrite), where the grouped form map-side-combines to one row per
    # distinct content and joins back as an AQE broadcast — no
    # full-corpus shuffle anywhere in the funnel.  first(text) also
    # keeps the representative text an aggregate OUTPUT, so minhash's
    # shingle-count filter cannot be pushed below the collapse
    # (PushPredicateThroughAggregate — see collapse_exact).
    canon_map = (
        q.filter("passes")
        .select("doc_id", F.md5("text").alias("__h"), "text")
        .groupBy("__h")
        .agg(
            F.min("doc_id").alias("canonical"),
            F.first("text").alias("text"),
        )
        # four consumers (the staged join side + minhash's base/sh_a/
        # sh_b chains), and per-branch column pruning gives each its own
        # scan schema, so exchange reuse is not guaranteed — the LAZY
        # checkpoint pins the quality-gate pass to run once regardless.
        # Same discipline as textdedup's boundary-chunk checkpoint: lazy
        # so plan construction runs no job; cluster form = .checkpoint()
        .localCheckpoint(eager=False)
    )
    rem = canon_map.select(F.col("canonical").alias("doc_id"), "text")

    pairs = minhash_lsh_pairs(
        rem, "doc_id", "text", shingle_n=3, num_hashes=16, rows_per_band=4,
        jaccard_threshold=0.5,
    )
    near = dedup_assignment(rem, pairs, "doc_id").select(
        F.col("doc").alias("doc_id"), F.col("is_duplicate").alias("is_near")
    )

    staged = (
        q.select(
            "doc_id", "lang", "toks", "passes", F.md5("text").alias("__h")
        )
        # a failing doc's text never enters canon_map (passes is a
        # function of the text), so its canonical stays null — same
        # rows as the old per-doc_id join
        .join(canon_map.select("__h", "canonical"), "__h", "left")
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


# ---------------------------------------------------------------- DSIR
# (Data Selection via Importance Resampling, Xie et al. 2023,
# arXiv:2302.03169): select raw pre-training documents whose hashed
# n-gram distribution looks like a TARGET corpus, by importance weight
# log p_target(doc) - log p_raw(doc) under bag-of-hashed-ngrams
# unigram models. The published method Gumbel-samples by weight; the
# deterministic oracle-checkable form here takes top-K by weight (the
# zero-temperature limit), which is also what curation pipelines run
# when they want reproducible selections.
#
# Determinism contract (the lesson of rounds 6-8): the per-bucket log
# ratio c_b is quantized to integer micro-units FIRST
# (CAST(round(c_b * 1e6) AS BIGINT)), so every document weight is an
# exact BIGINT dot product count_b * c_units_b: ORDER-independent
# across engines and partitionings. A raw double sum of logs would sit
# one ULP from a rank flip whenever two docs' true weights tie
# (duplicated text makes exact ties common in real corpora). One
# residual cross-engine risk remains, documented rather than
# eliminable: c_b itself comes out of libm ln (JVM Math.log has a
# 1-ulp contract; DuckDB uses the platform libm), so a bucket whose
# true c_b*1e6 lies within ~1 ulp of a half-integer could quantize
# differently per engine. At c_b*1e6 magnitudes ~1e6-1e7 the flip
# window is ~2e-10 of each unit interval → ~1e-8 per 64-bucket model:
# orders of magnitude below the 1e-3/row money-rounding class this
# repo structurally eliminated, and detectable by the oracle compare
# the moment a dataset ever hits it.
#
# 100 TB scale: one scan of documents → occurrence-level n-gram
# explode (the same shape as the MinHash shingle explode, shuffle ≈
# n-grams/doc rows); the bucket model is 64 rows (broadcast join);
# per-doc weights are ONE groupBy(doc_id) shuffle; the final top-50 is
# orderBy(desc(w_units), asc(doc_id)).limit(50) — TakeOrderedAndProject,
# i.e. a per-partition 50-row heap merged on the driver, never a global
# sort (the doc_id tie-break makes the order total, so this is
# row-for-row identical to the oracle's rank() <= 50). The rnk column
# is then attached by a row_number window over ONLY the 50 surviving
# rows — its single-partition exchange moves 50 rows regardless of
# corpus size. At corpus scale the limit can further relax to a
# weight-threshold filter (the top-K contract is for the oracle's
# total order).

_DSIR_ORACLE = r"""
WITH base AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), '\s+'),
                     x -> x <> '') AS w
  FROM documents),
grams AS (
  SELECT doc_id, source, unnest(w || [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS g
  FROM base),
bucketed AS (
  SELECT doc_id, source, source IN ('src0','src1') AS tgt,
         CAST(('0x' || substring(md5(g), 1, 8)) AS BIGINT) % 64 AS b
  FROM grams),
bc AS (
  SELECT b,
         sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS cnt_t,
         sum(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS cnt_r
  FROM bucketed GROUP BY b),
tot AS (SELECT sum(cnt_t) AS tot_t, sum(cnt_r) AS tot_r FROM bc),
cb AS (
  SELECT b, CAST(round((ln((cnt_t + 1e0) / (tot_t + 64e0))
                       - ln((cnt_r + 1e0) / (tot_r + 64e0))) * 1e6) AS BIGINT) AS c_units
  FROM bc, tot),
doc_b AS (
  SELECT doc_id, source, b, count(*) AS n
  FROM bucketed WHERE NOT tgt GROUP BY doc_id, source, b),
wts AS (
  SELECT d.doc_id, d.source, sum(d.n * cb.c_units) AS w_units
  FROM doc_b d JOIN cb USING (b) GROUP BY d.doc_id, d.source),
ranked AS (
  SELECT doc_id, source, w_units,
         rank() OVER (ORDER BY w_units DESC, doc_id) AS rnk
  FROM wts)
SELECT doc_id, source, round(w_units / 1e6, 6) AS weight, rnk
FROM ranked WHERE rnk <= 50 ORDER BY rnk
"""


@register("pipeline_dsir_select", oracle=_DSIR_ORACLE)
def pipeline_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance selection: top-50 raw docs whose hashed
    unigram+bigram distribution is most target-like, with src0/src1 as
    the deterministic target stand-in. See the module comment for the
    integer-microunits determinism contract and the scale shape.  The
    occurrence-level n-gram explode is CPU-bound per row, so scan
    parallelism is the wall clock — the compact-input guard
    repartitions when input splits < cores (r10, after the 100x probe
    showed the one-file replica scanning on 2 splits)."""
    from flink_1_20_spark.operators.textdedup import hash32
    from flink_1_20_spark.operators.util import ensure_scan_parallelism

    docs = ensure_scan_parallelism(T(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id",
        "source",
        normalized_words(F.col("text")).alias("w"),
    )
    grams = base.select(
        "doc_id",
        "source",
        F.explode(
            F.concat(
                F.col("w"),
                F.when(
                    F.size("w") >= 2,
                    F.expr(
                        "transform(sequence(0, size(w) - 2),"
                        " i -> concat(w[i], ' ', w[i + 1]))"
                    ),
                ).otherwise(F.expr("array()")),
            )
        ).alias("g"),
    )
    bucketed = grams.select(
        "doc_id",
        "source",
        F.col("source").isin("src0", "src1").alias("tgt"),
        (hash32(F.col("g")) % 64).alias("b"),
    )
    bc = bucketed.groupBy("b").agg(
        F.sum(F.when(F.col("tgt"), 1).otherwise(0)).alias("cnt_t"),
        F.sum(F.when(~F.col("tgt"), 1).otherwise(0)).alias("cnt_r"),
    )
    tot = bc.agg(
        F.sum("cnt_t").alias("tot_t"), F.sum("cnt_r").alias("tot_r")
    )
    cb = bc.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            (
                F.log((F.col("cnt_t") + F.lit(1.0)) / (F.col("tot_t") + F.lit(64.0)))
                - F.log((F.col("cnt_r") + F.lit(1.0)) / (F.col("tot_r") + F.lit(64.0)))
            )
            * F.lit(1e6)
        )
        .cast("bigint")
        .alias("c_units"),
    )
    doc_b = (
        bucketed.filter(~F.col("tgt"))
        .groupBy("doc_id", "source", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wts = (
        doc_b.join(F.broadcast(cb), "b")
        .groupBy("doc_id", "source")
        .agg(F.sum(F.col("n") * F.col("c_units")).alias("w_units"))
    )
    # Top-K first (TakeOrderedAndProject: per-partition 50-row heaps,
    # driver merge), THEN rank over only the survivors. The doc_id
    # tie-break makes the order total, so rank == row_number and the
    # limit keeps exactly the oracle's rank() <= 50 rows; the window's
    # single-partition exchange now carries 50 rows, not the corpus.
    top = wts.orderBy(F.desc("w_units"), F.asc("doc_id")).limit(50)
    ranked = top.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.desc("w_units"), F.asc("doc_id"))),
    )
    return ranked.select(
        "doc_id",
        "source",
        F.round(F.col("w_units") / F.lit(1e6), 6).alias("weight"),
        "rnk",
    ).orderBy("rnk")
