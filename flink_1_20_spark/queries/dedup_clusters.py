"""Dedup clustering query: MinHash pairs → connected components →
per-doc canonical cluster assignment (SURVEY.md §7 M4).

Oracle: DuckDB recursive CTE computes the transitive closure of the
same pair graph (tiny at verify scale) and labels each node with the
min reachable id — the exact definition the iterative Spark version
converges to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_20_spark.operators.components import dedup_assignment
from flink_1_20_spark.operators.textdedup import minhash_lsh_pairs
from flink_1_20_spark.queries.dedup_docs import _MINHASH_ORACLE

from flink_1_20_spark.registry import register

from ._util import T

# reuse the minhash pair derivation, then close over the pair graph
_CLUSTER_ORACLE = (
    "WITH RECURSIVE pairs_base AS (" + _MINHASH_ORACLE.replace("\n", " ") + "),\n"
    "edges AS (SELECT id_a AS u, id_b AS v FROM pairs_base\n"
    "          UNION SELECT id_b, id_a FROM pairs_base\n"
    "          UNION SELECT id_a, id_a FROM pairs_base\n"
    "          UNION SELECT id_b, id_b FROM pairs_base),\n"
    "reach AS (\n"
    "    SELECT u AS src, v AS dst FROM edges\n"
    "    UNION\n"
    "    SELECT r.src, e.v AS dst FROM reach r JOIN edges e ON r.dst = e.u\n"
    "),\n"
    "labels AS (SELECT src AS doc, min(dst) AS cluster FROM reach GROUP BY src)\n"
    "SELECT d.doc_id AS doc,\n"
    "       coalesce(l.cluster, d.doc_id) AS cluster,\n"
    "       coalesce(l.cluster, d.doc_id) <> d.doc_id AS is_duplicate\n"
    "FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc"
)


@register("dedup_connected_clusters", oracle=_CLUSTER_ORACLE)
def dedup_connected_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash pairs → min-label connected components → every doc labeled
    (doc, cluster, is_duplicate). The keep-one-per-cluster filter is then
    `WHERE NOT is_duplicate` — the end-to-end corpus-dedup shape."""
    docs = T(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", jaccard_threshold=0.5)
    return dedup_assignment(docs, pairs, "doc_id")


# Best-representative selection: real pipelines keep the HIGHEST-QUALITY
# member of each near-dup cluster, not the lowest id. Quality proxy here:
# most words, then doc_id as the deterministic tiebreak. Oracle reuses
# the transitive-closure CTE plus the shared word-split convention.
_BEST_REP_ORACLE = (
    "WITH RECURSIVE pairs_base AS (" + _MINHASH_ORACLE.replace("\n", " ") + "),\n"
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
    "member AS (SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS cluster,\n"
    "                  len(list_filter(string_split_regex(\n"
    "                        regexp_replace(lower(d.text), '[^a-z0-9 ]', ' ', 'g'),\n"
    "                        '\\s+'), x -> x <> '')) AS n_words\n"
    "           FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc),\n"
    "ranked AS (SELECT *, row_number() OVER (PARTITION BY cluster\n"
    "                       ORDER BY n_words DESC, doc_id ASC) AS rn\n"
    "           FROM member)\n"
    "SELECT cluster, doc_id AS kept_doc,\n"
    "       CAST(n_words AS BIGINT) AS kept_n_words,\n"
    "       (SELECT CAST(count(*) AS BIGINT) FROM member m\n"
    "        WHERE m.cluster = ranked.cluster) AS n_members\n"
    "FROM ranked WHERE rn = 1"
)


@register("dedup_cluster_best_representative", oracle=_BEST_REP_ORACLE)
def dedup_cluster_best_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the best member per near-dup cluster — most words, then
    lowest doc_id (deterministic) — instead of the arbitrary lowest id:
    the curation pipeline's production keep-rule (near-dups often differ
    by truncation, and dropping the longer copy loses data).

    Plan: cluster labels come from the checkpointed min-label component
    loop (one assignment per doc), the quality proxy is a pure column
    expression, and the keep decision is ONE window over cluster — no
    extra shuffle beyond the labeling itself. Scale-invariant: at 100 TB
    the argmax is per-cluster state, never corpus-global."""
    from pyspark.sql import Window

    from flink_1_20_spark.operators.textdedup import normalized_words

    docs = T(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", jaccard_threshold=0.5)
    labeled = dedup_assignment(docs, pairs, "doc_id").select(
        F.col("doc").alias("doc_id"), "cluster"
    )
    member = labeled.join(
        docs.select("doc_id", F.size(normalized_words(F.col("text"))).alias("n_words")),
        "doc_id",
    )
    w = Window.partitionBy("cluster").orderBy(
        F.desc("n_words"), F.asc("doc_id")
    )
    sizes = member.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return (
        member.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(sizes, "cluster")
        .select(
            "cluster",
            F.col("doc_id").alias("kept_doc"),
            F.col("n_words").cast("long").alias("kept_n_words"),
            "n_members",
        )
    )
