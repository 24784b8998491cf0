"""Dedup clustering query: MinHash pairs → connected components →
per-doc canonical cluster assignment (SURVEY.md §7 M4).

Oracle: DuckDB recursive CTE computes the transitive closure of the
same pair graph (tiny at verify scale) and labels each node with the
min reachable id — the exact definition the iterative Spark version
converges to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
