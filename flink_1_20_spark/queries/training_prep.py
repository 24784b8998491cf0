"""Training-data preparation queries — sequence packing, sliding-window
chunking, SemDeDup semantic dedup, and ANN recall measurement.

The post-curation half of an LLM data pipeline (SURVEY.md §7 M4): after
gating/dedup (queries/pipeline.py) the corpus is packed into fixed
token-budget training sequences, chunked for retrieval, semantically
deduplicated on embeddings, and the approximate-search path's recall is
measured against the exact baseline as a first-class query.

Every oracle replays the identical math in DuckDB — the greedy packing
scan as a recursive CTE, the chunk windows as list_slice over the same
whitespace split, the SemDeDup cells re-derived from the same
deterministic centroid stand-in, the md5 chunk fingerprints shared
verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_20_spark.operators.packing import greedy_pack, sliding_chunks
from flink_1_20_spark.operators.simsearch import (
    cosine_topk,
    lsh_topk,
    semantic_dedup,
)
from flink_1_20_spark.registry import register

from ._util import T

# ------------------------------------------------------- sequence packing

_BUDGET, _SHARDS = 512, 4

_PACK_ORACLE = f"""
WITH RECURSIVE d AS (
  SELECT lang, CAST(doc_id % {_SHARDS} AS BIGINT) AS shard, doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS tok,
         CAST(row_number() OVER (PARTITION BY lang, doc_id % {_SHARDS}
                                 ORDER BY doc_id) AS BIGINT) AS rn
  FROM documents
),
pack AS (
  SELECT lang, shard, doc_id, tok, rn, CAST(1 AS BIGINT) AS seq_id, tok AS fill
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.lang, d.shard, d.doc_id, d.tok, d.rn,
         CASE WHEN p.fill + d.tok <= {_BUDGET} THEN p.seq_id ELSE p.seq_id + 1 END,
         CASE WHEN p.fill + d.tok <= {_BUDGET} THEN p.fill + d.tok ELSE d.tok END
  FROM pack p JOIN d ON d.lang = p.lang AND d.shard = p.shard AND d.rn = p.rn + 1
)
SELECT lang, shard, doc_id, tok, seq_id FROM pack
"""


@register("pipeline_sequence_pack", oracle=_PACK_ORACLE)
def pipeline_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy first-fit sequence packing: documents stream in doc_id
    order within each (lang, shard) group and append to the current
    training sequence until the 512-token budget would overflow, then a
    new sequence opens (oversized docs get their own sequence, unsplit).

    The scan is sequential by design (running-fill state), so it runs
    as one Arrow-batched applyInPandas per group and the SHARD COUNT is
    the parallelism knob — at 100 TB pick shards so each group holds
    ~10^5 docs; packing quality only needs locality within a shard.
    The oracle replays the same scan as a recursive CTE."""
    d = T(spark, sf_dir, "documents").select(
        "lang",
        F.pmod(F.col("doc_id"), F.lit(_SHARDS)).cast("bigint").alias("shard"),
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias("tok"),
    )
    return greedy_pack(d, ["lang", "shard"], "doc_id", "tok", _BUDGET).select(
        "lang", "shard", "doc_id", "tok", "seq_id"
    )


# --------------------------------------------------- sliding-window chunks

_CHUNK_W, _CHUNK_S = 50, 25

_CHUNK_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
           FROM documents),
s AS (SELECT doc_id, toks, gs.start
      FROM t, LATERAL (SELECT unnest(range(0, greatest(len(toks), 1),
                                           {_CHUNK_S})) AS start) gs)
SELECT doc_id,
       CAST(start / {_CHUNK_S} AS BIGINT) AS chunk_idx,
       CAST(len(list_slice(toks, start + 1, start + {_CHUNK_W})) AS BIGINT)
         AS chunk_tokens,
       md5(array_to_string(list_slice(toks, start + 1, start + {_CHUNK_W}), ' '))
         AS chunk_md5
FROM s
"""


@register("text_chunk_sliding", oracle=_CHUNK_ORACLE)
def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (size 50, stride 25) — the
    retrieval/context-window preparation step. Each chunk carries an md5
    fingerprint of its space-rejoined tokens, directly consumable by the
    exact-dedup operator for chunk-level dedup.

    Scale: split + explode(sequence) + slice + md5 are all
    whole-stage-codegen expressions — a stateless map with ~n_tokens/25
    output rows per document and zero shuffles."""
    d = T(spark, sf_dir, "documents")
    out = sliding_chunks(d, "doc_id", "text", size=_CHUNK_W, stride=_CHUNK_S)
    return out.select(
        "doc_id",
        "chunk_idx",
        F.col("chunk_tokens").cast("bigint").alias("chunk_tokens"),
        "chunk_md5",
    )


# ------------------------------------------------------ semantic dedup

_SEM_TAU, _SEM_CELLS = 0.35, 16

_SEM_ORACLE = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
                  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                        CAST(embedding AS DOUBLE[]))) AS nrm
           FROM embeddings),
cent AS (SELECT vec_id AS cid, emb AS cv, nrm AS cnrm
         FROM v ORDER BY vec_id LIMIT {_SEM_CELLS}),
assign AS (SELECT v.vec_id, v.emb, v.nrm, cent.cid,
                  row_number() OVER (
                    PARTITION BY v.vec_id
                    ORDER BY round(list_dot_product(v.emb, cent.cv)
                                   / (v.nrm * cent.cnrm), 6) DESC, cent.cid
                  ) AS rn
           FROM v, cent),
cells AS (SELECT vec_id, emb, nrm, cid AS cell FROM assign WHERE rn = 1),
dups AS (SELECT DISTINCT b.vec_id AS dup_id
         FROM cells a JOIN cells b
           ON a.cell = b.cell AND a.vec_id < b.vec_id
         WHERE round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6)
               >= {_SEM_TAU}),
flagged AS (SELECT c.vec_id, c.cell, (d.dup_id IS NULL) AS keep
            FROM cells c LEFT JOIN dups d ON c.vec_id = d.dup_id)
SELECT vec_id, cell, keep FROM flagged
"""


@register("dedup_semantic_cells", oracle=_SEM_ORACLE)
def dedup_semantic_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023): embeddings
    are clustered into nearest-centroid cells, then any vector whose
    cosine to a lower-id cellmate reaches 0.35 is dropped — the lowest
    id of each semantic neighborhood survives. Centroids are the 16
    lowest-id vectors (deterministic training-free stand-in, same as
    simsearch_ivf_topk; swap in kmeans_centroids on a real corpus).

    Scale: the quadratic comparison runs per-cell via a self-equi-join
    on `cell` — never corpus-wide; centroid count bounds cell size
    (SemDeDup uses ~10^4-10^5 clusters at web scale)."""
    e = T(spark, sf_dir, "embeddings")
    return semantic_dedup(
        e, "vec_id", "embedding", threshold=_SEM_TAU, n_centroids=_SEM_CELLS
    )


# ----------------------------------------------------- ANN recall@k gates

# the oracles compose from similarity.py's shared CTE blocks — one
# source of truth for the ranking convention (rounding, tie-break,
# query-set predicate) between the measured paths and their yardstick
from .similarity import (  # noqa: E402
    _DIM as _RDIM,
)
from .similarity import (  # noqa: E402
    _K as _RK,
    _N_CENT,
    _N_PROBE,
    _N_QUERIES as _RQ,
    _N_PLANES as _RPLANES,
    V_CTE,
    bf_ranked_block,
    ivf_ranked_block,
    lsh_ranked_block,
)


def _recall_oracle(approx_block: str, approx_ranked: str) -> str:
    """Recall@k oracle scaffold: exact ranked block + one approximate
    ranked block + the hit count — shared by every ANN quality gate so
    the recall convention cannot diverge between paths."""
    return f"""
WITH {V_CTE},
{bf_ranked_block(q="bq", pairs="bf_pairs", ranked="bf_ranked")},
bf AS (SELECT query_id, neighbor_id FROM bf_ranked WHERE rank <= {_RK}),
{approx_block},
approx AS (SELECT query_id, neighbor_id FROM {approx_ranked} WHERE rank <= {_RK}),
hits AS (SELECT bf.query_id,
                CAST(count(a.neighbor_id) AS BIGINT) AS n_hits
         FROM bf LEFT JOIN approx a
           ON bf.query_id = a.query_id AND bf.neighbor_id = a.neighbor_id
         GROUP BY bf.query_id)
SELECT query_id, n_hits, round(n_hits / {_RK}.0, 6) AS recall FROM hits
"""


def _recall_vs_exact(spark: SparkSession, sf_dir: str, approx_fn) -> DataFrame:
    """Per-query recall@k of an approximate top-k against the exact
    baseline. `approx_fn(q, e)` returns the approximate (query_id,
    neighbor_id) DataFrame; columns are renamed before the join because
    both branches derive from the same scan."""
    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _RQ)
    bf = cosine_topk(q, e, "vec_id", "embedding", k=_RK).select(
        "query_id", "neighbor_id"
    )
    approx = approx_fn(q, e).select(
        F.col("query_id").alias("a_query"),
        F.col("neighbor_id").alias("a_neighbor"),
    )
    joined = bf.join(
        approx,
        (F.col("query_id") == F.col("a_query"))
        & (F.col("neighbor_id") == F.col("a_neighbor")),
        "left",
    )
    return (
        joined.groupBy("query_id")
        .agg(F.count("a_neighbor").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            F.round(F.col("n_hits") / _RK, 6).alias("recall"),
        )
    )


_RECALL_ORACLE = _recall_oracle(
    lsh_ranked_block(q="lq", c="lc", pairs="lsh_pairs", ranked="lsh_ranked"),
    "lsh_ranked",
)


@register("simsearch_recall_lsh", oracle=_RECALL_ORACLE)
def simsearch_recall_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the LSH-bucketed ANN path measured against the exact
    brute-force top-k, per query — the quality gate that makes the
    approximate path's accuracy a first-class, continuously-checked
    number instead of a one-off claim.

    Plan: both sides reuse their production operators (cosine_topk /
    lsh_topk); the comparison itself is one equi-join + count per query.
    At 100 TB this runs on a sampled query set — the denominators stay
    k, so the metric is unchanged by sampling the query side."""
    return _recall_vs_exact(
        spark,
        sf_dir,
        lambda q, e: lsh_topk(
            q, e, "vec_id", "embedding", k=_RK, n_planes=_RPLANES, dim=_RDIM
        ),
    )


_RECALL_IVF_ORACLE = _recall_oracle(
    ivf_ranked_block(q="iq", probe="iprobe", cand="icand", ranked="ivf_ranked"),
    "ivf_ranked",
)


@register("simsearch_recall_ivf", oracle=_RECALL_IVF_ORACLE)
def simsearch_recall_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF probe path against the exact top-k, per
    query — the second ANN quality gate (the LSH one is
    simsearch_recall_lsh); both compose from the shared recall scaffold
    and ranked-CTE blocks so every recall number measures exactly the
    production ranking convention."""
    from flink_1_20_spark.operators.simsearch import ivf_topk

    return _recall_vs_exact(
        spark,
        sf_dir,
        lambda q, e: ivf_topk(
            q, e, "vec_id", "embedding",
            k=_RK, n_centroids=_N_CENT, n_probe=_N_PROBE,
        ),
    )


from .similarity import (  # noqa: E402
    _PQ_K as _RPQK,
)
from .similarity import (  # noqa: E402
    _PQ_M as _RPQM,
)
from .similarity import (  # noqa: E402
    pq_adc_ranked_block,
)

_RECALL_PQ_ORACLE = _recall_oracle(
    pq_adc_ranked_block(emb="emb", p="pq_"), "pq_ranked"
)


@register("simsearch_recall_pq", oracle=_RECALL_PQ_ORACLE)
def simsearch_recall_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the PQ asymmetric-distance path vs the exact cosine
    top-k — the third ANN quality gate alongside LSH and IVF, so every
    approximate path in the repo carries a continuously-checked accuracy
    number. ADC ranks by compressed L2 while the baseline ranks by
    cosine, so this also tracks the metric mismatch a real PQ deployment
    must monitor."""
    from flink_1_20_spark.operators.simsearch import pq_adc_topk

    return _recall_vs_exact(
        spark,
        sf_dir,
        lambda q, e: pq_adc_topk(
            q, e, "vec_id", "embedding", topk=_RK, m=_RPQM, k=_RPQK, dim=_RDIM
        ).select("query_id", F.col("cand_id").alias("neighbor_id")),
    )


from .similarity import (  # noqa: E402
    ivfpq_adc_ranked_block,
)

_RECALL_IVFPQ_ORACLE = _recall_oracle(
    ivfpq_adc_ranked_block(emb="emb", p="ipq_"), "ipq_ranked"
)


@register("simsearch_recall_ivfpq", oracle=_RECALL_IVFPQ_ORACLE)
def simsearch_recall_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVFADC composition (IVF probe restriction + ADC
    code scoring) vs the exact cosine top-k — the fourth ANN quality
    gate. This is the 100 TB path (per-query code scans bounded by the
    probed cells), so its accuracy must be continuously measured against
    both the exact baseline and, implicitly, the flat-ADC gate
    (simsearch_recall_pq): the difference between the two isolates the
    recall cost of the cell restriction from the quantization error."""
    from flink_1_20_spark.operators.simsearch import ivfpq_adc_topk

    return _recall_vs_exact(
        spark,
        sf_dir,
        lambda q, e: ivfpq_adc_topk(
            q, e, "vec_id", "embedding",
            topk=_RK, m=_RPQM, k=_RPQK, dim=_RDIM,
            n_centroids=_N_CENT, n_probe=_N_PROBE,
        ).select("query_id", F.col("cand_id").alias("neighbor_id")),
    )


def ivfpq_trained_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC quality gate over TRAINED k-means centroids (not the
    deterministic lowest-id stand-in the oracle-checked gates use).
    Deliberately UNREGISTERED: pyspark.ml KMeans is not
    SQL-expressible, so this gate lives outside the oracle registry —
    the pytest (tests/test_pipeline_ops.py) and the 10× scale probe
    (scripts/scale_probe.py) both call it directly.

    Why it exists (r7 verdict): cell-population skew is the scale risk
    ANN actually hits — with stand-in centroids the cells are
    unbalanced, so probe cost per query is unbounded in the worst
    cell. One summary row:
      recall_vs_flat  — recall@k of IVFADC (trained cells) against the
                        flat-ADC ranking with the SAME codebooks, so
                        the number isolates the cell-restriction loss
                        from quantization error;
      n_cells / max_cell / mean_cell / balance_ratio — trained-cell
                        population stats; balance_ratio = max/mean is
                        the probe-cost bound the pytest gates."""
    from flink_1_20_spark.operators.simsearch import (
        ivf_assign,
        ivfpq_adc_topk,
        kmeans_centroids,
        pq_adc_topk,
    )

    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _RQ)
    cents = kmeans_centroids(e, "vec_id", "embedding", n_centroids=_N_CENT)
    flat = pq_adc_topk(
        q, e, "vec_id", "embedding", topk=_RK, m=_RPQM, k=_RPQK, dim=_RDIM
    ).select("query_id", F.col("cand_id").alias("neighbor_id"))
    ivfpq = ivfpq_adc_topk(
        q, e, "vec_id", "embedding",
        topk=_RK, m=_RPQM, k=_RPQK, dim=_RDIM,
        n_centroids=_N_CENT, n_probe=_N_PROBE, centroids=cents,
    ).select(
        F.col("query_id").alias("a_query"),
        F.col("cand_id").alias("a_neighbor"),
    )
    hits = (
        flat.join(
            ivfpq,
            (F.col("query_id") == F.col("a_query"))
            & (F.col("neighbor_id") == F.col("a_neighbor")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("a_neighbor").alias("n_hits"))
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.round(F.avg(F.col("n_hits") / _RK), 6).alias("recall_vs_flat"),
        )
    )
    balance = (
        ivf_assign(e, cents, "vec_id", "embedding")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.max("n").alias("max_cell"),
            F.round(F.avg("n"), 2).alias("mean_cell"),
            F.round(F.max("n") / F.avg("n"), 4).alias("balance_ratio"),
        )
    )
    return hits.crossJoin(balance)
