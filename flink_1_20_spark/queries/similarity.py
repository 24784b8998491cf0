"""Similarity-search queries over the embeddings table (SURVEY.md §7 M4).

- brute-force cosine top-k (exact baseline + recall yardstick)
- random-hyperplane LSH bucketing (the 100 TB scale path)

Oracles regenerate the identical math in DuckDB — including the
md5-derived hyperplane weights, embedded as literal arrays in the SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_20_spark.operators.simsearch import (
    cosine_topk,
    hyperplane_weights,
    ivf_topk,
    random_hyperplane_buckets,
)
from flink_1_20_spark.registry import register

from ._util import T

_K = 5
_N_QUERIES = 20  # vec_id < 20 are the query set

# Shared oracle CTE fragments — the single source of truth for the
# ranking convention (rounding, tie-break, query-set predicate). The
# top-k oracles here AND the recall oracle in training_prep.py compose
# from these, so the convention can never silently diverge between the
# measured path and its yardstick.
V_CTE = """v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
                  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                        CAST(embedding AS DOUBLE[]))) AS nrm
           FROM embeddings)"""


def bf_ranked_block(q: str = "q", pairs: str = "pairs", ranked: str = "ranked") -> str:
    """Brute-force ranked-pairs CTE block (names parameterizable so two
    blocks can share one WITH clause)."""
    return f"""{q} AS (SELECT * FROM v WHERE vec_id < {_N_QUERIES}),
{pairs} AS (SELECT {q}.vec_id AS query_id, c.vec_id AS neighbor_id,
                 round(list_dot_product({q}.emb, c.emb) / ({q}.nrm * c.nrm), 6) AS cos
          FROM {q}, v c WHERE {q}.vec_id <> c.vec_id),
{ranked} AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, neighbor_id) AS rank
           FROM {pairs})"""


_TOPK_ORACLE = f"""
WITH {V_CTE},
{bf_ranked_block()}
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {_K}
"""


@register("simsearch_topk_bruteforce", oracle=_TOPK_ORACLE)
def simsearch_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 20 query vectors: broadcast queries ×
    corpus scan, JVM dot products, per-query window top-k. Rank order is
    total (rounded cos desc, neighbor id) so results are reproducible."""
    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    return cosine_topk(q, e, "vec_id", "embedding", k=_K)


_N_PLANES, _DIM = 8, 64
_WS = hyperplane_weights(_N_PLANES, _DIM)


def _bucket_sql() -> str:
    terms = []
    for j in range(_N_PLANES):
        arr = "[" + ", ".join(f"{float(x):.1f}" for x in _WS[j]) + "]::DOUBLE[]"
        terms.append(
            f"CASE WHEN list_dot_product(emb, {arr}) > 0"
            f" THEN CAST({2 ** j} AS BIGINT) ELSE 0 END"
        )
    return " + ".join(terms)


_LSH_ORACLE = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
b AS (SELECT vec_id, ({_bucket_sql()}) AS bucket FROM v)
SELECT bucket, count(*) AS n_vecs, min(vec_id) AS min_vec
FROM b GROUP BY bucket
"""


@register("simsearch_lsh_buckets", oracle=_LSH_ORACLE)
def simsearch_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket assignment (8 planes → 256 buckets)
    + occupancy histogram. Deterministic md5-derived ±1 hyperplanes —
    the oracle embeds the same weights as SQL literals. At scale, ANN
    becomes an equi-join on `bucket` (see operators/simsearch.lsh_topk)."""
    e = T(spark, sf_dir, "embeddings")
    b = random_hyperplane_buckets(e, "vec_id", "embedding", n_planes=_N_PLANES, dim=_DIM)
    return b.groupBy("bucket").agg(
        F.count("*").alias("n_vecs"), F.min("vid").alias("min_vec")
    )


_N_CENT, _N_PROBE = 16, 4


def ivf_ranked_block(
    cent: str = "cent",
    assign: str = "assign",
    cells: str = "cells",
    q: str = "q",
    probe: str = "probe",
    cand: str = "cand",
    ranked: str = "ranked",
) -> str:
    """IVF index-build + probe ranked-pairs CTE block (names
    parameterizable so two blocks can share one WITH clause)."""
    return f"""{cent} AS (SELECT vec_id AS cid, emb AS cv, nrm AS cnrm
         FROM v ORDER BY vec_id LIMIT {_N_CENT}),
{assign} AS (SELECT v.vec_id, v.emb, v.nrm, {cent}.cid,
                  row_number() OVER (
                    PARTITION BY v.vec_id
                    ORDER BY round(list_dot_product(v.emb, {cent}.cv)
                                   / (v.nrm * {cent}.cnrm), 6) DESC, {cent}.cid
                  ) AS rn
           FROM v, {cent}),
{cells} AS (SELECT vec_id, emb, nrm, cid AS cell FROM {assign} WHERE rn = 1),
{q} AS (SELECT vec_id AS query_id, emb AS qv, nrm AS qn
      FROM v WHERE vec_id < {_N_QUERIES}),
{probe} AS (SELECT {q}.query_id, {q}.qv, {q}.qn, {cent}.cid AS cell,
                 row_number() OVER (
                   PARTITION BY {q}.query_id
                   ORDER BY round(list_dot_product({q}.qv, {cent}.cv)
                                  / ({q}.qn * {cent}.cnrm), 6) DESC, {cent}.cid
                 ) AS rn
          FROM {q}, {cent}),
{cand} AS (SELECT p.query_id, c.vec_id AS neighbor_id,
                round(list_dot_product(p.qv, c.emb) / (p.qn * c.nrm), 6) AS cos
         FROM {probe} p JOIN {cells} c ON p.cell = c.cell
         WHERE p.rn <= {_N_PROBE} AND p.query_id <> c.vec_id),
{ranked} AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, neighbor_id) AS rank
           FROM {cand})"""


_IVF_ORACLE = f"""
WITH {V_CTE},
{ivf_ranked_block()}
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {_K}
"""


@register("simsearch_ivf_topk", oracle=_IVF_ORACLE)
def simsearch_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus partitioned into
    nearest-centroid cells, each query probes its 4 closest cells, exact
    cosine inside them. Centroids = 16 lowest-id vectors (deterministic,
    training-free — same plan shape as k-means IVF). Candidate generation
    is an equi-join on `cell`, so at 100 TB the cost is one corpus pass +
    one shuffle keyed by cell — never a cross join. Oracle replays the
    identical index build + probe in DuckDB CTEs."""
    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    return ivf_topk(
        q, e, "vec_id", "embedding", k=_K, n_centroids=_N_CENT, n_probe=_N_PROBE
    )


def lsh_ranked_block(
    b: str = "b",
    q: str = "q",
    c: str = "c",
    pairs: str = "pairs",
    ranked: str = "ranked",
) -> str:
    """LSH bucket-restricted ranked-pairs CTE block (shares the md5
    hyperplane literals via `_bucket_sql`)."""
    return f"""{b} AS (SELECT vec_id, ({_bucket_sql()}) AS bucket FROM v),
{q} AS (SELECT v.vec_id AS query_id, v.emb AS qv, v.nrm AS qn, {b}.bucket
      FROM v JOIN {b} USING (vec_id) WHERE v.vec_id < {_N_QUERIES}),
{c} AS (SELECT v.vec_id AS neighbor_id, v.emb AS cv, v.nrm AS cn, {b}.bucket
      FROM v JOIN {b} USING (vec_id)),
{pairs} AS (SELECT {q}.query_id, {c}.neighbor_id,
                 round(list_dot_product({q}.qv, {c}.cv) / ({q}.qn * {c}.cn), 6) AS cos
          FROM {q} JOIN {c} USING (bucket)
          WHERE {q}.query_id <> {c}.neighbor_id),
{ranked} AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, neighbor_id) AS rank
           FROM {pairs})"""


_LSH_TOPK_ORACLE = f"""
WITH {V_CTE},
{lsh_ranked_block()}
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {_K}
"""


@register("simsearch_lsh_topk", oracle=_LSH_TOPK_ORACLE)
def simsearch_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k with candidates restricted to the query's LSH
    bucket (the scale path end-to-end: bucket equi-join replaces the
    cross join, then exact cosine + window top-k inside the bucket).
    Deterministic md5 hyperplanes → the oracle rebuilds the identical
    buckets as SQL literals and replays the same candidate join."""
    from flink_1_20_spark.operators.simsearch import lsh_topk

    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    return lsh_topk(q, e, "vec_id", "embedding", k=_K, n_planes=_N_PLANES, dim=_DIM)


_QUANT_ORACLE = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
s AS (SELECT vec_id, emb,
             CASE WHEN list_max(list_transform(emb, x -> abs(x))) = 0 THEN 1.0
                  ELSE list_max(list_transform(emb, x -> abs(x))) / 127 END AS scale
      FROM v),
e AS (SELECT vec_id, scale,
             list_transform(emb, x -> abs(x - floor(x / scale + 0.5) * scale)) AS errs,
             list_aggregate(list_transform(emb,
                 x -> CAST(floor(x / scale + 0.5) AS BIGINT)), 'sum') AS checksum,
             len(emb) AS dim
      FROM s)
SELECT vec_id,
       round(scale, 6) AS scale,
       round(list_max(errs), 6) AS max_err,
       round(list_aggregate(errs, 'sum') / dim, 6) AS mean_err,
       CAST(checksum AS BIGINT) AS checksum
FROM e
"""


@register("embed_quantize_int8", oracle=_QUANT_ORACLE)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 quantization of the embedding column —
    the storage/serving compression step of an embedding pipeline:
    scale = max|x|/127, q_i = floor(x_i/scale + 0.5) (explicit half-up,
    bit-identical on both engines), plus reconstruction-error stats and
    an integer checksum over the quantized codes.

    Scale: pure higher-order array expressions (transform/aggregate) —
    JVM-side, no Python, no shuffle; at 100 TB this is a stateless
    map over the scan."""
    e = T(spark, sf_dir, "embeddings")
    emb = F.expr("transform(cast(embedding AS array<double>), x -> x)")
    out = e.select("vec_id", emb.alias("emb"))
    out = out.withColumn(
        "scale",
        F.expr(
            "CASE WHEN array_max(transform(emb, x -> abs(x))) = 0 THEN 1.0D "
            "ELSE array_max(transform(emb, x -> abs(x))) / 127 END"
        ),
    ).withColumn(
        "errs",
        F.expr("transform(emb, x -> abs(x - floor(x / scale + 0.5) * scale))"),
    )
    return out.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.round(F.expr("array_max(errs)"), 6).alias("max_err"),
        F.round(
            F.expr("aggregate(errs, 0D, (acc, x) -> acc + x) / size(errs)"), 6
        ).alias("mean_err"),
        F.expr(
            "aggregate(transform(emb, x -> CAST(floor(x / scale + 0.5) AS BIGINT)),"
            " 0L, (acc, x) -> acc + x)"
        ).alias("checksum"),
    )


_HARD_NEG_ORACLE = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
                  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                        CAST(embedding AS DOUBLE[]))) AS nrm
           FROM embeddings),
q AS (SELECT * FROM v WHERE vec_id < {_N_QUERIES}),
pairs AS (SELECT q.vec_id AS query_id, c.vec_id AS negative_id,
                 round(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 6) AS cos
          FROM q, v c WHERE q.vec_id <> c.vec_id),
ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, negative_id) AS rank
           FROM pairs WHERE cos < 0.95)
SELECT query_id, negative_id, cos, rank FROM ranked WHERE rank <= {_K}
"""


@register("simsearch_hard_negatives", oracle=_HARD_NEG_ORACLE)
def simsearch_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the k most-similar corpus vectors whose cosine stays BELOW
    a near-duplicate ceiling (0.95) — the closest non-duplicates, which
    are the informative negatives; unfiltered top-k would return
    positives/near-dups, uniformly random negatives carry no signal.

    Plan: identical shape to the brute-force top-k (broadcast queries,
    JVM dot products, per-query window rank) plus one codegen filter —
    at 100 TB swap the candidate scan for the LSH/IVF bucket join like
    simsearch_lsh_topk, the mining logic is unchanged."""
    from flink_1_20_spark.operators.simsearch import cosine_topk

    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    scored = cosine_topk(
        q, e, "vec_id", "embedding", k=_K, max_cos=0.95
    )
    return scored.withColumnRenamed("neighbor_id", "negative_id")


# ------------------------------------------------------------- PQ family
# Product quantization (Jégou et al., TPAMI 2011 — public method): the
# memory-compression layer of ANN at 100 TB. Stand-in codebooks follow
# the IVF convention (per subspace, the m-th subvectors of the K
# lowest-id corpus vectors) so a SQL oracle replays them exactly.
_PQ_M, _PQ_K, _PQ_D = 8, 16, 8  # 64-dim → 8 subspaces of 8 dims, 16 codes

def pq_code_block(emb: str = "e", p: str = "") -> str:
    """PQ CTE chain (stand-in codebooks → per-subspace argmin codes),
    parameterized by the vector column name and a CTE-name prefix so it
    composes into the shared recall scaffold without clashing with
    V_CTE. Single source of truth for the PQ convention."""
    return f"""{p}seeds AS (SELECT {emb}, row_number() OVER (ORDER BY vec_id) - 1 AS code
          FROM (SELECT * FROM v ORDER BY vec_id LIMIT {_PQ_K}) t),
{p}ms AS (SELECT unnest(range(0, {_PQ_M})) AS m),
{p}cb AS (SELECT m, code, {emb}[m*{_PQ_D}+1 : m*{_PQ_D}+{_PQ_D}] AS cv
       FROM {p}seeds, {p}ms),
{p}subs AS (SELECT vec_id, m, {emb}[m*{_PQ_D}+1 : m*{_PQ_D}+{_PQ_D}] AS sv
         FROM v, {p}ms),
{p}dists AS (SELECT s.vec_id, s.m, cb.code,
        list_sum(list_transform(range(1, {_PQ_D} + 1),
          i -> (s.sv[i] - cb.cv[i]) * (s.sv[i] - cb.cv[i]))) AS d2
      FROM {p}subs s JOIN {p}cb cb ON s.m = cb.m),
{p}best AS (SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                      ORDER BY d2 ASC, code ASC) AS rn
         FROM {p}dists)"""


def pq_adc_ranked_block(emb: str = "e", p: str = "") -> str:
    """ADC ranked-pairs CTE chain on top of pq_code_block — emits
    (query_id, neighbor_id, rank) in the shared ranking convention so
    the recall scaffold can consume it directly."""
    return f"""{pq_code_block(emb, p)},
{p}q AS (SELECT vec_id AS query_id, m, sv FROM {p}subs
      WHERE vec_id < {_N_QUERIES}),
{p}lut AS (SELECT q.query_id, cb.m, cb.code,
          list_sum(list_transform(range(1, {_PQ_D} + 1),
            i -> (q.sv[i] - cb.cv[i]) * (q.sv[i] - cb.cv[i]))) AS d2
        FROM {p}q q JOIN {p}cb cb ON q.m = cb.m),
{p}adc AS (SELECT l.query_id, b.vec_id AS neighbor_id,
          list_sum(list(l.d2 ORDER BY l.m)) AS adc_d2
        FROM {p}best b JOIN {p}lut l ON b.m = l.m AND b.code = l.code
        WHERE b.rn = 1 AND l.query_id <> b.vec_id
        GROUP BY l.query_id, b.vec_id),
{p}ranked AS (SELECT query_id, neighbor_id, round(adc_d2, 6) AS adc_d2,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY round(adc_d2, 6) ASC, neighbor_id ASC)
             AS rank
           FROM {p}adc)"""


_PQ_BASE_CTES = (
    "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),\n"
    + pq_code_block()
)

_PQ_ENCODE_ORACLE = f"""
WITH {_PQ_BASE_CTES},
agg AS (SELECT vec_id,
               coalesce(array_to_string(list(code ORDER BY m), ','), '') AS codes,
               CAST(sum(code * power({_PQ_K}, {_PQ_M} - 1 - m)) AS BIGINT)
                 AS code_checksum,
               list_sum(list(d2 ORDER BY m)) AS err2
        FROM best WHERE rn = 1 GROUP BY vec_id),
n AS (SELECT vec_id, sqrt(list_dot_product(e, e)) AS nrm FROM v)
SELECT a.vec_id, a.codes, a.code_checksum,
       round(sqrt(a.err2) / n.nrm, 6) AS recon_rel_err
FROM agg a JOIN n USING (vec_id)
"""


@register("embed_pq_encode", oracle=_PQ_ENCODE_ORACLE)
def embed_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encode of the embedding corpus (64-dim float → 8 4-bit codes):
    per-vector code word, order-folded integer checksum, and relative
    reconstruction error. Plan: ×M posexplode (map-side), broadcast M×K
    codebook join, per-(id, m) window argmin, ONE shuffle on id to fold
    codes back — corpus scale only widens the map side."""
    from flink_1_20_spark.operators.simsearch import pq_encode

    e = T(spark, sf_dir, "embeddings")
    enc = pq_encode(e, "vec_id", "embedding", m=_PQ_M, k=_PQ_K, dim=_DIM)
    # the operator's codes column stays a real array (the API); the
    # QUERY renders it canonically — no oracle has ever been
    # driver-confirmed with a list-typed column, and every untested
    # dtype class so far (HUGEINT, DECIMAL) failed the driver hash
    from ._util import canon_join

    return enc.select(
        "vec_id",
        canon_join("codes").alias("codes"),
        "code_checksum",
        "recon_rel_err",
    )


# composed from the SAME ranked block the recall gate consumes — one
# source of truth for the ADC convention (rounding, tie-break, query
# predicate); only the output column name differs (cand_id)
_PQ_ADC_ORACLE = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
{pq_adc_ranked_block()}
SELECT query_id, neighbor_id AS cand_id, adc_d2, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {_K}
"""


@register("simsearch_pq_adc_topk", oracle=_PQ_ADC_ORACLE)
def simsearch_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance top-5 over PQ codes for the 20 query vectors:
    queries stay exact, corpus vectors are their code words, distance =
    Σₘ LUT[m][code]. At scale the per-query LUT (M×K doubles) broadcasts
    and the corpus side touches only the codes — the raw vectors never
    re-scan. Rank is total (rounded adc asc, cand id) for
    reproducibility."""
    from flink_1_20_spark.operators.simsearch import pq_adc_topk

    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    return pq_adc_topk(q, e, "vec_id", "embedding", topk=_K, m=_PQ_M, k=_PQ_K, dim=_DIM)


def ivfpq_adc_ranked_block(emb: str = "e", p: str = "ip_") -> str:
    """IVFADC ranked-pairs CTE chain: pq_code_block for the codes +
    the IVF cell/probe restriction + ADC scoring ONLY inside probed
    cells — the oracle replay of operators/simsearch.ivfpq_adc_topk.
    Emits {p}ranked in the shared ranking convention."""
    return f"""{pq_code_block(emb, p)},
{p}cent AS (SELECT vec_id AS cid, {emb} AS cv,
                 sqrt(list_dot_product({emb}, {emb})) AS cnrm
          FROM (SELECT * FROM v ORDER BY vec_id LIMIT {_N_CENT}) t),
{p}vn AS (SELECT vec_id, {emb} AS vv,
               sqrt(list_dot_product({emb}, {emb})) AS vnrm FROM v),
{p}assign AS (SELECT n.vec_id, c.cid,
                   row_number() OVER (
                     PARTITION BY n.vec_id
                     ORDER BY round(list_dot_product(n.vv, c.cv)
                                    / (n.vnrm * c.cnrm), 6) DESC, c.cid
                   ) AS rn
            FROM {p}vn n, {p}cent c),
{p}cells AS (SELECT vec_id, cid AS cell FROM {p}assign WHERE rn = 1),
{p}probe AS (SELECT q.vec_id AS query_id, c.cid AS cell,
                  row_number() OVER (
                    PARTITION BY q.vec_id
                    ORDER BY round(list_dot_product(q.vv, c.cv)
                                   / (q.vnrm * c.cnrm), 6) DESC, c.cid
                  ) AS rn
           FROM {p}vn q, {p}cent c WHERE q.vec_id < {_N_QUERIES}),
{p}qs AS (SELECT vec_id AS query_id, m, sv FROM {p}subs
       WHERE vec_id < {_N_QUERIES}),
{p}lut AS (SELECT q.query_id, cb.m, cb.code,
          list_sum(list_transform(range(1, {_PQ_D} + 1),
            i -> (q.sv[i] - cb.cv[i]) * (q.sv[i] - cb.cv[i]))) AS d2
        FROM {p}qs q JOIN {p}cb cb ON q.m = cb.m),
{p}adc AS (SELECT l.query_id, b.vec_id AS neighbor_id,
          list_sum(list(l.d2 ORDER BY l.m)) AS adc_d2
        FROM {p}best b
        JOIN {p}cells ce ON b.vec_id = ce.vec_id
        JOIN {p}probe pr ON pr.cell = ce.cell AND pr.rn <= {_N_PROBE}
        JOIN {p}lut l ON b.m = l.m AND b.code = l.code
                     AND l.query_id = pr.query_id
        WHERE b.rn = 1 AND l.query_id <> b.vec_id
        GROUP BY l.query_id, b.vec_id),
{p}ranked AS (SELECT query_id, neighbor_id, round(adc_d2, 6) AS adc_d2,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY round(adc_d2, 6) ASC, neighbor_id ASC)
             AS rank
           FROM {p}adc)"""


_IVFPQ_ADC_ORACLE = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
{ivfpq_adc_ranked_block()}
SELECT query_id, neighbor_id AS cand_id, adc_d2, CAST(rank AS BIGINT) AS rank
FROM ip_ranked WHERE rank <= {_K}
"""


@register("simsearch_ivfpq_adc_topk", oracle=_IVFPQ_ADC_ORACLE)
def simsearch_ivfpq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC top-5 (Jégou et al., TPAMI 2011 §IV): IVF probe
    restriction composed with ADC code scoring — the 100 TB composition
    of the two existing paths. Flat ADC scans all N codes per query;
    here the corpus side of the score join is only the codes in each
    query's 4 probed cells. The oracle replays the identical cells →
    probes → LUT → fold chain in DuckDB CTEs."""
    from flink_1_20_spark.operators.simsearch import ivfpq_adc_topk

    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    return ivfpq_adc_topk(
        q, e, "vec_id", "embedding",
        topk=_K, m=_PQ_M, k=_PQ_K, dim=_DIM,
        n_centroids=_N_CENT, n_probe=_N_PROBE,
    )
