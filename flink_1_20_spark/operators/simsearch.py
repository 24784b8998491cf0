"""Similarity search over embedding columns.

Beyond-reference surface (SURVEY.md §7 M4). Two tiers:

- `cosine_topk`: exact brute-force top-k — broadcast the query set,
  JVM-side dot products (zip_with/aggregate — no Python), per-query
  window top-k. At 100 TB: queries broadcast once, candidates stream
  through executors; cost is one pass over the corpus per query batch,
  the right baseline and the recall yardstick for everything below.

- `random_hyperplane_buckets` (LSH / SimHash-for-vectors): k signed
  hyperplanes → k-bit bucket id. Hyperplane weights are ±1 derived from
  md5 (deterministic — reproducible across engines and across runs,
  no stored model). Bucketing turns ANN into an equi-join on bucket id;
  probing p neighboring buckets trades recall for fanout. This is the
  scale path: shuffle keyed on bucket, each bucket's candidates
  exact-scored locally.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(x: Column, y: Column) -> Column:
    return F.aggregate(F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    round_to: int = 6,
    max_cos: float | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Output: (query_id, neighbor_id, cos, rank), rank by rounded cosine
    desc then neighbor id (total order — reproducible across engines).
    Self-matches (same id) are excluded. `max_cos` drops candidates at
    or above the given similarity before ranking (hard-negative mining's
    near-duplicate ceiling).
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    q = q.withColumn("qn", F.sqrt(_dot(F.col("qv"), F.col("qv"))))
    c = c.withColumn("cn", F.sqrt(_dot(F.col("cv"), F.col("cv"))))
    pairs = F.broadcast(q).crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    cos = F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), round_to)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    scored = pairs.withColumn("cos", cos)
    if max_cos is not None:
        # hard-negative mining: cap the similarity BEFORE ranking so
        # near-duplicates/positives never crowd out the informative
        # closest-non-duplicate candidates
        scored = scored.filter(F.col("cos") < max_cos)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def hyperplane_weights(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplanes: sign = parity of md5(f"{plane}/{dim}").
    Pure function of (plane, dim) — any engine can regenerate them."""
    return [
        [
            1 if int(hashlib.md5(f"{j}/{d}".encode()).hexdigest()[:8], 16) % 2 == 1 else -1
            for d in range(dim)
        ]
        for j in range(n_planes)
    ]


def random_hyperplane_buckets(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Assign each vector its n_planes-bit LSH bucket.

    Output: (id, bucket). Bucket bit j = 1 iff dot(v, h_j) > 0. The
    projection is a JVM expression over literal weight arrays (weights
    are broadcast inside the plan — no join, no Python)."""
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    ws = hyperplane_weights(n_planes, dim)
    v = vectors.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    bucket = F.lit(0).cast("bigint")
    for j in range(n_planes):
        w_lit = F.array(*[F.lit(float(x)) for x in ws[j]])
        proj = _dot(F.col("v"), w_lit)
        bucket = bucket + F.when(proj > 0, F.lit(2**j).cast("bigint")).otherwise(F.lit(0))
    return v.select("vid", bucket.alias("bucket"))


def cosine_pairs_blocked(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    round_to: int = 6,
) -> DataFrame:
    """All-pairs cosine ≥ threshold via block-matrix multiplication.

    One side (the full corpus) is collected, L2-normalized, and
    broadcast; each partition then computes its block's similarities to
    everything in a single BLAS GEMM inside `mapInPandas` — thousands of
    pairs per fused multiply instead of one JVM expression tree per pair
    (~10-50x over the crossJoin+zip_with formulation). Emits (id_a,
    id_b, cos) with id_a < id_b.

    Scale: this is the classic blocked similarity join — the broadcast
    side must fit in executor memory (64-dim floats: ~0.5 GB per million
    vectors). Beyond that, pre-bucket with `random_hyperplane_buckets`
    or `ivf_assign` and run this per bucket/cell.
    """
    import numpy as np

    spark = corpus.sparkSession
    src = corpus.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    rows = src.collect()
    ids = np.array([r["vid"] for r in rows], dtype=np.int64)
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, mat))

    def gen(batches):
        import pandas as pd

        all_ids, all_mat = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            block = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            block = block / np.linalg.norm(block, axis=1, keepdims=True)
            sims = block @ all_mat.T
            bi, ci = np.where(sims >= threshold)
            ia, ib = pdf["vid"].to_numpy()[bi], all_ids[ci]
            keep = ia < ib
            yield pd.DataFrame(
                {
                    "id_a": ia[keep],
                    "id_b": ib[keep],
                    "cos": np.round(sims[bi, ci][keep], round_to),
                }
            )

    return src.mapInPandas(gen, "id_a bigint, id_b bigint, cos double")


def cosine_pairs_block_join(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_blocks: int = 8,
    round_to: int = 6,
) -> DataFrame:
    """All-pairs cosine ≥ threshold, EXACT and fully distributed — no
    driver collect, no broadcast of the corpus.

    Block-nested GEMM join: vectors are hashed into `n_blocks` blocks;
    each row is replicated once per unordered block pair it belongs to
    (exactly `n_blocks` copies), shuffled on the pair key, and each of
    the B(B+1)/2 groups computes its block-vs-block similarities in one
    BLAS matmul inside `applyInPandas`. Every vector pair meets in
    exactly one group, so the output pair set is identical to the O(n²)
    join — this is candidate-complete, unlike LSH/IVF bucketing.

    Scale: replication factor is n_blocks and each group holds ~2/B of
    the corpus, so pick B with corpus_bytes * 2 / B ≲ executor memory;
    parallelism is B(B+1)/2 tasks. At 100 TB with B=128 that's 8256
    independent GEMM tasks of ~1.5 TB·2/128 each — the standard blocked
    all-pairs similarity join. For corpora that fit in one executor's
    memory, `cosine_pairs_blocked` (single pass, broadcast) is cheaper.
    """
    import numpy as np
    import pandas as pd

    src = corpus.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    tagged = src.withColumn(
        "blk", F.pmod(F.crc32(F.col("vid").cast("string")), F.lit(n_blocks)).cast("int")
    )
    others = F.array(*[F.lit(i) for i in range(n_blocks)])
    # row in block i emits once per partner block j → key (min,max): each
    # unordered block pair sees each participating row exactly once
    rep = tagged.select(
        "vid",
        "v",
        "blk",
        F.explode(others).alias("other"),
    ).select(
        "vid",
        "v",
        "blk",
        F.least("blk", "other").alias("pa"),
        F.greatest("blk", "other").alias("pb"),
    )

    out_schema = "id_a bigint, id_b bigint, cos double"

    def gemm(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cos": []})
        if not len(pdf):
            return empty
        pa, pb = int(pdf["pa"].iat[0]), int(pdf["pb"].iat[0])
        if pa == pb:
            sub = pdf.sort_values("vid")
            ids = sub["vid"].to_numpy(dtype=np.int64)
            mat = np.stack(sub["v"].to_numpy()).astype(np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ mat.T
            ai, bi = np.where(np.triu(sims >= threshold, k=1))
            ia, ib, cs = ids[ai], ids[bi], sims[ai, bi]
        else:
            a = pdf[pdf["blk"] == pa]
            b = pdf[pdf["blk"] == pb]
            if not len(a) or not len(b):
                return empty
            ids_a = a["vid"].to_numpy(dtype=np.int64)
            ids_b = b["vid"].to_numpy(dtype=np.int64)
            ma = np.stack(a["v"].to_numpy()).astype(np.float64)
            mb = np.stack(b["v"].to_numpy()).astype(np.float64)
            ma /= np.linalg.norm(ma, axis=1, keepdims=True)
            mb /= np.linalg.norm(mb, axis=1, keepdims=True)
            sims = ma @ mb.T
            ai, bi = np.where(sims >= threshold)
            xa, xb, cs = ids_a[ai], ids_b[bi], sims[ai, bi]
            ia, ib = np.minimum(xa, xb), np.maximum(xa, xb)
        return pd.DataFrame({"id_a": ia, "id_b": ib, "cos": np.round(cs, round_to)})

    # Pin the block-pair partitioning — the shuffle is small (vectors
    # replicated B×) so AQE would coalesce it under the BLAS-bound GEMM
    # stage; explicit repartition keeps one task per available core.
    parts = rep.sparkSession.sparkContext.defaultParallelism
    return rep.repartition(parts, "pa", "pb").groupBy("pa", "pb").applyInPandas(
        gemm, out_schema
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid cell (IVF
    inverted-file partitioning).

    `centroids` is small (tens..thousands) → broadcast cross join, cosine
    per (vector, centroid), argmax per vector via window. Output:
    (id, vec, norm, cell). At 100 TB the corpus streams through executors
    once; the only shuffle is the window's hash on vector id, and even
    that disappears if the corpus is already hash-partitioned by id.
    Cosine is rounded before ranking so the cell choice is reproducible
    across engines; ties break toward the smallest centroid id.
    """
    from pyspark.sql import Window

    c = corpus.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    cent = centroids.select(
        F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("cv")
    ).withColumn("cnrm", F.sqrt(_dot(F.col("cv"), F.col("cv"))))
    cos = F.round(_dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm")), round_to)
    w = Window.partitionBy("vid").orderBy(F.desc("cos_c"), F.asc("cid"))
    return (
        c.crossJoin(F.broadcast(cent))
        .withColumn("cos_c", cos)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vid", "v", "nrm", F.col("cid").alias("cell"))
    )


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    seed: int = 7,
    max_iter: int = 10,
) -> DataFrame:
    """Trained IVF centroids via distributed k-means (pyspark.ml.KMeans,
    Lloyd's over the cluster — the real centroid source for IVF at
    scale; the deterministic lowest-id stand-in in `ivf_topk` exists for
    cross-engine oracle checks). Output matches the corpus shape
    (id_col = centroid index, vec_col = centroid vector) so it drops
    into `ivf_assign`/`ivf_topk` unchanged."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(train)
    spark = corpus.sparkSession
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(rows, f"{id_col} bigint, {vec_col} array<double>")


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    round_to: int = 6,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k via an IVF index: nearest-centroid cells, probe
    the `n_probe` closest cells per query, exact cosine inside them.

    Default centroids are the `n_centroids` lowest-id corpus vectors —
    a deterministic, training-free stand-in that cross-engine oracles
    can replicate; pass `centroids=kmeans_centroids(...)` for trained
    cells (same plan shape, better recall). Mirrors the role of Flink's
    lookup partitioning (SURVEY.md §2.3) applied to ANN: the cell id is
    the shuffle key, so candidate generation is an equi-join on `cell`
    instead of a full cross join — corpus_scan + one shuffle keyed by
    cell regardless of corpus size. Recall < 1 by design; measured
    against cosine_topk in tests.
    """
    from pyspark.sql import Window

    if centroids is None:
        centroids = corpus.orderBy(F.col(id_col).asc()).limit(n_centroids)
    cells = ivf_assign(corpus, centroids, id_col, vec_col, round_to)

    cent = centroids.select(
        F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("cv")
    ).withColumn("cnrm", F.sqrt(_dot(F.col("cv"), F.col("cv"))))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    ).withColumn("qn", F.sqrt(_dot(F.col("qv"), F.col("qv"))))
    pcos = F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cnrm")), round_to)
    wp = Window.partitionBy("query_id").orderBy(F.desc("cos_c"), F.asc("cid"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("cos_c", pcos)
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "qn", F.col("cid").alias("cell"))
    )

    cand = probes.join(cells, "cell").filter(F.col("query_id") != F.col("vid"))
    cos = F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), round_to)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.withColumn("neighbor_id", F.col("vid"))
        .withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def semantic_dedup(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_centroids: int = 16,
    round_to: int = 6,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication over an embedding column.

    Vectors are partitioned into nearest-centroid cells (the IVF
    assignment), then WITHIN each cell any vector whose cosine to a
    lower-id cellmate reaches `threshold` is marked a semantic duplicate
    — one representative (the lowest id of each near-dup neighborhood)
    survives. This is the SemDeDup recipe (Abbas et al. 2023): cluster
    first so the quadratic comparison runs per-cell, never corpus-wide.

    Default centroids are the `n_centroids` lowest-id vectors (the same
    deterministic training-free stand-in as `ivf_topk`, so cross-engine
    oracles can replay the cell assignment exactly); pass
    `centroids=kmeans_centroids(...)` for trained cells.

    Output: (id, cell, keep) — one row per corpus vector.

    Plan: ONE corpus scan (cell assignment against broadcast centroids,
    vectorized GEMM in mapInPandas) + ONE shuffle keyed on cell + a
    per-cell GEMM that emits the keep verdicts directly — no self-join,
    no second pass. The cosine math mirrors the SQL oracle exactly
    (dot / (norm_a * norm_b), rounded before every comparison; argmax
    ties break to the lowest centroid id). Centroid count is the knob
    that bounds cell size (SemDeDup uses ~10^4-10^5 clusters at web
    scale; per-cell work is quadratic in |cell|, so scale n_centroids
    with the corpus — the blocked verdict GEMM keeps memory bounded
    either way); centroids are small by contract — they are collected
    and broadcast, the corpus never is. Ids must be integral (this GEMM
    path materializes them as int64; the join-based operators remain
    type-generic).
    """
    import numpy as np
    import pandas as pd

    def _round_half_away(a, decimals):
        # SQL ROUND semantics (half away from zero) — np.round is
        # half-to-even and could flip a value landing exactly on the
        # rounding boundary against the DuckDB/Spark oracles
        s = 10.0 ** decimals
        return np.copysign(np.floor(np.abs(a) * s + 0.5), a) / s

    if centroids is None:
        centroids = corpus.orderBy(F.col(id_col).asc()).limit(n_centroids)
    cent_rows = sorted(
        centroids.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        ).collect(),
        key=lambda r: r["cid"],
    )
    cids = np.array([r["cid"] for r in cent_rows], dtype=np.int64)
    cmat = np.array([r["cv"] for r in cent_rows], dtype=np.float64)
    cnrm = np.sqrt((cmat * cmat).sum(axis=1))
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((cids, cmat, cnrm))

    src = corpus.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )

    def assign(batches):
        acids, acmat, acnrm = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            nrm = np.sqrt((mat * mat).sum(axis=1))
            cos = _round_half_away((mat @ acmat.T) / np.outer(nrm, acnrm), round_to)
            # argmax returns the FIRST max — centroids sorted by cid, so
            # ties break to the lowest centroid id, same as the oracle
            cell = acids[np.argmax(cos, axis=1)]
            out = pdf[["vid", "v"]].copy()
            out["cell"] = cell
            yield out

    assigned = src.mapInPandas(
        assign, "vid bigint, v array<double>, cell bigint"
    )

    # column-block width for the verdict GEMM: task memory is bounded
    # by |cell| * block doubles instead of the full |cell|^2 matrix, so
    # an under-provisioned n_centroids degrades to slower, not to OOM
    block = 1024

    def verdict(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vid").reset_index(drop=True)
        mat = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        nrm = np.sqrt((mat * mat).sum(axis=1))
        n = len(pdf)
        dup = np.zeros(n, dtype=bool)
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            # rows 0:hi against columns lo:hi — every candidate column
            # sees all strictly-lower-id rows exactly once
            sims = _round_half_away(
                (mat[:hi] @ mat[lo:hi].T) / np.outer(nrm[:hi], nrm[lo:hi]),
                round_to,
            )
            mask = sims >= threshold
            mask &= np.arange(hi)[:, None] < np.arange(lo, hi)[None, :]
            dup[lo:hi] = mask.any(axis=0)
        return pd.DataFrame(
            {"vid": pdf["vid"], "cell": pdf["cell"], "keep": ~dup}
        )

    # partition for CPU (the GEMM is the cost), AQE-coalesce-exempt
    parts = spark.sparkContext.defaultParallelism
    return (
        assigned.repartition(parts, "cell")
        .groupBy("cell")
        .applyInPandas(verdict, "vid bigint, cell bigint, keep boolean")
        .select(F.col("vid").alias(id_col), "cell", "keep")
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_planes: int = 8,
    round_to: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's bucket,
    then exact cosine + window top-k within it. Recall < 1 by design —
    measure against cosine_topk (see tests). Pass `dim` explicitly to
    avoid the driver-side `.first()` sniff (a tiny but avoidable action
    at plan-build time)."""
    from pyspark.sql import Window

    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    ws = hyperplane_weights(n_planes, dim)

    def bucket_col(vec: Column) -> Column:
        # inline bucket expression — one scan per side, no join-back
        b = F.lit(0).cast("bigint")
        for j in range(n_planes):
            w_lit = F.array(*[F.lit(float(x)) for x in ws[j]])
            b = b + F.when(_dot(vec, w_lit) > 0, F.lit(2**j).cast("bigint")).otherwise(
                F.lit(0)
            )
        return b

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    ).withColumn("bucket", bucket_col(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    ).withColumn("bucket", bucket_col(F.col("cv")))
    pairs = q.join(c, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    qn = F.sqrt(_dot(F.col("qv"), F.col("qv")))
    cn = F.sqrt(_dot(F.col("cv"), F.col("cv")))
    cos = F.round(_dot(F.col("qv"), F.col("cv")) / (qn * cn), round_to)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _sq_dist(x: Column, y: Column) -> Column:
    """Ordered-fold squared L2 distance — left-to-right over the element
    index on BOTH engines (oracle mirrors with list_sum over the same
    order), so the doubles are bit-identical cross-engine."""
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_subvectors(df: DataFrame, id_col: str, vec_col: str, m: int, d: int) -> DataFrame:
    """(id, sub m, d-dim slice) rows — posexplode over the M subspaces."""
    subs = F.array(*[
        F.slice(F.col(vec_col).cast("array<double>"), i * d + 1, d) for i in range(m)
    ])
    return df.select(
        F.col(id_col), F.posexplode(subs).alias("m", "sv")
    )


def pq_codebooks_stand_in(
    corpus: DataFrame, id_col: str, vec_col: str, m: int, k: int, d: int
) -> DataFrame:
    """Deterministic training-free codebooks: per subspace m, the K
    centroids are the m-th subvectors of the K lowest-id corpus vectors —
    the same stand-in convention as ivf_topk, replicable by a
    cross-engine SQL oracle. For trained codebooks run pyspark.ml KMeans
    per subspace (same output shape: (m, code, cv))."""
    base = corpus.orderBy(F.col(id_col).asc()).limit(k)
    # rank the K seed vectors by id → code index 0..K-1
    from pyspark.sql import Window

    ranked = base.withColumn(
        "code", F.row_number().over(Window.orderBy(F.col(id_col).asc())) - 1
    )
    return pq_subvectors(ranked, "code", vec_col, m, d).select(
        "m", F.col("code").cast("long").alias("code"), F.col("sv").alias("cv")
    )


def pq_encode(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """Product quantization encode: split each D-dim vector into M
    subvectors, map each to its nearest codebook centroid, emit the code
    word plus reconstruction-error stats — the memory-compression layer
    a 100 TB embedding store needs (D×4 bytes → M×log2(K) bits; 64-dim
    float32 → 8 bytes at M=8, K=16).

    Plan: posexplode to (id, m) rows (×M, no shuffle), broadcast-join
    the M×K codebook, per-(id, m) argmin via window (ties → lowest
    code), then ONE groupBy(id) to fold codes and errors back in
    subspace order. The codebook is broadcast by contract (M×K×d doubles
    — a few KB); corpus scale only multiplies the exploded map side.
    Output: codes array (m-ordered), code_checksum (Σ code·K^m — BIGINT,
    hash-stable), recon_rel_err = round(√Σ dist²ₘ / ‖v‖, 6)."""
    from pyspark.sql import Window

    d = dim // m
    if codebooks is None:
        codebooks = pq_codebooks_stand_in(corpus, id_col, vec_col, m, k, d)
    subs = pq_subvectors(corpus, id_col, vec_col, m, d)
    w = Window.partitionBy(id_col, "m").orderBy(F.asc("d2"), F.asc("code"))
    assigned = (
        subs.join(F.broadcast(codebooks), "m")
        .withColumn("d2", _sq_dist(F.col("sv"), F.col("cv")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    norms = corpus.select(
        F.col(id_col),
        F.sqrt(_dot(F.col(vec_col).cast("array<double>"),
                    F.col(vec_col).cast("array<double>"))).alias("nrm"),
    )
    folded = (
        assigned.groupBy(id_col)
        .agg(F.sort_array(F.collect_list(F.struct("m", "code", "d2"))).alias("a"))
        .select(
            F.col(id_col),
            F.expr("transform(a, x -> x.code)").alias("codes"),
            # checksum folds in subspace order (sort_array on m): engine-
            # independent integer, stable under the driver value hash
            F.expr(
                f"aggregate(a, CAST(0 AS BIGINT),"
                f" (acc, x) -> acc * {k} + x.code)"
            ).alias("code_checksum"),
            F.expr(
                "aggregate(a, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.d2)"
            ).alias("err2"),
        )
        .join(norms, id_col)
        .select(
            F.col(id_col),
            "codes",
            "code_checksum",
            F.round(F.sqrt(F.col("err2")) / F.col("nrm"), 6).alias("recon_rel_err"),
        )
    )
    return folded


def pq_adc_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    topk: int = 5,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query stays exact,
    each corpus vector is its code word, and the distance is the sum of
    per-subspace (query-subvector → centroid) squared distances — the
    classic ADC lookup-table search (Jégou et al., TPAMI 2011; public
    method). At scale the per-query LUT is M×K doubles (broadcast-side
    arithmetic) and the corpus side touches only the M-byte codes: scan
    + one top-k shuffle, never the raw vectors.

    Plan here states exactly that: encode (or reuse) codes, explode the
    query LUT rows, equi-join codes on (m, code) — a broadcast of the
    per-query LUT against the code table — and fold per (query, id)."""
    from pyspark.sql import Window

    d = dim // m
    if codebooks is None:
        codebooks = pq_codebooks_stand_in(corpus, id_col, vec_col, m, k, d)
    codes = pq_encode(corpus, id_col, vec_col, m, k, dim, codebooks).select(
        F.col(id_col).alias("cand_id"), F.posexplode("codes").alias("m", "code")
    )
    lut = (
        pq_subvectors(queries, id_col, vec_col, m, d)
        .withColumnRenamed(id_col, "query_id")
        .join(F.broadcast(codebooks), "m")
        .withColumn("d2", _sq_dist(F.col("sv"), F.col("cv")))
        .select("query_id", "m", "code", "d2")
    )
    scored = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .groupBy("query_id", "cand_id")
        .agg(
            F.expr(
                "aggregate(sort_array(collect_list(struct(m, d2))),"
                " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.d2)"
            ).alias("adc_d2")
        )
        .filter(F.col("query_id") != F.col("cand_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc(F.round("adc_d2", 6)), F.asc("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id",
            "cand_id",
            F.round("adc_d2", 6).alias("adc_d2"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def ivfpq_adc_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    topk: int = 5,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    n_centroids: int = 16,
    n_probe: int = 4,
    round_to: int = 6,
    codebooks: DataFrame | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVFADC (Jégou et al., TPAMI 2011, §IV): IVF candidate restriction
    composed with ADC scoring — the standard composition for PQ search
    at corpus scale. `pq_adc_topk` alone is flat ADC: correct, but every
    query scans ALL N corpus codes (O(N·M) join rows per query). Here
    each query probes its `n_probe` nearest cells and ADC runs only over
    the codes assigned to those cells, so the corpus-side rows scale
    with the probed cells' population — not with N.

    Plan: ivf_assign gives (id → cell) in one broadcast pass; codes join
    cells on id (co-partitioned by id); probes are a broadcast argtop
    per query; candidates are the `cell` equi-join; the per-query M×K
    LUT broadcasts for the (query, m, code) score join; ONE groupBy
    (query, cand) folds the M subspace distances. Ranking convention
    (round-6 asc, cand-id tiebreak) is shared with `pq_adc_topk` so the
    two paths are directly comparable in the recall gate."""
    from pyspark.sql import Window

    d = dim // m
    if codebooks is None:
        codebooks = pq_codebooks_stand_in(corpus, id_col, vec_col, m, k, d)
    if centroids is None:
        # deterministic training-free stand-in (same as ivf_topk);
        # pass kmeans_centroids(...) for trained cells
        centroids = corpus.orderBy(F.col(id_col).asc()).limit(n_centroids)

    cells = ivf_assign(corpus, centroids, id_col, vec_col, round_to).select(
        F.col("vid").alias("cand_id"), "cell"
    )
    codes = pq_encode(corpus, id_col, vec_col, m, k, dim, codebooks).select(
        F.col(id_col).alias("cand_id"), F.posexplode("codes").alias("m", "code")
    )
    codes_cells = codes.join(cells, "cand_id")

    cent = centroids.select(
        F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("cv")
    ).withColumn("cnrm", F.sqrt(_dot(F.col("cv"), F.col("cv"))))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qn", F.sqrt(_dot(F.col("qv"), F.col("qv"))))
    pcos = F.round(
        _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cnrm")), round_to
    )
    wp = Window.partitionBy("query_id").orderBy(F.desc("cos_c"), F.asc("cid"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("cos_c", pcos)
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", F.col("cid").alias("cell"))
    )

    lut = (
        pq_subvectors(queries, id_col, vec_col, m, d)
        .withColumnRenamed(id_col, "query_id")
        .join(F.broadcast(codebooks), "m")
        .withColumn("d2", _sq_dist(F.col("sv"), F.col("cv")))
        .select("query_id", "m", "code", "d2")
    )
    scored = (
        probes.join(codes_cells, "cell")  # corpus rows ∝ probed cells only
        .join(F.broadcast(lut), ["query_id", "m", "code"])
        .groupBy("query_id", "cand_id")
        .agg(
            F.expr(
                "aggregate(sort_array(collect_list(struct(m, d2))),"
                " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.d2)"
            ).alias("adc_d2")
        )
        .filter(F.col("query_id") != F.col("cand_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc(F.round("adc_d2", 6)), F.asc("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id",
            "cand_id",
            F.round("adc_d2", 6).alias("adc_d2"),
            F.col("rank").cast("long").alias("rank"),
        )
    )
