"""Text deduplication primitives: shingling, MinHash+LSH, SimHash,
n-gram Jaccard — the operators a 100 TB training-data pipeline runs
before anything else.

Beyond-reference surface (SURVEY.md §7 M4; the reference engine stops at
relational/CEP operators — these extend the same DataFrame algebra).

Design rules:
- Everything is a built-in-function expression (md5 / conv / transform /
  aggregate / array_*) — zero Python UDFs, full whole-stage codegen.
- Hash = first 15 hex chars of md5 → 60-bit positive int. md5 is the one
  hash both Spark and DuckDB expose identically, which makes every
  operator oracle-checkable cross-engine (registry contract).
- Per-document signatures (minhash/simhash) are pure projections — no
  shuffle, no explode; the only shuffles are the final candidate-pair
  joins, which are the algorithmically-required ones (LSH bucket join /
  inverted index join).

Scale notes (100 TB):
- MinHash LSH: candidate generation is an equi-join on (band_idx,
  band_hash) — shuffle keyed by band hash, parallel across buckets. A
  hot bucket (boilerplate shingle sets) is AQE-skew-join territory;
  bucket width (rows_per_band) tunes precision vs bucket size.
- SimHash: pairs must share one of 4 signature bytes when hamming ≤ 3
  (pigeonhole) — the band join is exact, not approximate.
- n-gram Jaccard: inverted-index join on shingle; frequency-capped
  shingles (drop shingles in > F docs) bound worst-case fanout — the
  standard df-cut.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash60(col: Column) -> Column:
    """60-bit positive hash reproducible in ANSI SQL:
    Spark  conv(substring(md5(x), 1, 15), 16, 10)::bigint
    DuckDB ('0x' || substring(md5(x), 1, 15))::bigint
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def hash32(col: Column) -> Column:
    """32-bit variant (first 8 hex chars)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def normalized_words(text: Column) -> Column:
    """lowercase, strip non-alnum, split — the canonical tokenizer shared
    by every operator here (and its SQL oracles)."""
    cleaned = F.regexp_replace(F.lower(text), "[^a-z0-9 ]", " ")
    return F.filter(F.split(cleaned, "\\s+"), lambda w: w != "")


def word_shingles(words: Column, n: int) -> Column:
    """Distinct n-word shingles (space-joined). Empty array if < n words."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(0)))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(words, i, n), " "))
    return F.array_distinct(sh)


def minhash_signature(shingles: Column, num_hashes: int = 16) -> list[Column]:
    """num_hashes MinHash values, each = min over shingles of
    hash60(seed || ':' || shingle). Pure projection — no shuffle.
    Null-safe: empty shingle set → nulls (filtered by callers)."""
    return [
        F.array_min(
            F.transform(shingles, lambda s, i=i: hash60(F.concat(F.lit(f"{i}:"), s)))
        ).alias(f"mh{i}")
        for i in range(num_hashes)
    ]


def band_keys(sig_prefix: str, num_hashes: int, rows_per_band: int) -> list[Column]:
    """LSH band hashes: concat rows_per_band consecutive minhashes and
    rehash. Two docs collide on a band iff that slice of their signatures
    is identical."""
    bands = num_hashes // rows_per_band
    out = []
    for b in range(bands):
        cols = [F.col(f"{sig_prefix}{b * rows_per_band + r}") for r in range(rows_per_band)]
        joined = F.concat_ws(",", *[c.cast("string") for c in cols])
        out.append(hash60(joined).alias(f"band{b}"))
    return out


def simhash(words: Column, bits: int = 32) -> Column:
    """SimHash fingerprint: bit b set iff sum over tokens of
    (bit b of hash32(token) ? +1 : -1) > 0. Token multiplicity counts
    (classic Charikar weighting by term frequency).

    Pure expression: one aggregate() per bit over the pre-hashed token
    array — verbose plan, but all codegen, no shuffle."""
    hashes = F.transform(words, lambda w: hash32(w))

    def bit_sum(b: int):
        # closure (not default-arg) — PySpark inspects lambda arity
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1).cast("int"),
        )

    bit_sums = [bit_sum(b) for b in range(bits)]
    fp = F.lit(0).cast("bigint")
    for b, s in enumerate(bit_sums):
        fp = fp + F.when(s > 0, F.lit(2**b).cast("bigint")).otherwise(F.lit(0))
    return fp


def simhash_bands(fp: Column, n_bands: int = 4, bits: int = 32) -> list[Column]:
    """Split the fingerprint into n_bands equal bit-blocks. Pigeonhole:
    hamming(a, b) < n_bands ⇒ a and b agree on ≥ 1 block — so a join on
    any-block-equal finds EVERY pair with distance ≤ n_bands - 1 (exact
    candidate generation, not approximate)."""
    width = bits // n_bands
    mask = (1 << width) - 1
    return [
        F.shiftright(fp, b * width).bitwiseAND(F.lit(mask)).alias(f"blk{b}")
        for b in range(n_bands)
    ]


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    return inter / (F.size(a) + F.size(b) - inter)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 16,
    rows_per_band: int = 4,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH, verified with exact Jaccard.

    Plan shape: scan → project signatures (codegen) → explode bands →
    shuffle on band hash → pair join → exact-Jaccard filter. Output:
    (id_a, id_b, jaccard) with id_a < id_b, deduped across bands.
    """
    words = normalized_words(F.col(text_col))
    sh = word_shingles(words, shingle_n).alias("shingles")
    base = docs.select(F.col(id_col).alias("doc"), sh)
    base = base.filter(F.size("shingles") > 0)
    sigs = base.select("doc", "shingles", *minhash_signature(F.col("shingles"), num_hashes))
    banded = sigs.select(
        "doc", "shingles", *band_keys("mh", num_hashes, rows_per_band)
    )
    n_bands = num_hashes // rows_per_band
    # long-form (doc, band_idx, band_hash)
    band_struct = F.array(
        *[
            F.struct(F.lit(b).alias("band_idx"), F.col(f"band{b}").alias("band_hash"))
            for b in range(n_bands)
        ]
    )
    long = banded.select(
        "doc", "shingles", F.explode(band_struct).alias("bk")
    ).select("doc", "shingles", "bk.band_idx", "bk.band_hash")
    left = long.select(
        F.col("doc").alias("id_a"), F.col("shingles").alias("sh_a"), "band_idx", "band_hash"
    )
    right = long.select(
        F.col("doc").alias("id_b"), F.col("shingles").alias("sh_b"), "band_idx", "band_hash"
    )
    pairs = (
        left.join(right, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.withColumn("jac", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jac") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jac", 6).alias("jac"))
    )


def simhash_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bits: int = 32,
) -> DataFrame:
    """Near-duplicate pairs with hamming(simhash) <= max_hamming.

    Requires max_hamming < n_bands (=4) so the block join is exhaustive
    (see simhash_bands pigeonhole note)."""
    n_bands = 4
    if max_hamming >= n_bands:
        raise ValueError("max_hamming must be < 4 for exact 4-block LSH")
    words = normalized_words(F.col(text_col))
    fp = docs.select(F.col(id_col).alias("doc"), simhash(words, bits).alias("fp"))
    blk = fp.select("doc", "fp", *simhash_bands(F.col("fp"), n_bands, bits))
    block_struct = F.array(
        *[
            F.struct(F.lit(b).alias("blk_idx"), F.col(f"blk{b}").alias("blk_val"))
            for b in range(n_bands)
        ]
    )
    long = blk.select("doc", "fp", F.explode(block_struct).alias("b")).select(
        "doc", "fp", "b.blk_idx", "b.blk_val"
    )
    left = long.select(F.col("doc").alias("id_a"), F.col("fp").alias("fp_a"), "blk_idx", "blk_val")
    right = long.select(F.col("doc").alias("id_b"), F.col("fp").alias("fp_b"), "blk_idx", "blk_val")
    return (
        left.join(right, ["blk_idx", "blk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.4,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard pairs via inverted-index join (no approximation).

    shuffle 1: explode distinct shingles → join on shingle (the inverted
    index); shuffle 2: count shared shingles per pair. `max_doc_freq`
    drops shingles appearing in more docs (df-cut) to bound fanout on
    boilerplate — at 100 TB this is mandatory."""
    words = normalized_words(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("doc"), word_shingles(words, shingle_n).alias("shingles")
    ).filter(F.size("shingles") > 0)
    sizes = base.select("doc", F.size("shingles").alias("n_sh"))
    inv = base.select("doc", F.explode("shingles").alias("sh"))
    if max_doc_freq is not None:
        freq = inv.groupBy("sh").count().filter(F.col("count") <= max_doc_freq)
        inv = inv.join(freq.select("sh"), "sh")
    a = inv.select(F.col("doc").alias("id_a"), "sh")
    b = inv.select(F.col("doc").alias("id_b"), "sh")
    shared = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        shared.join(sizes.withColumnRenamed("doc", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
        .join(sizes.withColumnRenamed("doc", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
        .withColumn("jac", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jac") >= threshold)
        .select("id_a", "id_b", F.round("jac", 6).alias("jac"))
    )


def exact_dedup(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate assignment by content hash: every row gets its
    cluster's canonical (min) id. One shuffle on the 128-bit hash."""
    from pyspark.sql import Window

    h = docs.select(F.col(id_col).alias("doc"), F.md5(F.col(text_col)).alias("fingerprint"))
    w = Window.partitionBy("fingerprint")
    return h.select(
        "doc",
        "fingerprint",
        F.min("doc").over(w).alias("canonical_doc"),
        (F.col("doc") != F.min("doc").over(w)).alias("is_duplicate"),
    )
