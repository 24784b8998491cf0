"""Training-data sequence packing and sliding-window chunking.

Beyond-reference surface (training-pipeline preparation, the step after
curation/dedup): turn a curated document corpus into fixed-token-budget
training sequences and into overlapping retrieval chunks.

- `greedy_pack`: first-fit-in-order bin packing — documents are scanned
  in a deterministic order inside each (group, shard) and appended to
  the current sequence until the token budget would overflow, then a new
  sequence starts. The scan is sequential BY DESIGN (the packing state
  is a running fill), so it runs as one Arrow-batched `applyInPandas`
  per group; parallelism comes from sharding, not from the scan. At
  100 TB pick enough shards that each group holds ~10^5..10^6 docs —
  packing quality only needs locality within a shard, and the shard
  count is the parallelism knob (same contract as any keyed stateful
  operator here, e.g. the CEP NFA).

- `sliding_chunks`: overlapping token windows (size W, stride S) per
  document — pure codegen (split + explode(sequence) + slice), no
  Python, no shuffle: a stateless map over the scan at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_tokens(tokens: list[int], budget: int) -> list[int]:
    """Pure greedy first-fit core: token counts in scan order → sequence
    id (1-based) per document. Shared by the Spark operator and the
    property tests."""
    seq, fill, out = 1, 0, []
    for tok in tokens:
        t = int(tok)
        if fill > 0 and fill + t > budget:
            seq += 1
            fill = 0
        fill += t
        out.append(seq)
    return out


def greedy_pack(
    docs: DataFrame,
    group_cols: list[str],
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Assign every document a training-sequence id within its group.

    First-fit-in-order: rows ordered by `order_col` inside each group;
    a row joins the current sequence iff fill + tokens <= budget, else
    it opens the next sequence (seq ids start at 1 per group). A single
    document larger than the budget gets a sequence of its own — it is
    never split (splitting is `sliding_chunks`' job).

    Output: group_cols + (order_col, tokens_col, seq_id). Deterministic
    for a given ordering — reproducible across engines and cluster
    sizes.
    """
    import pandas as pd

    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in docs.select(*group_cols, order_col, tokens_col).schema.fields
    )
    schema = f"{out_fields}, seq_id bigint"
    cols = [*group_cols, order_col, tokens_col]

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        out = pdf[cols].copy()
        out["seq_id"] = pack_tokens(list(pdf[tokens_col]), budget)
        return out

    # Pin the group partitioning: the shuffle is tiny (ids + counts) but
    # the per-group scan is Python-bound — partition for CPU, not bytes
    # (same rationale as the CEP/cogroup stages).
    parts = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select(*cols)
        .repartition(parts, *group_cols)
        .groupBy(*group_cols)
        .applyInPandas(pack, schema)
    )


def sliding_chunks(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    size: int,
    stride: int,
) -> DataFrame:
    """Split each document's whitespace tokens into overlapping windows.

    Chunk c covers tokens [c*stride, c*stride + size); chunks start at
    every stride until the start passes the last token, so every token
    is covered and consecutive chunks overlap by (size - stride). Empty
    or whitespace-only documents yield one empty chunk (chunk_idx 0) —
    the row is kept so joins back to the corpus never drop documents.

    Output: (id, chunk_idx, chunk_tokens, chunk_md5) where chunk_md5
    hashes the space-rejoined token window — a cross-engine content
    fingerprint usable directly by the exact-dedup operator to dedup at
    chunk granularity.

    Scale: split/sequence/slice/md5 are all whole-stage-codegen
    expressions; output fanout is ~n_tokens/stride rows per document and
    there is no shuffle — a stateless map over the scan.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # split('') yields [''] so n >= 1 always — every generated start
    # (0, stride, ... <= n-1) indexes a real token
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(F.col("__toks")) - F.lit(1), F.lit(0)),
        F.lit(stride),
    )
    exploded = docs.select(F.col(id_col), toks.alias("__toks")).select(
        id_col, "__toks", F.explode(starts).alias("__start")
    )
    window = F.slice(F.col("__toks"), F.col("__start") + 1, F.lit(size))
    return exploded.select(
        F.col(id_col),
        (F.col("__start") / stride).cast("bigint").alias("chunk_idx"),
        F.size(window).alias("chunk_tokens"),
        F.md5(F.array_join(window, " ")).alias("chunk_md5"),
    )
