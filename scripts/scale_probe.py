"""Scale probe: replicate the sf0.1 fixtures K× with key-shifted ids
(cardinalities scale with the data, not just row duplication), then
time the headline queries and the heavy beyond-reference operators on
the result — the local evidence that plans scale sublinearly in wall
clock rather than degrading super-linearly.

Usage:
    python scripts/scale_probe.py [--rep 10] [--dst /tmp/sfX1] [--gen]
    python scripts/scale_probe.py --run     # time the operator battery

Writes only under --dst (default /tmp/sfX1); never touches
/root/testdata.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_1_20_spark import get_spark

SRC = "/root/testdata/sf0.1"
OFF = 10_000_000  # per-replica key offset — far above any fixture key

# key columns shifted per replica so joins stay consistent WITHIN a
# replica and cardinality grows ACROSS replicas
SHIFT = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
}
COPY = ["region", "nation", "supplier", "part"]  # dims stay as-is

HEAVY = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_boilerplate_chunks",
    "text_contamination_ngram",
    "text_pii_scrub",
    "sample_stratified_exact",
    "sessionization_gap",
    "dedup_embedding_cosine",
    "simsearch_lsh_topk",
    "pipeline_corpus_curation",
    "cep_funnel_strict",
    # training-prep family (r5)
    "pipeline_sequence_pack",
    "text_chunk_sliding",
    "dedup_semantic_cells",
    "simsearch_recall_lsh",
    "multimodal_resize_nearest",
    "text_lm_score",
    # r6 additions
    "dedup_cross_corpus",
    "pipeline_train_val_test_split",
    "text_domain_mix_report",
    "embed_pq_encode",
    "simsearch_pq_adc_topk",
    "simsearch_recall_pq",
    # r7 additions
    "simsearch_ivfpq_adc_topk",
    "simsearch_recall_ivfpq",
    "dedup_cluster_best_representative",
    "pipeline_decontaminated_corpus",
    # r8 addition
    "pipeline_dsir_select",
    # r9 additions
    "dedup_exact_substring",
    "dedup_exact_substring_keep_first",
    "decontaminate_exact_substring",
    # r10 addition
    "dedup_exact_substring_tokens",
]


# ---- 100x subset (r10): one decade more evidence for the 100 TB
# design claims. Only the tables the subset battery reads are
# replicated (lineitem 60M rows, documents 500k docs; r11 adds orders
# 15M + customer 1.5M so the JOIN headliners get a second decade —
# q10's 2.6x/decade customer-side shuffle had no 100x data point); ops
# chosen per VERDICT r9 task 4 — the headliners q1/q6 plus the heaviest
# LLM ops that are not output-bound by contract (+ the r10 token-space
# form), r11 adding q3/q5/q10 per VERDICT r10 task 2.
HUNDRED_TABLES = {
    "lineitem": ["l_orderkey"],
    "documents": ["doc_id"],
    # r11: the join headliners' shuffle sides
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
}
HUNDRED_OPS = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "text_contamination_ngram",
    "pipeline_dsir_select",
    "dedup_exact_substring",
    "dedup_exact_substring_tokens",
]


def generate_hundred(spark, dst: str, rep: int = 100) -> None:
    # dims copy as-is (q3/q5/q10 read nation/region/supplier from dst)
    for t in COPY:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst}/{t}.parquet")
    for t, keys in HUNDRED_TABLES.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        r = df.crossJoin(spark.range(rep).withColumnRenamed("id", "__rep"))
        for k in keys:
            r = r.withColumn(k, F.col(k) + F.col("__rep") * OFF)
        # realistic multi-file layout (r11): the crossJoin inherits the
        # compact source's 1-2 partitions, so an un-repartitioned write
        # produced 1-2 giant files whose few splits serialized every
        # scan (the same compact-input hazard the r9/r10 text-op guard
        # fixed, here throttling the join headliners) — a real corpus
        # at this scale is thousands of files
        r.drop("__rep").repartition(64).write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
        n = spark.read.parquet(f"{dst}/{t}.parquet").count()
        print(f"generated {t} x{rep}: {n} rows")


def run_hundred(spark, dst: str) -> None:
    """Time the subset battery min-of-2 in-session (the JIT-retime
    discipline that adjudicated the r8 watch item: first run pays
    per-query JIT, min-of-2 reports steady state; both are printed)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in HUNDRED_OPS:
        times = []
        for _ in range(2):
            t0 = time.time()
            cnt = qs[name](spark, dst).count()
            times.append(time.time() - t0)
        print(
            f"{min(times):7.2f}s (cold {times[0]:7.2f}s) {cnt:9d} rows  {name}",
            flush=True,
        )


def generate(spark, dst: str, rep: int) -> None:
    for t in COPY:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst}/{t}.parquet")
    for t, keys in SHIFT.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        r = df.crossJoin(spark.range(rep).withColumnRenamed("id", "__rep"))
        for k in keys:
            r = r.withColumn(k, F.col(k) + F.col("__rep") * OFF)
        # multi-file layout, same rationale as generate_hundred (r11)
        r.drop("__rep").repartition(64).write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
        n = spark.read.parquet(f"{dst}/{t}.parquet").count()
        print(f"generated {t}: {n} rows")


def run(spark, dst: str) -> None:
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in HEAVY:
        t0 = time.time()
        cnt = qs[name](spark, dst).count()
        print(f"{time.time() - t0:7.2f}s {cnt:9d} rows  {name}", flush=True)
    # r8: trained-centroid IVFADC gate — unregistered (k-means is not
    # SQL-expressible, so it has no oracle), probed here for scale and
    # for the recall/balance numbers at 10x
    from flink_1_20_spark.queries.training_prep import ivfpq_trained_gate

    t0 = time.time()
    row = ivfpq_trained_gate(spark, dst).collect()[0]
    print(
        f"{time.time() - t0:7.2f}s {1:9d} rows  ivfpq_trained_gate "
        f"(recall_vs_flat={row['recall_vs_flat']}, "
        f"balance_ratio={row['balance_ratio']})",
        flush=True,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    # defaults resolve per mode (None sentinel — an EXPLICIT --rep 10
    # with --hundred must stay 10, not silently become 100)
    ap.add_argument("--rep", type=int, default=None)
    ap.add_argument("--dst", default=None)
    ap.add_argument("--gen", action="store_true")
    ap.add_argument("--run", action="store_true")
    ap.add_argument(
        "--hundred",
        action="store_true",
        help="100x subset mode: lineitem+documents only, subset battery "
        "(default --rep 100, --dst /tmp/sfX2)",
    )
    args = ap.parse_args()
    spark = get_spark("scale-probe")
    if args.hundred:
        rep = args.rep if args.rep is not None else 100
        dst = args.dst if args.dst is not None else "/tmp/sfX2"
        if args.gen or not (args.gen or args.run):
            generate_hundred(spark, dst, rep)
        if args.run or not (args.gen or args.run):
            run_hundred(spark, dst)
        return
    rep = args.rep if args.rep is not None else 10
    dst = args.dst if args.dst is not None else "/tmp/sfX1"
    if args.gen or not (args.gen or args.run):
        generate(spark, dst, rep)
    if args.run or not (args.gen or args.run):
        run(spark, dst)


if __name__ == "__main__":
    main()
