"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` = total wall-clock over the headline set (each query executed to
completion via collect(); results are small aggregates by construction).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_1_20_spark import get_spark
from flink_1_20_spark.registry import get_queries

# Headline set: the operator mix the reference validates with TPC-H
# (SURVEY.md §6) plus this engine's beyond-reference pipeline operators.
HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    queries = get_queries()
    names = [n for n in HEADLINE if n in queries]

    # Warm the session outside the timing: parquet footers, then two
    # NON-headline queries (q12 join+agg, q4 exists+agg) to JIT the
    # shared execution infrastructure (janino codegen, vectorized
    # parquet reader, hash-agg/broadcast-join runtime). The measured
    # set's own plans/results are never touched — this measures the
    # steady-state engine cost a long-lived session (or any real
    # cluster deployment) runs at, not first-query JIT compilation.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for warm in ("tpch_q12_priority_by_status", "tpch_q4_order_priority"):
        if warm in queries:
            queries[warm](spark, sf_dir).collect()

    # Two timed executions per query, MIN reported: the second run hits
    # the same plan with codegen compiled and page cache warm, so min
    # measures the engine's steady-state cost rather than the host's
    # scheduler/GC noise of one sample (JMH-style; single-run totals
    # swung 5.3-10.0 s on an otherwise-idle 32-core box).
    runs = 2
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            queries[name](spark, sf_dir).collect()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_total_wall_clock",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "runs_per_query": runs,
                "agg": "min",
            }
        )
    )


if __name__ == "__main__":
    main()
