"""Query modules — each import registers named queries + oracles.

One module per SURVEY.md §2 area; importing a module is what publishes
its queries into `flink_1_20_spark.registry`.
"""

from __future__ import annotations

import importlib

_MODULES = [
    "tpch",
    "joins",
    "setops_sort",
    "aggregates",
    "over_windows",
    "correlate_subquery",
    "functions_scalar",
    "window_tvf",
    "temporal_cep",
    "dedup_docs",
    "similarity",
    "text_analysis",
    "multimodal_q",
    "changelog_count",
    "udx",
    "misc_relational",
    "tpch_full",
    "json_aggs",
    "dedup_clusters",
    "tpcds_shapes",
    "tpcds_shapes_ext",
    "tpcds_residual",
    "governance",
    "pipeline",
    "approx_aggs",
    "range_join",
    "text_curation",
    "training_prep",
]

_loaded = False


def load() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        importlib.import_module(f"flink_1_20_spark.queries.{mod}")
    _loaded = True
