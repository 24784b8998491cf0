"""Multimodal pipeline query: binary payloads → Arrow-batched feature
extraction (SURVEY.md §7 M4).

The featurizer is the deterministic md5 stub, so even the Pandas-UDF
path is oracle-checked: DuckDB recomputes the md5-digest-derived
features in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_20_spark.operators.multimodal import FEATURE_DIM, attach_fake_blob, extract_features
from flink_1_20_spark.registry import register

from ._util import T

# features[i] = byte i of md5 digest / 255; checksum = round(sum, 6)
_FEAT_SUM = (
    "list_sum(list_transform(range(0, " + str(FEATURE_DIM) + "),"
    " i -> CAST(('0x' || substring(md5(text), i * 2 + 1, 2)) AS INT) / 255.0))"
)

_MM_ORACLE = (
    "SELECT doc_id AS item_id,\n"
    "       length(text) AS n_bytes,\n"
    "       md5(text) AS content_md5,\n"
    "       round(" + _FEAT_SUM + ", 6) AS feat_checksum\n"
    "FROM documents"
)


@register("multimodal_features", oracle=_MM_ORACLE)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction via mapInPandas (deterministic
    stub featurizer — real decode is gated, see operators/multimodal).
    Text bytes are ASCII here so length(text) == n_bytes."""
    d = T(spark, sf_dir, "documents")
    blobs = attach_fake_blob(d, "doc_id", "text")
    out = extract_features(blobs)
    return out.select("item_id", "n_bytes", "content_md5", "feat_checksum")
