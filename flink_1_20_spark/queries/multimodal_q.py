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


# 8x8 nearest-neighbor resize over the fake-decoded luminance plane.
# mean_px = pixel_sum / 64 is a power-of-two division, so the double is
# exact and 6-decimal rounding is an identity on both engines.
_RSZ_W = _RSZ_H = 8

# flat output index k decomposes as y = k // out_w, x = k % out_w;
# the y scale divides by out_h, the x scale by out_w (they only happen
# to coincide here because the target is square)
_SRC = f"((k // {_RSZ_W}) * h // {_RSZ_H}) * w + ((k % {_RSZ_W}) * w // {_RSZ_W})"

_RESIZE_ORACLE = f"""
WITH t AS (SELECT doc_id AS item_id, greatest(length(text), 1) AS n,
                  list_transform(range(1, greatest(length(text), 1) + 1),
                                 i -> ascii(substring(text, i, 1))) AS buf
           FROM documents),
d AS (SELECT item_id, n, buf,
             greatest(CAST(ceil(sqrt(n)) AS BIGINT), 1) AS w FROM t),
e AS (SELECT *, greatest(CAST(ceil(n / CAST(w AS DOUBLE)) AS BIGINT), 1) AS h
      FROM d),
px AS (SELECT item_id,
              list_transform(range(0, {_RSZ_W * _RSZ_H}),
                k -> CASE WHEN {_SRC} < n THEN buf[{_SRC} + 1] ELSE 0 END) AS pxs
       FROM e)
SELECT item_id, CAST({_RSZ_W} AS INT) AS out_w, CAST({_RSZ_H} AS INT) AS out_h,
       round(list_sum(pxs) / {_RSZ_W * _RSZ_H}.0, 6) AS mean_px,
       CAST(list_sum(pxs) AS BIGINT) AS px_checksum
FROM px
"""


@register("multimodal_resize_nearest", oracle=_RESIZE_ORACLE)
def multimodal_resize_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-preprocessing resize: each document fake-decodes to a
    (w, h) luminance plane (code points, w = ceil(sqrt(n))), then an
    Arrow-batched mapInPandas resamples it to 8x8 with a vectorized
    numpy nearest-neighbor gather — the exact batch/shape/partition
    contract of a real PIL/opencv resize stage, with the decode swapped
    for a deterministic stand-in so the Python path is value-checked by
    a SQL oracle replaying the same resampling arithmetic.

    Scale: plane build is codegen; the resize is partition-parallel
    Python with zero shuffles — a stateless map at any corpus size."""
    from flink_1_20_spark.operators.multimodal import (
        luminance_plane,
        resize_nearest,
    )

    d = T(spark, sf_dir, "documents")
    planes = luminance_plane(d, "doc_id", "text")
    return resize_nearest(planes, _RSZ_W, _RSZ_H)
