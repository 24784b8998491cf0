"""Multimodal column handling: opaque binary payloads + typed metadata,
processed with Arrow-batched Pandas UDFs (SURVEY.md §7 M4).

Model: image/audio/video are `binary` columns with a metadata struct
(modality, mime, width/height/duration...). Heavy per-item work (decode,
resize, feature extraction, frame sampling) runs in `mapInPandas` — one
Python process per partition, Arrow batches in/out, so the per-row
Python overhead is amortized and Spark's partitioning drives parallelism
(at 100 TB: items are hash-partitioned, each executor streams batches
through the UDF; no shuffle unless the caller groups afterwards).

The actual media decode is STUBBED (no PIL/ffmpeg in this container):
`decode_image`/`decode_audio` raise NotImplementedError unless the
optional lib imports, and `extract_features` uses a deterministic
md5-based fake featurizer so the distributed plumbing (schema, batching,
partitioning) is fully real and testable — swap `_fake_features` for a
model call in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16


def attach_fake_blob(df: DataFrame, id_col: str, text_col: str, modality: str = "image") -> DataFrame:
    """Build a binary payload column from text (test fixture — the
    documents table has no real media). Payload = utf-8 bytes; metadata
    struct mirrors a real ingest's sidecar."""
    return df.select(
        F.col(id_col).alias("item_id"),
        F.encode(F.col(text_col), "utf-8").alias("blob"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.col(text_col)).alias("n_bytes_decl"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - env-dependent
    """Real decode, gated on the optional dependency."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as e:
        raise NotImplementedError("image decode requires PIL (not in this container)") from e


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in featurizer: md5 digest bytes / 255.
    Reproducible anywhere (incl. the SQL oracle) — replaces the model
    forward pass in this container."""
    digest = hashlib.md5(payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_features(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Output: (item_id, n_bytes, content_md5, features array<double>,
    feat_checksum). Runs as mapInPandas — schema declared up front,
    batch-shaped, partition-parallel."""

    out_schema = (
        "item_id bigint, n_bytes int, content_md5 string,"
        f" features array<double>, feat_checksum double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            feats = [_fake_features(bytes(b)) for b in blobs]
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "n_bytes": [len(bytes(b)) for b in blobs],
                    "content_md5": [hashlib.md5(bytes(b)).hexdigest() for b in blobs],
                    "features": feats,
                    "feat_checksum": [round(sum(f), 6) for f in feats],
                }
            )

    return df.mapInPandas(run, schema=out_schema)


def sample_frame_offsets(duration_s: float, fps: float, every_s: float) -> list[int]:
    """Frame indices to sample every `every_s` seconds — the pure
    arithmetic core of video frame sampling (decode itself is stubbed)."""
    if every_s <= 0 or fps <= 0:
        raise ValueError("fps and every_s must be positive")
    out, t = [], 0.0
    while t < duration_s:
        out.append(int(t * fps))
        t += every_s
    return out
