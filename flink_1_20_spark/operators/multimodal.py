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


def luminance_plane(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Fake-decode a document into a square-ish luminance plane: the
    pixel buffer is the text's unicode code points, with declared dims
    w = ceil(sqrt(n)), h = ceil(n/w) (the buffer is padded with zeros to
    w*h at read time). Pure codegen — stands in for the real image
    decode (PIL) this container lacks while keeping every downstream
    batch/shape/partition contract identical.

    Output: (item_id, w, h, buf array<int>)."""
    n = F.char_length(F.col(text_col))
    w = F.greatest(F.ceil(F.sqrt(n)).cast("bigint"), F.lit(1))
    return df.select(
        F.col(id_col).alias("item_id"),
        w.alias("w"),
        F.greatest(
            F.ceil(n / w.cast("double")).cast("bigint"), F.lit(1)
        ).alias("h"),
        # split('') yields the char array in ONE pass — per-index
        # substring() re-walks the UTF-8 string from the start each call
        # and turns the plane build quadratic in document length
        F.expr(f"transform(split({text_col}, ''), c -> ascii(c))").alias("buf"),
    )


def resize_nearest(
    planes: DataFrame, target_w: int, target_h: int
) -> DataFrame:
    """Nearest-neighbor resize of (w, h) luminance planes to
    (target_w, target_h) — the standard image-preprocessing step, run as
    an Arrow-batched mapInPandas with a vectorized numpy gather per
    batch (the shape a real PIL/opencv resize takes at scale: decode +
    resample inside the Python worker, partition-parallel, no shuffle).

    Source pixel for output (x, y) is (floor(x*w/tw), floor(y*h/th));
    out-of-buffer reads (the zero padding of the fake decode) yield 0.

    Output: (item_id, out_w, out_h, mean_px, px_checksum) — summary
    stats rather than the raw plane so results stay hash-comparable."""
    import numpy as np

    out_schema = (
        "item_id bigint, out_w int, out_h int, mean_px double, px_checksum bigint"
    )
    tw, th = int(target_w), int(target_h)

    # rows per vectorized slice: bounds the padded pixel matrix at
    # slice_rows * max(w*h) int32s regardless of Arrow batch size
    slice_rows = 2048

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ys, xs = np.mgrid[0:th, 0:tw]
        flat_y, flat_x = ys.ravel(), xs.ravel()
        for pdf in batches:
            if not len(pdf):
                continue
            means = np.empty(len(pdf), dtype=np.float64)
            sums = np.empty(len(pdf), dtype=np.int64)
            for lo in range(0, len(pdf), slice_rows):
                sub = pdf.iloc[lo : lo + slice_rows]
                bufs = [np.asarray(b, dtype=np.int32) for b in sub["buf"]]
                w = sub["w"].to_numpy(dtype=np.int64)
                h = sub["h"].to_numpy(dtype=np.int64)
                # one padded matrix + one gather for the whole slice:
                # padding is 0, which IS the documented out-of-buffer
                # value, so no mask is needed (src < w*h <= pad width)
                width = max(int((w * h).max()), 1)
                pad = np.zeros((len(sub), width), dtype=np.int32)
                for i, b in enumerate(bufs):
                    pad[i, : len(b)] = b
                src = (flat_y[None, :] * h[:, None] // th) * w[:, None] + (
                    flat_x[None, :] * w[:, None] // tw
                )
                px = np.take_along_axis(pad, np.minimum(src, width - 1), axis=1)
                means[lo : lo + len(sub)] = px.mean(axis=1)
                sums[lo : lo + len(sub)] = px.sum(axis=1, dtype=np.int64)
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "out_w": tw,
                    "out_h": th,
                    "mean_px": np.round(means, 6),
                    "px_checksum": sums,
                }
            )

    return planes.mapInPandas(run, schema=out_schema)


def audio_chunk_offsets(
    n_samples: int, sample_rate: float, chunk_s: float, hop_s: float
) -> list[tuple[int, int]]:
    """(start, end) sample offsets for overlapping audio chunks — the
    pure arithmetic core of audio chunking (decode itself is stubbed,
    same contract as `sample_frame_offsets`). The final chunk is kept
    even if short, so every sample lands in at least one chunk when
    hop_s <= chunk_s."""
    if sample_rate <= 0 or chunk_s <= 0 or hop_s <= 0:
        raise ValueError("sample_rate, chunk_s and hop_s must be positive")
    size, hop = int(chunk_s * sample_rate), int(hop_s * sample_rate)
    if size < 1 or hop < 1:
        # sub-sample durations truncate to 0: hop=0 would loop forever,
        # size=0 would emit empty chunks — both are caller errors
        raise ValueError("chunk_s and hop_s must span at least one sample")
    out, start = [], 0
    while start < n_samples:
        out.append((start, min(start + size, n_samples)))
        start += hop
    return out


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
