"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched Pandas UDFs.

The container has no image/audio libraries, so the decode kernels are
STUBBED: ``decode_image`` raises NotImplementedError unless
``fake=True`` (deterministic fake decoder for pipeline testing). Everything
Spark-side is real and load-bearing at 100 TB:

- schema: content binary + media_type + typed metadata struct;
- processing via ``mapInPandas`` (Arrow batches; one Python worker per
  partition, batch-at-a-time — the only sane shape for multi-MB blobs);
- partition sizing guidance: blobs make rows heavy — repartition by byte
  budget, not row count (``repartition_for_blobs``).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType()),      # 'image/png', 'audio/wav', ...
    T.StructField("content", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ])),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("content_hash", T.StringType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])


def _fake_decode(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake feature extractor: hash-derived unit vector.
    Stands in for a real decode→model pipeline; same signature, same batch
    shape, so swapping in a real kernel changes nothing Spark-side."""
    h = hashlib.sha256(content or b"").digest()
    vec = [h[i] / 255.0 for i in range(dim)]
    norm = sum(x * x for x in vec) ** 0.5 or 1.0
    return [x / norm for x in vec]


def extract_image_features(df: DataFrame, fake: bool = True, dim: int = 8) -> DataFrame:
    """content → feature vector via mapInPandas (Arrow batch transfer).

    With a real image stack installed, replace the kernel body; the
    mapInPandas contract (iterator of pandas batches in, iterator out) and
    the output schema stay identical.
    """
    if not fake:
        raise NotImplementedError(
            "real image decode requires an image library not present in this "
            "container; use fake=True for pipeline testing")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                "content_hash": pdf["content"].map(
                    lambda b: hashlib.md5(b or b"").hexdigest()),
                "features": pdf["content"].map(lambda b: _fake_decode(b, dim)),
            })

    return df.mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (explode on the
    Python side — frame extraction is inherently in-kernel)."""
    if not fake:
        raise NotImplementedError("real frame extraction requires a video library")

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame_hash", T.StringType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                dur = (r["meta"]["duration_ms"] if r["meta"] is not None else None) or 0
                n = max(int(dur // every_ms), 1)
                for i in range(n):
                    rows.append({
                        "media_id": r["media_id"],
                        "frame_idx": i,
                        "frame_ts_ms": i * every_ms,
                        "frame_hash": hashlib.md5(
                            (r["content"] or b"") + i.to_bytes(4, "little")).hexdigest(),
                    })
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_ts_ms", "frame_hash"])

    return df.mapInPandas(kernel, out_schema)


def repartition_for_blobs(df: DataFrame, target_bytes_per_partition: int = 256 << 20,
                          size_col: str = "n_bytes") -> DataFrame:
    """Partition by byte budget: heavy binary rows make row-count-based
    partitioning wildly skewed. Computes total size, derives partition count."""
    total = df.agg(F.coalesce(F.sum(size_col), F.lit(0)).alias("t")).collect()[0]["t"]
    n = max(int(total // target_bytes_per_partition) + 1, 1)
    return df.repartition(n)
