"""Multimodal column plumbing (north-star extension).

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct; transforms are Arrow-batched ``mapInPandas`` stages, so the
Spark-side shape (schema, partitioning, batch iteration) is exactly
what a production decode would use. The actual codecs are NOT in this
image, so the decode kernels are deterministic fakes / explicit
NotImplementedError stubs, clearly marked — the plumbing is real and
tested (tests/test_multimodal.py).

At 100 TB: media bytes dominate row size. The rules encoded here:
- keep binary columns OUT of shuffle keys; shuffle only (id, metadata)
  and rejoin by id when regrouping is unavoidable;
- mapInPandas processes Arrow batches — per-batch decode amortizes
  Python crossing costs; ``spark.sql.execution.arrow.maxRecordsPerBatch``
  controls decode memory;
- metadata (width/height/duration/codec) lives in a plain struct so
  pruning/filtering (e.g. "only frames > 720p") pushes down without
  touching bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", MEDIA_META, False),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content_sha", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from the
    id (stands in for real image/audio blobs)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 7)
        rows.append(
            (
                i,
                bytearray(payload),
                (
                    "image" if i % 3 == 0 else ("audio" if i % 3 == 1 else "video"),
                    ["png", "wav", "mp4"][i % 3],
                    64 + (i % 8) * 32 if i % 3 == 0 else None,
                    64 + (i % 5) * 32 if i % 3 == 0 else None,
                    1000 * (i % 30) if i % 3 != 0 else None,
                    len(payload),
                ),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def content_sha(payload: bytes) -> str:
    """Content hash over the LOWERCASE-HEX encoding of the payload —
    hex-normalized so every engine with a string sha256 (DuckDB included)
    computes the identical value, making the multimodal extract
    oracle-checkable."""
    return hashlib.sha256(payload.hex().encode()).hexdigest()


def _fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """STUB decode kernel (codecs not in this container): deterministic
    pseudo-features from the content digest. A real deployment replaces
    this body with PIL/librosa/ffmpeg decoding — signature, batch shape
    and schema stay identical."""
    digest = bytes.fromhex(content_sha(payload))
    return [digest[j] / 255.0 for j in range(dim)]


def extract_features(media: DataFrame, batch_size_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over the binary payloads."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content_sha": [
                        content_sha(bytes(p)) for p in pdf["payload"]
                    ],
                    "features": [
                        _fake_decode_features(bytes(p)) for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(decode_batches, FEATURES_SCHEMA)


def decode_image(media: DataFrame) -> DataFrame:
    """Image decode -> pixel tensors. NOT IMPLEMENTED in this image
    (no PIL/opencv); the method exists so the API surface is complete
    and the error is explicit rather than a missing attribute."""
    raise NotImplementedError(
        "image decode requires PIL/opencv, which are not installed in "
        "this container; use extract_features (deterministic fake) for "
        "pipeline plumbing"
    )


def resize_metadata(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Metadata-only 'resize' planning: computes target dimensions from
    the typed struct WITHOUT touching payload bytes — demonstrates
    metadata pushdown (the filter/projection never deserializes the
    binary column)."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.when(
        (w.isNotNull()) & (h.isNotNull()) & (F.greatest(w, h) > max_side),
        F.lit(max_side) / F.greatest(w, h).cast("double"),
    ).otherwise(F.lit(1.0))
    return media.select(
        "media_id",
        "meta",
        F.round(w * scale).cast("int").alias("target_width"),
        F.round(h * scale).cast("int").alias("target_height"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: explode target timestamps
    from duration metadata only (decode happens downstream on the
    (media_id, ts) pairs — shuffle carries no bytes)."""
    return (
        media.filter(F.col("meta.media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
