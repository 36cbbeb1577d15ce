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


# ---------------- real header parsing (no codec library) ----------------

_PNG_MAGIC = "89504E470D0A1A0A"  # uppercase hex, as F.hex() emits


def synthetic_image_media(spark, n: int = 512) -> DataFrame:
    """Deterministic media table whose payloads carry REAL image
    headers: valid PNG signature + IHDR chunk (CRC included) and valid
    JPEG SOI + APP0/JFIF + SOF0 marker segments, dims derived from the
    id. Three planted populations make the downstream audit
    non-trivial: every 13th row's payload is corrupted (bad magic ->
    unparseable), every 11th row's metadata width disagrees with the
    payload by one pixel (metadata drift the parser must expose), the
    rest agree. The same id arithmetic is what the DuckDB twin
    recomputes — the only way Spark reproduces its counts is by
    actually parsing the bytes."""
    import struct
    import zlib

    rows = []
    for i in range(n):
        w = 16 + (i % 97)
        h = 16 + ((i * 7) % 89)
        if i % 2 == 0:
            fmt = "png"
            ihdr_data = struct.pack(">II", w, h) + bytes([8, 2, 0, 0, 0])
            payload = (
                b"\x89PNG\r\n\x1a\n"
                + struct.pack(">I", 13)
                + b"IHDR"
                + ihdr_data
                + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr_data))
            )
        else:
            fmt = "jpeg"
            app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x01\x00H\x00H\x00\x00"
            sof0 = (
                b"\xff\xc0"
                + struct.pack(">H", 11)
                + bytes([8])
                + struct.pack(">HH", h, w)
                + bytes([1, 0x11, 0x00])
            )
            payload = b"\xff\xd8" + app0 + sof0
        payload += hashlib.sha256(f"img-{i}".encode()).digest()
        if i % 13 == 0:
            payload = b"\x00" * 12  # corrupted: wrong magic, too short
        meta_w = w + (1 if i % 11 == 0 else 0)
        rows.append(
            (
                i,
                bytearray(payload),
                ("image", fmt, meta_w, h, None, len(payload)),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _be(payload, pos, nbytes):
    """Big-endian unsigned int read from a binary column — pure native
    expressions (substring on binary -> hex -> base conversion), so the
    whole parse stays inside whole-stage codegen."""
    return F.conv(F.hex(F.substring(payload, pos, nbytes)), 16, 10).cast(
        "long"
    )


def parse_image_dims(
    media: DataFrame, max_jpeg_segments: int = 8
) -> DataFrame:
    """REAL image-dimension extraction from payload header bytes with
    ZERO Python and no codec library — native column expressions only.

    PNG: verify the 8-byte signature and the IHDR tag, then read
    width/height as the two big-endian u32s at offsets 17/21
    (PNG spec: signature, chunk length, 'IHDR', width, height).

    JPEG: verify SOI (FFD8) then WALK the marker segments — an
    unrolled fold (``F.aggregate`` over a constant sequence) steps
    ``pos -> pos + 2 + segment_length`` until it hits a SOF0/1/2
    marker, whose payload carries height/width as big-endian u16s at
    +5/+7. Bounded at ``max_jpeg_segments`` hops (headers put SOF
    within the first few segments; raise for exotic files). Corrupt
    or foreign bytes yield NULL dims, never an error.

    Returns (media_id, meta, parsed_width, parsed_height)."""
    p = F.col("payload")
    png_ok = (F.hex(F.substring(p, 1, 8)) == _PNG_MAGIC) & (
        F.substring(p, 13, 4).cast("string") == "IHDR"
    )
    png_w = F.when(png_ok, _be(p, 17, 4))
    png_h = F.when(png_ok, _be(p, 21, 4))

    # JPEG marker walk: acc = (pos, w, h); pos = -1 once invalid,
    # w/h stay NULL until a SOF marker is found.
    stopped = F.lit(-1)

    def step(acc, _):
        pos = acc.getField("pos")
        live = (
            (pos > 0)
            & acc.getField("w").isNull()
            & (pos + 8 <= F.length(p))
        )
        m1 = _be(p, pos, 1)
        m2 = _be(p, pos + 1, 1)
        is_sof = (m1 == 255) & m2.isin(192, 193, 194)
        seglen = _be(p, pos + 2, 2)
        walk_ok = (m1 == 255) & (seglen >= 2)
        return F.struct(
            F.when(~live, pos)
            .when(is_sof | ~walk_ok, F.when(is_sof, pos).otherwise(stopped))
            .otherwise(pos + 2 + seglen)
            .cast("long")
            .alias("pos"),
            F.when(live & is_sof, _be(p, pos + 7, 2))
            .otherwise(acc.getField("w"))
            .alias("w"),
            F.when(live & is_sof, _be(p, pos + 5, 2))
            .otherwise(acc.getField("h"))
            .alias("h"),
        )

    init = F.struct(
        F.when(F.hex(F.substring(p, 1, 2)) == "FFD8", F.lit(3))
        .otherwise(stopped)
        .cast("long")
        .alias("pos"),
        F.lit(None).cast("long").alias("w"),
        F.lit(None).cast("long").alias("h"),
    )
    walked = F.aggregate(
        F.sequence(F.lit(1), F.lit(max_jpeg_segments)), init, step
    )
    jpg_w = walked.getField("w")
    jpg_h = walked.getField("h")

    return media.select(
        "media_id",
        "meta",
        F.coalesce(png_w, jpg_w).cast("int").alias("parsed_width"),
        F.coalesce(png_h, jpg_h).cast("int").alias("parsed_height"),
    )


def media_dims_audit(media: DataFrame) -> DataFrame:
    """Constraint audit: does the typed metadata agree with what the
    payload bytes actually say? Per-format counts of parsed /
    matching / metadata-drifted / unparseable rows — the multimodal
    twin of operators/integrity.constraint_audit. Map + one tiny
    aggregate; payload bytes never enter a shuffle key."""
    d = parse_image_dims(media)
    parsed = F.col("parsed_width").isNotNull() & F.col(
        "parsed_height"
    ).isNotNull()
    match = parsed & (
        F.col("parsed_width") == F.col("meta.width")
    ) & (F.col("parsed_height") == F.col("meta.height"))
    one = lambda c: F.sum(c.cast("long"))  # noqa: E731
    return (
        d.groupBy(F.col("meta.format").alias("format"))
        .agg(
            F.count("*").alias("n_media"),
            one(parsed).alias("n_parsed"),
            one(match).alias("n_match"),
            one(parsed & ~match).alias("n_meta_mismatch"),
            one(~parsed).alias("n_unparseable"),
        )
    )


# ---------------- audio: real RIFF/WAVE header parsing ----------------

_RIFF_MAGIC = "52494646"          # "RIFF", uppercase hex as F.hex() emits
_WAVEFMT_MAGIC = "57415645666D7420"  # "WAVEfmt "
_DATA_MAGIC = "64617461"          # "data" chunk tag at offset 37


def synthetic_audio_media(spark, n: int = 512) -> DataFrame:
    """Deterministic media table whose payloads carry REAL canonical
    44-byte PCM WAV headers (RIFF/WAVE/fmt /data chunks, little-
    endian fields) with sample rate, channels and sample count
    derived from the id. Planted populations mirror
    synthetic_image_media: every 13th payload corrupted (bad magic),
    every 11th row's metadata duration_ms drifts +1 ms from what the
    header bytes imply, the rest agree. The DuckDB twin recomputes
    the audit counts from the id arithmetic alone — Spark only
    reproduces them by actually parsing the bytes."""
    import struct

    rows = []
    for i in range(n):
        sr = 8000 + (i % 5) * 4000
        ch = 1 + (i % 2)
        n_samples = 1000 + (i * 37) % 4000
        data_size = n_samples * ch * 2
        duration_ms = n_samples * 1000 // sr
        header = (
            b"RIFF"
            + struct.pack("<I", 36 + data_size)
            + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, ch, sr, sr * ch * 2, ch * 2, 16)
            + b"data"
            + struct.pack("<I", data_size)
        )
        payload = header + hashlib.sha256(f"wav-{i}".encode()).digest()
        if i % 13 == 0:
            payload = b"\x00" * 10  # corrupted: wrong magic, too short
        meta_ms = duration_ms + (1 if i % 11 == 0 else 0)
        rows.append(
            (i, bytearray(payload), ("audio", "wav", None, None, meta_ms,
                                     len(payload)))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _le(payload, pos, nbytes):
    """Little-endian unsigned int read from a binary column — per-byte
    native reads combined with powers of 256, whole-stage codegen."""
    total = F.lit(0).cast("long")
    for k in range(nbytes):
        total = total + (
            F.conv(F.hex(F.substring(payload, pos + k, 1)), 16, 10)
            .cast("long")
            * F.lit(256**k)
        )
    return total


def parse_wav_meta(media: DataFrame) -> DataFrame:
    """Parse PCM WAV header fields straight from payload BYTES with
    native expressions (no audio library): RIFF+WAVE magic check,
    little-endian sample_rate / channels / bits / data size at the
    canonical offsets, duration derived by integer arithmetic
    (non-negative operands, so Spark's div == DuckDB's //). Returns
    the input plus parsed_sample_rate / parsed_channels /
    parsed_duration_ms, NULL where the payload is not a canonical
    PCM WAV (reference parity: the reference pipeline has no binary
    surface at all — this extends the Phase-2 multimodal family)."""
    p = F.col("payload")
    sr = _le(p, 25, 4)
    ch = _le(p, 23, 2)
    bits = _le(p, 35, 2)
    wav_ok = (
        (F.length(p) >= 44)
        & (F.hex(F.substring(p, 1, 4)) == _RIFF_MAGIC)
        & (F.hex(F.substring(p, 9, 8)) == _WAVEFMT_MAGIC)
        & (F.hex(F.substring(p, 37, 4)) == _DATA_MAGIC)
        & (_le(p, 21, 2) == 1)  # audio_format = PCM
        # zero rate / channels / bit-depth would make the duration
        # arithmetic divide by zero: such a header is malformed, and
        # gating ALL parsed_* on it keeps the row in the audit's NULL
        # (unparseable) bucket instead of a real sample-rate group
        # with a NULL duration (ADVICE r5)
        & (sr > 0)
        & (ch > 0)
        & (bits > 0)
    )
    data = _le(p, 41, 4)
    frame_bytes = ch * F.floor(bits / 8).cast("long")
    n_samples = F.floor(data / frame_bytes).cast("long")
    dur = F.floor(n_samples * 1000 / sr).cast("long")
    return media.select(
        "*",
        F.when(wav_ok, sr).alias("parsed_sample_rate"),
        F.when(wav_ok, ch).alias("parsed_channels"),
        F.when(wav_ok, dur).alias("parsed_duration_ms"),
    )


def audio_meta_audit(media: DataFrame) -> DataFrame:
    """Constraint audit for audio: per parsed-sample-rate counts of
    parsed / duration-matching / metadata-drifted / unparseable rows
    (unparseable rows group under NULL sample rate). Same shape and
    discipline as media_dims_audit — map + one tiny aggregate,
    payload bytes never in a shuffle key."""
    d = parse_wav_meta(media)
    parsed = F.col("parsed_duration_ms").isNotNull()
    match = parsed & (
        F.col("parsed_duration_ms") == F.col("meta.duration_ms")
    )
    one = lambda c: F.sum(c.cast("long"))  # noqa: E731
    return (
        d.groupBy(F.col("parsed_sample_rate").alias("sample_rate"))
        .agg(
            F.count("*").alias("n_media"),
            one(parsed).alias("n_parsed"),
            one(match).alias("n_match"),
            one(parsed & ~match).alias("n_meta_mismatch"),
            one(~parsed).alias("n_unparseable"),
        )
    )


CHUNK_BYTES = 64 * 1024  # production default: 64 KiB blob segments


def payload_chunk_manifest(
    media: DataFrame, chunk_bytes: int = CHUNK_BYTES
) -> DataFrame:
    """Blob chunk layout for large payloads — the storage shape
    multi-GB image/video blobs need at 100 TB: fixed-size segments a
    reader can fetch/verify in parallel (and a writer can upload as a
    multipart object), with a manifest row per segment.

    Returns (media_id, chunk_idx, offset, nbytes, chunk_sha):
    0-based byte offset, ragged tail allowed, chunk_sha =
    sha256(lowercase-hex(segment)) — the same hex-normalized hashing
    convention as content_sha, so any engine with a string sha256
    verifies a segment.

    Scale shape: pure map + posexplode — the payload bytes never
    survive past the map side (only per-chunk hashes + ints shuffle),
    the same payload-free discipline as frame-sample planning. The
    DuckDB twin slices the hex encoding (2 chars/byte) because DuckDB
    lacks BLOB substring; Spark slices the binary natively — byte
    offsets align exactly."""
    p = F.col("payload")
    cb = F.lit(chunk_bytes)
    n_chunks = F.ceil(F.length(p) / cb.cast("double")).cast("int")
    # zero-length payloads produce ZERO manifest rows (not one phantom
    # empty chunk): the ungated form forced sequence(0, 0) via
    # greatest, diverging from the twin's generate_series(0, -1)
    idxs = F.when(
        F.length(p) > 0, F.sequence(F.lit(0), n_chunks - 1)
    ).otherwise(F.array().cast("array<int>"))
    staged = media.select("media_id", p.alias("_p"), idxs.alias("_idxs"))
    pm = F.col("_p")
    seg = F.explode(F.col("_idxs")).alias("chunk_idx")
    out = staged.select("media_id", pm.alias("_p"), seg)
    chunk = pm.substr(
        F.col("chunk_idx") * cb + 1, cb
    )
    return out.select(
        "media_id",
        "chunk_idx",
        (F.col("chunk_idx").cast("long") * chunk_bytes).alias("offset"),
        F.length(chunk).cast("long").alias("nbytes"),
        F.sha2(F.lower(F.hex(chunk)), 256).alias("chunk_sha"),
    )


def payload_chunk_audit(
    manifest: DataFrame, media: DataFrame
) -> DataFrame:
    """Layout integrity audit over the manifest alone + payload
    lengths: per media, segments must tile the payload exactly —
    first offset 0, contiguous (sum nbytes + count consistency with
    ceil), total bytes equal to the payload length. Returns
    (media_id, n_chunks, total_bytes, layout_ok)."""
    agg = manifest.groupBy("media_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum("nbytes").alias("total_bytes"),
        F.min("offset").alias("_min_off"),
        F.max(F.col("offset") + F.col("nbytes")).alias("_max_end"),
    )
    lens = media.select(
        "media_id", F.length("payload").cast("long").alias("_len")
    )
    # LEFT from lens: a zero-length payload legitimately has ZERO
    # manifest rows (see payload_chunk_manifest) — it must audit as
    # an ok empty layout, not silently drop out of the report
    return (
        lens.join(agg, "media_id", "left")
        .select(
            "media_id",
            F.coalesce(F.col("n_chunks"), F.lit(0)).alias("n_chunks"),
            F.coalesce(F.col("total_bytes"), F.lit(0).cast("long")).alias(
                "total_bytes"
            ),
            F.when(F.col("_len") == 0, F.col("n_chunks").isNull())
            .otherwise(
                # coalesce to False: a NON-empty payload with zero
                # manifest rows has NULL aggregates here and must audit
                # as not-ok, not NULL (silently missing manifest)
                F.coalesce(
                    (F.col("_min_off") == 0)
                    & (F.col("_max_end") == F.col("_len"))
                    & (F.col("total_bytes") == F.col("_len")),
                    F.lit(False),
                )
            )
            .alias("layout_ok"),
        )
    )
