"""Multimodal plumbing tests: schema, Arrow batch shape, metadata-only
planning (operators/multimodal.py — decode kernels are deterministic
fakes per the environment contract)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from yelp_streaming_etl_pipeline_spark.operators import multimodal as MM


def test_feature_extraction_schema_and_determinism(spark):
    media = MM.synthetic_media(spark, n=32)
    feats = MM.extract_features(media)
    assert feats.schema == MM.FEATURES_SCHEMA
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 32
    # deterministic: recompute locally (content hash is over the
    # lowercase-hex encoding — portable to string-typed sha256 engines)
    payload = hashlib.sha256(b"media-3").digest() * (4 + 3 % 7)
    assert rows[3]["content_sha"] == MM.content_sha(payload)
    assert (
        rows[3]["content_sha"]
        == hashlib.sha256(payload.hex().encode()).hexdigest()
    )
    assert len(rows[3]["features"]) == MM.FEATURE_DIM
    assert all(0.0 <= v <= 1.0 for v in rows[3]["features"])


def test_resize_plan_metadata_only(spark):
    media = MM.synthetic_media(spark, n=30)
    plan = MM.resize_metadata(media, max_side=128)
    rows = plan.filter(F.col("meta.media_type") == "image").collect()
    assert rows
    for r in rows:
        if r["target_width"] is not None:
            assert max(r["target_width"], r["target_height"]) <= 128
    # the physical plan must not carry the payload column
    assert "payload" not in plan.columns


def test_frame_sample_plan(spark):
    media = MM.synthetic_media(spark, n=30)
    plan = MM.frame_sample_plan(media, every_ms=1000)
    rows = plan.collect()
    assert rows
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    meta = {r["media_id"]: r["meta"] for r in media.collect()}
    for mid, ts_list in by_id.items():
        assert ts_list == sorted(ts_list)
        assert meta[mid]["media_type"] == "video"
        assert len(ts_list) == max(1, (meta[mid]["duration_ms"] + 999) // 1000)


def test_decode_stub_is_explicit(spark):
    with pytest.raises(NotImplementedError):
        MM.decode_image(MM.synthetic_media(spark, n=1))


# ---------------- real header parsing ----------------


def _png_bytes(w, h):
    import struct
    import zlib

    ihdr = struct.pack(">II", w, h) + bytes([8, 2, 0, 0, 0])
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )


def _jpeg_bytes(w, h, extra_segments=1):
    import struct

    out = b"\xff\xd8"
    for k in range(extra_segments):
        body = bytes(10 + k)
        out += b"\xff\xe1" + struct.pack(">H", 2 + len(body)) + body
    out += (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([1, 0x11, 0x00])
    )
    return out


def test_parse_image_dims_png_and_jpeg(spark):
    from yelp_streaming_etl_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        parse_image_dims,
    )

    rows = [
        (1, bytearray(_png_bytes(640, 480)), ("image", "png", 640, 480, None, 33)),
        # SOF0 several marker hops in: the walk must skip segments
        (2, bytearray(_jpeg_bytes(1920, 1080, extra_segments=4)),
         ("image", "jpeg", 1920, 1080, None, 99)),
        # corrupt: wrong magic
        (3, bytearray(b"\x00" * 16), ("image", "png", 10, 10, None, 16)),
        # truncated JPEG: SOI only, no SOF reachable
        (4, bytearray(b"\xff\xd8\xff\xe0"), ("image", "jpeg", 5, 5, None, 4)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["media_id"]: (r["parsed_width"], r["parsed_height"])
        for r in parse_image_dims(df).collect()
    }
    assert got[1] == (640, 480)
    assert got[2] == (1920, 1080)
    assert got[3] == (None, None)
    assert got[4] == (None, None)


def test_parse_image_dims_is_native_no_python(spark):
    from yelp_streaming_etl_pipeline_spark.operators.multimodal import (
        parse_image_dims,
        synthetic_image_media,
    )

    plan = parse_image_dims(
        synthetic_image_media(spark, 8)
    )._jdf.queryExecution().executedPlan().toString()
    # the parse must stay JVM-side: no Python/Arrow eval nodes
    assert "Python" not in plan
    assert "ArrowEval" not in plan


def test_media_dims_audit_counts(spark):
    from yelp_streaming_etl_pipeline_spark.operators.multimodal import (
        media_dims_audit,
        synthetic_image_media,
    )

    got = {
        r["format"]: r.asDict()
        for r in media_dims_audit(synthetic_image_media(spark, 64)).collect()
    }
    # sequential model of the planted populations
    want = {"png": [0, 0, 0, 0], "jpeg": [0, 0, 0, 0]}
    for i in range(64):
        fmt = "png" if i % 2 == 0 else "jpeg"
        w = want[fmt]
        w[0] += 1
        if i % 13 == 0:
            w[3] += 1
        elif i % 11 == 0:
            w[2] += 1
        else:
            w[1] += 1
    for fmt, (n, match, drift, bad) in want.items():
        g = got[fmt]
        assert g["n_media"] == n
        assert g["n_match"] == match
        assert g["n_meta_mismatch"] == drift
        assert g["n_unparseable"] == bad
        assert g["n_parsed"] == match + drift


def test_wav_header_parse_and_audit(spark):
    from yelp_streaming_etl_pipeline_spark.operators import multimodal as MM

    media = MM.synthetic_audio_media(spark, 64)
    parsed = MM.parse_wav_meta(media).collect()
    by_id = {r["media_id"]: r for r in parsed}
    # id 1: sr=12000, ch=2, n_samples=1037 -> duration 86 ms
    assert by_id[1]["parsed_sample_rate"] == 12000
    assert by_id[1]["parsed_channels"] == 2
    assert by_id[1]["parsed_duration_ms"] == 1037 * 1000 // 12000
    # corrupted rows (i % 13 == 0) parse to NULL
    assert by_id[13]["parsed_sample_rate"] is None
    assert by_id[0]["parsed_duration_ms"] is None
    # drift rows (i % 11 == 0, not corrupt) mismatch metadata by 1 ms
    assert (
        by_id[11]["parsed_duration_ms"] + 1 == by_id[11]["meta"]["duration_ms"]
    )
    audit = MM.audio_meta_audit(media).collect()
    total = sum(r["n_media"] for r in audit)
    unparseable = sum(r["n_unparseable"] for r in audit)
    assert total == 64
    assert unparseable == len([i for i in range(64) if i % 13 == 0])
    null_group = [r for r in audit if r["sample_rate"] is None]
    assert len(null_group) == 1 and null_group[0]["n_parsed"] == 0


def test_wav_malformed_riff_lands_in_null_bucket(spark):
    """A structurally-plausible RIFF/PCM payload with a wrong data-chunk
    tag or a zero sample-rate must yield NULL for ALL parsed_* columns
    (ADVICE r5: previously such rows kept a non-NULL sample rate with a
    NULL duration and were audited inside a real sample-rate group)."""
    import struct

    from yelp_streaming_etl_pipeline_spark.operators import multimodal as MM

    def wav(sr, ch, bits, tag=b"data"):
        return (
            b"RIFF" + struct.pack("<I", 100) + b"WAVEfmt "
            + struct.pack(
                "<IHHIIHH", 16, 1, ch, sr,
                sr * ch * max(bits // 8, 1), ch * max(bits // 8, 1), bits,
            )
            + tag + struct.pack("<I", 64) + b"\x00" * 64
        )

    rows = [
        (0, bytearray(wav(8000, 1, 16)), ("audio", "wav", None, None, 10, 120)),
        (1, bytearray(wav(8000, 1, 16, tag=b"LIST")),
         ("audio", "wav", None, None, 10, 120)),
        (2, bytearray(wav(0, 1, 16)), ("audio", "wav", None, None, 10, 120)),
        (3, bytearray(wav(8000, 0, 16)), ("audio", "wav", None, None, 10, 120)),
        (4, bytearray(wav(8000, 1, 0)), ("audio", "wav", None, None, 10, 120)),
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in MM.parse_wav_meta(media).collect()}
    assert got[0]["parsed_sample_rate"] == 8000
    assert got[0]["parsed_duration_ms"] is not None
    for i in (1, 2, 3, 4):
        assert got[i]["parsed_sample_rate"] is None, i
        assert got[i]["parsed_channels"] is None, i
        assert got[i]["parsed_duration_ms"] is None, i


def test_payload_chunk_manifest_tiles_and_audits(spark):
    """Segments must tile every payload exactly (ragged tail allowed):
    offsets contiguous from 0, nbytes summing to the payload length,
    chunk hashes matching a direct recompute; the audit flags every
    row layout_ok."""
    import hashlib

    from yelp_streaming_etl_pipeline_spark.operators import multimodal as MM

    media = MM.synthetic_media(spark, 16)
    man = MM.payload_chunk_manifest(media, chunk_bytes=48)
    rows = man.collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for i, segs in by_media.items():
        segs.sort(key=lambda r: r["chunk_idx"])
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 7)
        assert segs[0]["offset"] == 0
        off = 0
        for s in segs:
            assert s["offset"] == off
            piece = payload[off:off + s["nbytes"]]
            assert s["chunk_sha"] == hashlib.sha256(
                piece.hex().encode()
            ).hexdigest()
            off += s["nbytes"]
        assert off == len(payload)
    audit = MM.payload_chunk_audit(man, media).collect()
    assert len(audit) == 16
    assert all(r["layout_ok"] for r in audit)


def test_payload_chunk_manifest_empty_payload_has_no_rows(spark):
    # a zero-length payload must yield ZERO manifest rows (not one
    # phantom empty chunk) and still audit as an ok empty layout
    from yelp_streaming_etl_pipeline_spark.operators import multimodal as MM

    media = spark.createDataFrame(
        [(0, b""), (1, b"x" * 100)], "media_id long, payload binary"
    )
    man = MM.payload_chunk_manifest(media, chunk_bytes=48)
    assert man.filter("media_id = 0").count() == 0
    assert man.filter("media_id = 1").count() == 3
    audit = {r["media_id"]: r for r in MM.payload_chunk_audit(man, media).collect()}
    assert audit[0]["n_chunks"] == 0
    assert audit[0]["total_bytes"] == 0
    assert audit[0]["layout_ok"]
    assert audit[1]["layout_ok"]


def test_payload_chunk_audit_missing_manifest_flags_false(spark):
    """A NON-empty payload with zero manifest rows must audit as
    layout_ok = False, not NULL (ADVICE r7: the otherwise-branch
    compared NULL left-join aggregates)."""
    from yelp_streaming_etl_pipeline_spark.operators import multimodal as MM

    media = spark.createDataFrame(
        [(0, b"x" * 100), (1, b"y" * 64)], "media_id long, payload binary"
    )
    # manifest only covers media 1 — media 0's manifest is missing
    man = MM.payload_chunk_manifest(
        media.filter("media_id = 1"), chunk_bytes=32
    )
    audit = {r["media_id"]: r for r in MM.payload_chunk_audit(man, media).collect()}
    assert audit[0]["layout_ok"] is False
    assert audit[0]["n_chunks"] == 0
    assert audit[1]["layout_ok"] is True
