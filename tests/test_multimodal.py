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
