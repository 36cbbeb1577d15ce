"""File-backed topic shim (S3 producer / S5 consumer executed twins).

What a real broker would be asserted on, asserted here:
- produce -> consume round-trip is lossless (payload parity with the
  input table, through the same JSON codec the Kafka paths use);
- keyed co-partitioning (W6): every key lives in exactly one
  partition (reference partitions by business_id, producer.py:114);
- offsets are contiguous per partition and monotonic across epochs;
- the producer is idempotent under checkpoint replay: a committed
  epoch is a no-op, and a retry after a mid-write crash overwrites
  rather than duplicates (the executed half of W5).
"""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from yelp_streaming_etl_pipeline_spark.sources.reviews import synthetic_reviews
from yelp_streaming_etl_pipeline_spark.streaming import filetopic as FT

SF_DIR = "/root/testdata/sf0.001"


def _reviews(spark):
    return synthetic_reviews(spark, SF_DIR).drop(
        "language", "language_confidence"
    )


def _produce_stream(spark, tmp_path, reviews, topic_dir):
    src = str(tmp_path / "src")
    reviews.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(reviews.schema).parquet(src)
    q = (
        FT.write_file_topic_keyed(
            stream,
            topic_dir,
            str(tmp_path / "ckpt"),
            key_col="business_id",
            timestamp_col="ingestion_timestamp",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_roundtrip_parity(spark, tmp_path):
    reviews = _reviews(spark)
    topic_dir = str(tmp_path / "topic")
    _produce_stream(spark, tmp_path, reviews, topic_dir)

    # consume as a STREAM through the shared Kafka decode
    out = str(tmp_path / "consumed")
    q = (
        FT.decode_review_records(FT.read_file_topic_stream(spark, topic_dir))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt_c"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(out)
    cols = [f.name for f in reviews.schema.fields]
    want_rows = sorted(map(tuple, reviews.select(cols).collect()))
    got_rows = sorted(map(tuple, got.select(cols).collect()))
    assert got_rows == want_rows


def test_keyed_copartitioning_and_offsets(spark, tmp_path):
    reviews = _reviews(spark)
    topic_dir = str(tmp_path / "topic")
    _produce_stream(spark, tmp_path, reviews, topic_dir)
    rec = FT.read_file_topic_batch(spark, topic_dir)

    # W6: one partition per key
    spread = (
        rec.groupBy(F.col("key").cast("string"))
        .agg(F.countDistinct("partition").alias("nparts"))
        .agg(F.max("nparts").alias("m"))
        .collect()[0]["m"]
    )
    assert spread == 1

    # offsets: 0..count-1 contiguous within each partition
    per_part = rec.groupBy("partition").agg(
        F.count("*").alias("c"),
        F.min("offset").alias("lo"),
        F.max("offset").alias("hi"),
        F.countDistinct("offset").alias("d"),
    )
    for r in per_part.collect():
        assert r["lo"] == 0
        assert r["hi"] == r["c"] - 1
        assert r["d"] == r["c"]

    # consumer rows carry the exact Kafka source schema
    assert rec.schema == FT.TOPIC_RECORD


def test_offsets_monotonic_across_epochs(spark, tmp_path):
    reviews = _reviews(spark).limit(40).cache()
    payload = reviews.select(
        F.col("business_id").cast("string").alias("key"),
        F.to_json(F.struct(*reviews.columns)).alias("value"),
    )
    topic_dir = str(tmp_path / "topic")
    n1 = FT.produce_batch(payload, 0, topic_dir, n_partitions=3)
    n2 = FT.produce_batch(payload, 1, topic_dir, n_partitions=3)
    assert n1 == 40 and n2 == 40

    rec = FT.read_file_topic_batch(spark, topic_dir)
    per_part = rec.groupBy("partition").agg(
        F.count("*").alias("c"),
        F.max("offset").alias("hi"),
        F.countDistinct("offset").alias("d"),
    )
    for r in per_part.collect():
        assert r["hi"] == r["c"] - 1  # second epoch continued, no gaps
        assert r["d"] == r["c"]  # no offset reused


def test_idempotent_replay_and_crash_retry(spark, tmp_path):
    reviews = _reviews(spark).limit(30).cache()
    payload = reviews.select(
        F.col("business_id").cast("string").alias("key"),
        F.to_json(F.struct(*reviews.columns)).alias("value"),
    )
    topic_dir = str(tmp_path / "topic")

    assert FT.produce_batch(payload, 0, topic_dir) == 30
    # checkpoint replay of a COMMITTED epoch: no-op
    assert FT.produce_batch(payload, 0, topic_dir) == 0
    assert FT.read_file_topic_batch(spark, topic_dir).count() == 30

    # mid-write crash: epoch 1's data landed but _meta.json was never
    # committed (simulated by restoring the pre-epoch meta) -> the
    # retry overwrites the epoch directory instead of duplicating
    meta_before = open(os.path.join(topic_dir, "_meta.json")).read()
    assert FT.produce_batch(payload, 1, topic_dir) == 30
    with open(os.path.join(topic_dir, "_meta.json"), "w") as f:
        f.write(meta_before)  # crash before commit
    assert FT.produce_batch(payload, 1, topic_dir) == 30  # retry
    rec = FT.read_file_topic_batch(spark, topic_dir)
    assert rec.count() == 60
    assert rec.groupBy("partition", "offset").count().filter(
        F.col("count") > 1
    ).count() == 0


def test_null_key_records_still_partition_deterministically(spark, tmp_path):
    payload = spark.createDataFrame(
        [(None, '{"a": 1}'), (None, '{"a": 2}'), ("k", '{"a": 3}')],
        "key string, value string",
    )
    topic_dir = str(tmp_path / "topic")
    FT.produce_batch(payload, 0, topic_dir)
    shutil.rmtree(str(tmp_path / "topic2"), ignore_errors=True)
    FT.produce_batch(payload, 0, str(tmp_path / "topic2"))
    a = sorted(
        map(
            tuple,
            FT.read_file_topic_batch(spark, topic_dir)
            .select(F.col("value").cast("string"), "partition", "offset")
            .collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            FT.read_file_topic_batch(spark, str(tmp_path / "topic2"))
            .select(F.col("value").cast("string"), "partition", "offset")
            .collect(),
        )
    )
    assert a == b  # same inputs -> same layout, null keys included


def test_full_topology_via_topics(spark, tmp_path, monkeypatch):
    """The reference's complete agent graph executed through topics:
    raw_reviews -> (dedup + gauntlet) -> cleaned_reviews /
    quality_issues -> windowed stats — with batch-path parity on the
    accepted set (one expression library, two execution modes, a
    broker in between)."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from yelp_streaming_etl_pipeline_spark.operators.gauntlet import (
        clean_reviews,
    )
    from yelp_streaming_etl_pipeline_spark.schemas import RAW_REVIEW
    from yelp_streaming_etl_pipeline_spark.streaming import topology as TOP

    GOOD = (
        "The food here was absolutely wonderful and the service was quick. "
        "I would definitely come back with friends for the weekend brunch."
    )
    base = datetime(2026, 8, 1, 12, 0, 0)
    rows = []
    for i in range(40):
        rows.append(
            (
                f"r{i}",
                f"b{i % 3}",
                f"u{i}",
                None if i % 13 == 0 else float(1 + i % 5),
                None if i % 11 == 0 else GOOD + f" visit number {i}.",
                base + timedelta(hours=5 * i, minutes=7 * i),
                i % 4,
                i % 3,
                i % 2,
                "test",
                base,
            )
        )
    rows.append(rows[1])  # duplicate (review_id, date)
    src_df = spark.createDataFrame(rows, RAW_REVIEW)

    # trusted language columns (the fixture has none)
    orig = TOP.validate_reviews
    monkeypatch.setattr(
        TOP,
        "validate_reviews",
        lambda df, now: orig(
            df.withColumn("language", F.lit("en")).withColumn(
                "language_confidence", F.lit(0.95)
            ),
            now,
        ),
    )

    base_dir = str(tmp_path / "broker")
    # producer: replay the source table into the raw topic
    src = str(tmp_path / "src")
    src_df.coalesce(1).write.mode("overwrite").parquet(src)
    q = (
        FT.write_file_topic_keyed(
            spark.readStream.schema(src_df.schema).parquet(src),
            f"{base_dir}/raw_reviews",
            str(tmp_path / "ckpt_raw"),
            key_col="business_id",
            timestamp_col="date",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    counts = TOP.run_topology_via_topics(spark, base_dir)
    assert counts["cleaned_reviews"] + counts["quality_issues"] >= 30
    assert counts["hourly_stats"] > 0

    # batch parity on the accepted set, through TWO topic hops
    cleaned_rec = FT.read_file_topic_batch(spark, f"{base_dir}/cleaned_reviews")
    stream_ids = {
        json.loads(bytes(r["value"]).decode())["review_id"]
        for r in cleaned_rec.collect()
    }
    batch_input = (
        src_df.dropDuplicates(["review_id", "date"])
        .withColumn("language", F.lit("en"))
        .withColumn("language_confidence", F.lit(0.95))
    )
    accepted, _r, _i = clean_reviews(batch_input, F.current_timestamp())
    assert stream_ids == {
        r["review_id"] for r in accepted.select("review_id").collect()
    }

    # stats consumed from the cleaned topic: totals per emitted window
    # match a batch aggregation of the accepted rows
    stats = spark.read.parquet(f"{base_dir}/out/hourly_stats")
    batch_win = {
        (r["ws"], r["business_id"]): r["n"]
        for r in accepted.groupBy(
            F.date_trunc("hour", "date").alias("ws"), "business_id"
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in stats.collect():
        assert batch_win[(r["window_start"], r["business_id"])] == r["total"]
