"""Gauntlet row-class tests (FIXTURES.md §1 required row classes;
reference clean_review semantics, quality_engine.py:223-358)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from yelp_streaming_etl_pipeline_spark.operators.gauntlet import (
    clean_reviews,
    validate_reviews,
)
from yelp_streaming_etl_pipeline_spark.schemas import RAW_REVIEW

GOOD_TEXT = (
    "The food here was absolutely wonderful and the service was quick. "
    "I would definitely come back with friends for the weekend brunch."
)
NOW = "2026-08-13 00:00:00"
D = datetime(2026, 8, 1, 12, 0, 0)


def mk(spark, rows):
    base = {
        "review_id": "r1",
        "business_id": "b1",
        "user_id": "u1",
        "rating": 4.0,
        "text": GOOD_TEXT,
        "date": D,
        "useful": 1,
        "funny": 0,
        "cool": 2,
        "source": "test",
        "ingestion_timestamp": D,
    }
    data = []
    for i, patch in enumerate(rows):
        r = dict(base)
        r.update(patch)
        r["review_id"] = f"r{i}"
        data.append(tuple(r[f.name] for f in RAW_REVIEW.fields))
    df = spark.createDataFrame(data, RAW_REVIEW)
    return df.withColumn("language", F.lit("en")).withColumn(
        "language_confidence", F.lit(0.95)
    )


def outcomes(spark, rows):
    df = mk(spark, rows)
    v = validate_reviews(df, F.to_timestamp(F.lit(NOW)))
    out = {}
    for r in v.collect():
        out[r["review_id"]] = (
            r["fatal_stage"],
            [i["issue_type"] for i in r["issues"]],
        )
    return out


def test_row_classes(spark):
    got = outcomes(
        spark,
        [
            {},  # 0 clean accepted
            {"text": None},  # 1 missing text
            {"text": ""},  # 2 missing text (empty)
            {"rating": None},  # 3 missing rating
            {"rating": 0.0},  # 4 rating 0 == missing (quirk §8.5)
            {"text": "free discount deal! visit www.spam.com now"},  # 5 spam (2 patterns)
            {"text": "short"},  # 6 too short
            {"text": "word " * 1100},  # 7 too long -> repaired + flagged
            {"rating": 6.0},  # 8 out of range
            {"rating": 0.5},  # 9 out of range
            {"text": "1234 5678 90123 45 678 99"},  # 10 low alpha ratio
        ],
    )
    assert got["r0"] == (None, [])
    assert got["r1"] == (1, ["missing_value"])
    assert got["r2"] == (1, ["missing_value"])
    assert got["r3"] == (2, ["missing_value"])
    assert got["r4"] == (2, ["missing_value"])
    assert got["r5"] == (5, ["spam_detected"])
    assert got["r6"] == (6, ["too_short"])
    assert got["r7"] == (None, ["too_long"])
    assert got["r8"] == (8, ["out_of_range"])
    assert got["r9"] == (8, ["out_of_range"])
    assert got["r10"] == (9, ["invalid_format"])


def test_unsupported_language(spark):
    df = mk(spark, [{}]).withColumn("language", F.lit("es"))
    v = validate_reviews(df, F.to_timestamp(F.lit(NOW)))
    r = v.collect()[0]
    assert r["fatal_stage"] == 3
    assert [i["issue_type"] for i in r["issues"]] == ["unsupported_language"]


def test_low_confidence_flag_kept(spark):
    df = mk(spark, [{}]).withColumn("language_confidence", F.lit(0.55))
    v = validate_reviews(df, F.to_timestamp(F.lit(NOW)))
    r = v.collect()[0]
    assert r["fatal_stage"] is None and r["is_accepted"]
    assert [i["issue_type"] for i in r["issues"]] == ["wrong_language"]


def test_flag_before_fatal_stage_included(spark):
    # low confidence (stage 4 flag) + bad rating (stage 8 fatal):
    # reference reaches the flag first, then rejects -> both issues
    df = mk(spark, [{"rating": 9.0}]).withColumn(
        "language_confidence", F.lit(0.55)
    )
    v = validate_reviews(df, F.to_timestamp(F.lit(NOW)))
    r = v.collect()[0]
    assert r["fatal_stage"] == 8
    assert [i["issue_type"] for i in r["issues"]] == [
        "wrong_language",
        "out_of_range",
    ]


def test_truncation_repair(spark):
    long_text = "word " * 1100  # 5500 chars
    df = mk(spark, [{"text": long_text}])
    v = validate_reviews(df, F.to_timestamp(F.lit(NOW)))
    r = v.collect()[0]
    assert len(r["text_clean"]) == 5000
    assert r["is_accepted"]


def test_clean_reviews_routing(spark):
    accepted, rejected, issues = clean_reviews(
        mk(spark, [{}, {"text": None}, {"rating": 7.0}]),
        F.to_timestamp(F.lit(NOW)),
    )
    assert accepted.count() == 1
    assert rejected.count() == 2
    assert issues.count() == 2
    acc = accepted.collect()[0]
    assert acc["is_spam"] is False
    assert 0.0 <= acc["data_quality_score"] <= 0.8  # 4-component max (§8.2)
    assert acc["useful_count"] == 1  # S7 rename


def test_rounded_aggregates_are_partition_order_independent(spark):
    """Round-1 driver flake root cause: stable_round over double
    sum()/avg() flipped at the rounding cliff depending on partial-
    aggregation order. The fixed-point/decimal aggregates must now be
    BIT-identical under different partitionings — the four formerly
    flaky queries, run at 3 vs 32 shuffle partitions."""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    flaky = [
        "review_stats",
        "acceptance_summary",
        "props_extract",
        "sessionize_events",
    ]
    results = {}
    for parts in ("3", "32"):
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try:
            qs = E.queries()
            results[parts] = {
                name: sorted(map(tuple, qs[name](spark, sf).collect()))
                for name in flaky
            }
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
    for name in flaky:
        assert results["3"][name] == results["32"][name], name
