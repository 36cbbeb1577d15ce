"""Declared StructType schemas (never rely on inference in the engine).

Parity map (behavior studied from the reference, re-declared here):
- RAW_REVIEW   <- RawYelpReview      /root/reference/streaming/models.py:22-38
- CLEANED_REVIEW <- CleanedYelpReview /root/reference/streaming/models.py:40-69
                 + warehouse DDL      /root/reference/streaming/init_db.sql:1-31
- QUALITY_ISSUE <- DataQualityIssue  /root/reference/streaming/models.py:85-99
- REVIEW_STATS <- ReviewStats        /root/reference/streaming/models.py:101-127
  (the full declared aggregate; the reference declares it but never
  computes most fields — we implement all of them, SURVEY.md §2.5 A3)

Notes on divergences (SURVEY.md §8):
- ``rating`` is DoubleType (reference's CleanedYelpReview annotates int
  against a DECIMAL(2,1) DDL; doubles are the superset).
- ``detection_range`` keeps the reference's (odd) field name for schema
  parity (models.py:99).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Issue-type enum values, /root/reference/streaming/models.py:10-20
ISSUE_MISSING_VALUE = "missing_value"
ISSUE_INVALID_FORMAT = "invalid_format"
ISSUE_OUT_OF_RANGE = "out_of_range"
ISSUE_DUPLICATE = "duplicate"
ISSUE_SPAM = "spam_detected"
ISSUE_WRONG_LANGUAGE = "wrong_language"
ISSUE_UNSUPPORTED_LANGUAGE = "unsupported_language"
ISSUE_TOO_SHORT = "too_short"
ISSUE_TOO_LONG = "too_long"
ISSUE_ANOMALY = "anomaly_detected"

ISSUE_TYPES = [
    ISSUE_MISSING_VALUE,
    ISSUE_INVALID_FORMAT,
    ISSUE_OUT_OF_RANGE,
    ISSUE_DUPLICATE,
    ISSUE_SPAM,
    ISSUE_WRONG_LANGUAGE,
    ISSUE_UNSUPPORTED_LANGUAGE,
    ISSUE_TOO_SHORT,
    ISSUE_TOO_LONG,
    ISSUE_ANOMALY,
]

RAW_REVIEW = T.StructType(
    [
        T.StructField("review_id", T.StringType(), False),
        T.StructField("business_id", T.StringType(), False),
        T.StructField("user_id", T.StringType(), False),
        T.StructField("rating", T.DoubleType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("date", T.TimestampType(), True),
        T.StructField("useful", T.LongType(), True),
        T.StructField("funny", T.LongType(), True),
        T.StructField("cool", T.LongType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("ingestion_timestamp", T.TimestampType(), True),
    ]
)

# Yelp academic dataset JSON-lines shape, pre-mapping
# (source key `stars`; mapping at /root/reference/streaming/producer.py:58-80)
YELP_SOURCE_JSON = T.StructType(
    [
        T.StructField("review_id", T.StringType(), True),
        T.StructField("business_id", T.StringType(), True),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("stars", T.DoubleType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("date", T.StringType(), True),
        T.StructField("useful", T.LongType(), True),
        T.StructField("funny", T.LongType(), True),
        T.StructField("cool", T.LongType(), True),
        T.StructField("_corrupt_record", T.StringType(), True),
    ]
)

CLEANED_REVIEW = T.StructType(
    [
        T.StructField("review_id", T.StringType(), False),
        T.StructField("business_id", T.StringType(), False),
        T.StructField("user_id", T.StringType(), False),
        T.StructField("rating", T.DoubleType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("date", T.TimestampType(), False),
        T.StructField("useful_count", T.LongType(), True),
        T.StructField("funny_count", T.LongType(), True),
        T.StructField("cool_count", T.LongType(), True),
        T.StructField("word_count", T.IntegerType(), True),
        T.StructField("char_count", T.IntegerType(), True),
        T.StructField("sentence_count", T.IntegerType(), True),
        T.StructField("avg_word_length", T.DoubleType(), True),
        T.StructField("language", T.StringType(), True),
        T.StructField("language_confidence", T.DoubleType(), True),
        T.StructField("data_quality_score", T.DoubleType(), True),
        T.StructField("is_spam", T.BooleanType(), True),
        T.StructField("is_anomaly", T.BooleanType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("ingestion_timestamp", T.TimestampType(), True),
        T.StructField("processing_timestamp", T.TimestampType(), True),
    ]
)

QUALITY_ISSUE = T.StructType(
    [
        T.StructField("review_id", T.StringType(), False),
        T.StructField("issue_type", T.StringType(), False),
        T.StructField("field_name", T.StringType(), True),
        T.StructField("og_value", T.StringType(), True),
        T.StructField("expected_range", T.StringType(), True),
        T.StructField("severity", T.IntegerType(), False),
        T.StructField("detected_at", T.TimestampType(), True),
        T.StructField("detection_range", T.StringType(), True),
    ]
)

REVIEW_STATS = T.StructType(
    [
        T.StructField("window_start", T.TimestampType(), False),
        T.StructField("window_end", T.TimestampType(), False),
        T.StructField("business_id", T.StringType(), True),
        T.StructField("total_reviews", T.LongType(), False),
        T.StructField("valid_reviews", T.LongType(), False),
        T.StructField("rejected_reviews", T.LongType(), False),
        T.StructField("avg_quality_score", T.DoubleType(), True),
        T.StructField("spam_count", T.LongType(), False),
        T.StructField("wrong_language_count", T.LongType(), False),
        T.StructField("rating_1_count", T.LongType(), False),
        T.StructField("rating_2_count", T.LongType(), False),
        T.StructField("rating_3_count", T.LongType(), False),
        T.StructField("rating_4_count", T.LongType(), False),
        T.StructField("rating_5_count", T.LongType(), False),
        T.StructField("avg_rating", T.DoubleType(), True),
        T.StructField("avg_word_count", T.DoubleType(), True),
        T.StructField("avg_sentence_count", T.DoubleType(), True),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("label", T.IntegerType(), True),
    ]
)

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_tables(spark, sf_dir: str, names: list[str] | None = None):
    """Load driver-provided parquet tables as a dict of DataFrames."""
    from .sources.tables import read_fixture

    return {
        name: read_fixture(spark, sf_dir, name)
        for name in (names or TESTDATA_TABLES)
    }
