"""Review-shaped inputs.

1. ``read_yelp_jsonlines`` — the production source: Yelp academic
   dataset JSON-lines with the reference's lenient schema mapping
   (S1/S2, /root/reference/streaming/producer.py:21-80): ``stars`` ->
   ``rating``, defaults for useful/funny/cool, date parse with
   fallback-to-now, constant ``source``, ingestion timestamp;
   malformed lines dropped via PERMISSIVE mode + _corrupt_record.

2. ``synthetic_reviews`` — the test harness: derives a deterministic
   review table from the driver's ``documents`` fixture so every
   gauntlet path (missing text/rating, bad language, spam, too short,
   too long, out-of-range rating, low alpha ratio) is exercised. The
   EXACT same derivation is declared in ``SYNTH_REVIEWS_SQL`` for the
   DuckDB oracle — both sides compute it independently from the same
   spec (FIXTURES.md row classes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import stable_round
from ..schemas import YELP_SOURCE_JSON
from .tables import read_fixture

YELP_DATE_FMT = "yyyy-MM-dd HH:mm:ss"  # producer.py:64

# --- deterministic derivation constants (FIXTURES.md row classes) ---
SPAM_SUFFIX = " buy now free discount visit www.spam-example.com"
LOW_ALPHA_TEXT = "12345 67890 99999 000 111 22"
BASE_DATE = "2026-08-01 00:00:00"
FUTURE_DATE = "2027-01-01 00:00:00"
NOW_LITERAL = "2026-08-13 00:00:00"  # parameterized "now" for scoring


def read_yelp_jsonlines(
    spark: SparkSession, path: str, limit: int | None = None, shuffle_seed: int | None = None
) -> DataFrame:
    """S1+S2: lenient JSON-lines scan + source-schema mapping."""
    df = (
        spark.read.schema(YELP_SOURCE_JSON)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    # malformed lines leave every schema field null in PERMISSIVE mode;
    # filtering on review_id (never null in valid data) drops them
    # without referencing _corrupt_record, which Spark refuses to query
    # in isolation (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    df = df.filter(F.col("review_id").isNotNull()).drop("_corrupt_record")
    mapped = df.select(
        F.col("review_id"),
        F.col("business_id"),
        F.col("user_id"),
        F.col("stars").cast("double").alias("rating"),  # producer.py:73 rename
        F.col("text"),
        F.coalesce(
            F.try_to_timestamp(F.col("date"), F.lit(YELP_DATE_FMT)),
            F.current_timestamp(),
        ).alias("date"),  # producer.py:62-66 fallback-to-now (try_: ANSI-safe)
        F.coalesce(F.col("useful"), F.lit(0)).alias("useful"),
        F.coalesce(F.col("funny"), F.lit(0)).alias("funny"),
        F.coalesce(F.col("cool"), F.lit(0)).alias("cool"),
        F.lit("yelp_dataset").alias("source"),
        F.current_timestamp().alias("ingestion_timestamp"),
    )
    # shuffle/limit AFTER the mapping projection: a plan that references
    # only _corrupt_record (e.g. orderBy(rand)) is rejected by Spark
    if shuffle_seed is not None:
        mapped = mapped.orderBy(F.rand(shuffle_seed))  # O2 randomized replay
    if limit is not None:
        mapped = mapped.limit(limit)  # O1
    return mapped


def synthetic_reviews(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic review table derived from documents.parquet.

    Mirrors SYNTH_REVIEWS_SQL exactly — any edit here must be mirrored
    there.
    """
    d = read_fixture(spark, sf_dir, "documents", spread=True)
    k = F.col("doc_id") % 23
    m = F.col("doc_id") % 19
    text = (
        F.when(k == 0, F.lit(None).cast("string"))
        .when(k == 1, F.lit(""))
        .when(k == 2, F.lit("short"))
        .when(k == 3, F.concat(F.col("text"), F.lit(SPAM_SUFFIX)))
        .when(k == 4, F.repeat(F.concat(F.substring(F.col("text"), 1, 100), F.lit(" ")), 120))
        .when(k == 5, F.lit(LOW_ALPHA_TEXT))
        .otherwise(F.col("text"))
    )
    rating = (
        F.when(m == 0, F.lit(None).cast("double"))
        .when(m == 1, F.lit(0.0))
        .when(m == 2, F.lit(6.0))
        .when(m == 3, F.lit(0.5))
        .otherwise((F.lit(1) + F.col("doc_id") % 5).cast("double"))
    )
    date = F.when(
        F.col("doc_id") % 97 == 0, F.to_timestamp(F.lit(FUTURE_DATE))
    ).otherwise(
        F.to_timestamp(F.lit(BASE_DATE))
        - F.make_interval(days=(F.col("doc_id") % 40).cast("int"))
        + F.make_interval(hours=(F.col("doc_id") % 168).cast("int"))
    )
    return d.select(
        F.concat(F.lit("r"), F.col("doc_id")).alias("review_id"),
        F.concat(F.lit("b"), F.col("doc_id") % 20).alias("business_id"),
        F.concat(F.lit("u"), F.col("doc_id") % 100).alias("user_id"),
        rating.alias("rating"),
        text.alias("text"),
        date.alias("date"),
        F.when(F.col("doc_id") % 4 == 0, F.lit(None).cast("bigint"))
        .otherwise(F.col("doc_id") % 10)
        .alias("useful"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(None).cast("bigint"))
        .otherwise(F.col("doc_id") % 7)
        .alias("funny"),
        F.when(F.col("doc_id") % 6 == 0, F.lit(None).cast("bigint"))
        .otherwise(F.col("doc_id") % 3)
        .alias("cool"),
        F.col("source"),
        (date + F.make_interval(hours=F.lit(1))).alias("ingestion_timestamp"),
        F.col("lang").alias("language"),
        stable_round(
            F.lit(0.5) + (F.col("doc_id") % 50).cast("double") / F.lit(100.0), 2
        ).alias("language_confidence"),
    )


# DuckDB CTE producing the identical table (documents view is
# pre-registered by the driver). Keep in lockstep with
# synthetic_reviews() above.
SYNTH_REVIEWS_SQL = f"""
SELECT
  'r' || CAST(doc_id AS VARCHAR) AS review_id,
  'b' || CAST(doc_id % 20 AS VARCHAR) AS business_id,
  'u' || CAST(doc_id % 100 AS VARCHAR) AS user_id,
  CASE doc_id % 19
    WHEN 0 THEN NULL
    WHEN 1 THEN 0.0
    WHEN 2 THEN 6.0
    WHEN 3 THEN 0.5
    ELSE CAST(1 + doc_id % 5 AS DOUBLE)
  END AS rating,
  CASE doc_id % 23
    WHEN 0 THEN NULL
    WHEN 1 THEN ''
    WHEN 2 THEN 'short'
    WHEN 3 THEN text || '{SPAM_SUFFIX}'
    WHEN 4 THEN repeat(substr(text, 1, 100) || ' ', 120)
    WHEN 5 THEN '{LOW_ALPHA_TEXT}'
    ELSE text
  END AS text,
  CASE
    WHEN doc_id % 97 = 0 THEN TIMESTAMP '{FUTURE_DATE}'
    ELSE TIMESTAMP '{BASE_DATE}'
         - INTERVAL (doc_id % 40) DAY + INTERVAL (doc_id % 168) HOUR
  END AS date,
  CASE WHEN doc_id % 4 = 0 THEN NULL ELSE doc_id % 10 END AS useful,
  CASE WHEN doc_id % 5 = 0 THEN NULL ELSE doc_id % 7 END AS funny,
  CASE WHEN doc_id % 6 = 0 THEN NULL ELSE doc_id % 3 END AS cool,
  source,
  (CASE
    WHEN doc_id % 97 = 0 THEN TIMESTAMP '{FUTURE_DATE}'
    ELSE TIMESTAMP '{BASE_DATE}'
         - INTERVAL (doc_id % 40) DAY + INTERVAL (doc_id % 168) HOUR
  END) + INTERVAL 1 HOUR AS ingestion_timestamp,
  lang AS language,
  (CAST(floor((0.5 + CAST(doc_id % 50 AS DOUBLE) / 100.0) * 100.0 + 0.5) AS DOUBLE) / 100.0) AS language_confidence
FROM documents
"""
