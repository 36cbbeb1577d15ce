"""Events-table reader.

The driver's events.parquet stores ``ts`` as parquet
TIMESTAMP(NANOS) which Spark's vectorized reader rejects
(PARQUET_TYPE_ILLEGAL). We read it via the legacy nanos-as-long path
and rebuild a microsecond TimestampType column — lossless for every
operation here (hour/minute windows, sessionization gaps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import read_fixture


def convert_event_ts(df: DataFrame) -> DataFrame:
    """nanos-as-long ``ts`` -> microsecond TimestampType (lossless for
    every operation here). Integer division — a double round-trip loses
    1 microsecond on epoch-nanos magnitudes (> 2^53)."""
    if dict(df.dtypes)["ts"] == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return convert_event_ts(read_fixture(spark, sf_dir, "events"))


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of read_events (file source over the fixture)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file source requires a DIRECTORY path; select just the events
    # file out of the fixture dir with a glob filter
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return convert_event_ts(stream)
