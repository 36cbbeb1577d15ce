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
    """Normalize ``ts`` to microsecond TimestampType (LTZ) whatever the
    reader produced:

    - nanos-as-long (legacy path): integer division — a double
      round-trip loses 1 microsecond on epoch-nanos magnitudes (> 2^53);
    - TIMESTAMP_NTZ (how Spark 4 reads tz-less parquet timestamps when
      the legacy conf isn't picked up, e.g. a stream planned before the
      conf was set): cast explicitly to ``timestamp_ltz`` — immune to
      the ``spark.sql.timestampType`` session config, and the instant
      is unchanged because the session is pinned UTC. Watermarks and
      ``unix_micros`` both reject NTZ, so this must happen at the
      source.
    """
    dt = dict(df.dtypes)["ts"]
    if dt == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
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
