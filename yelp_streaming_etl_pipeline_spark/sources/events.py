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


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = read_fixture(spark, sf_dir, "events")
    if dict(df.dtypes)["ts"] == "bigint":
        # Integer division — a double round-trip loses 1 microsecond on
        # epoch-nanos magnitudes (> 2^53).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
