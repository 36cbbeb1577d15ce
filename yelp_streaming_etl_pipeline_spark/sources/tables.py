"""Parquet table reader with a small-input parallelism guard.

A single small parquet file (one row group) scans as ONE task, which
serializes every downstream CPU-heavy expression (the regex gauntlet,
shingling, hashing) onto one core no matter how many the session has.
File-split tuning (``spark.sql.files.maxPartitionBytes`` /
``minPartitionNum``) cannot help there: parquet splits at row-group
boundaries, and the fixture files have exactly one row group.

``read_table(spread=True)`` therefore round-robin repartitions ONLY
when the scan is both demonstrably under-parallelized (fewer partitions
than cores) and cheap to move (local input under ``SMALL_INPUT_BYTES``).
At production scale — many files / many row groups per file,
object-store paths — the guard fails and the read is returned
untouched, so no shuffle is ever added to a large scan. Catalyst still
pushes filters and column pruning through the Repartition node down to
the parquet scan.

``spread`` is opt-in, an explicit declaration that downstream work is
CPU-bound per row (regex gauntlet, shingling, hashing, vector math).
Scan-then-shuffle queries (plain aggregations, joins, exact dedup)
must NOT spread: they shuffle on their own keys anyway, and measured
at sf0.1 the extra exchange is a net loss for them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Above this size the native file splitting is trusted to parallelize.
SMALL_INPUT_BYTES = 1 << 30  # 1 GiB


def _local_size(path: str) -> int | None:
    """Size in bytes for local paths, None when not cheaply stat-able
    (object stores, globs) — in which case we never repartition."""
    p = path.removeprefix("file://")
    if "://" in p:
        return None
    try:
        if os.path.isdir(p):
            return sum(
                os.path.getsize(os.path.join(root, f))
                for root, _dirs, files in os.walk(p)
                for f in files
            )
        return os.path.getsize(p)
    except OSError:
        return None


def read_table(
    spark: SparkSession, path: str, spread: bool = False
) -> DataFrame:
    """Read parquet; optionally spread small single-split inputs across
    all cores for CPU-bound downstream pipelines."""
    df = spark.read.parquet(path)
    if not spread:
        return df
    size = _local_size(path)
    if size is None or size > SMALL_INPUT_BYTES:
        return df
    parallelism = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= parallelism:
        return df
    return df.repartition(parallelism)


def read_fixture(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Read one of the driver's fixture tables by name."""
    return read_table(spark, f"{sf_dir}/{name}.parquet", spread=spread)
