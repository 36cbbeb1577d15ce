"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[N]`` but every knob here is chosen so the
same code runs unchanged on a multi-executor cluster:

- AQE on (runtime coalescing, skew-join splitting) so shuffle
  partitioning self-tunes at any scale factor.
- shuffle partitions sized to cores locally; on a real cluster AQE's
  ``advisoryPartitionSizeInBytes`` takes over.
- UTC session timezone (required for DuckDB-oracle comparison, and the
  only sane choice for event-time pipelines).
- Arrow enabled for the few pandas-UDF paths (language ID fallback,
  multimodal decode).
- RocksDB state store for streaming state (reference keeps dedup/stats
  state in RocksDB too: /root/reference/streaming/faust_app.py:25).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "yelp_streaming_etl_pipeline_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    # local mode runs executors inside the driver JVM, whose DEFAULT
    # heap is 1g — at 32 threads that starves shuffle spill buffers
    # long before the machine's RAM does (observed: heap OOM inside
    # UnsafeExternalSorter.spill on a 10x fixture blow-up while the
    # box had >100 GiB free). 4g measured best: the full bench suite
    # matches the 1g time while pipeline rps improves ~15%, and the
    # 10x blow-up stops OOMing; 16g was ~15% SLOWER across the suite
    # (longer G1 pauses with 32 task threads). Only effective if set
    # before the JVM starts, i.e. on the process's first getOrCreate
    # — exactly how bench/scripts/tests use this factory. On a real
    # cluster executor memory is the cluster manager's knob.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
