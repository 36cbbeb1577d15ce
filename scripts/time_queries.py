"""Targeted per-query timing for the optimization loop.

Usage: python scripts/time_queries.py <name> [name ...]

Same methodology as bench.py (noop sink, warmup, 1 cold + 3 steady
passes, median of steady, GC between queries, cache reset between
passes) but only for the named entries — so one optimization can be
re-measured in minutes instead of re-running the whole suite.
Prints one JSON line {name: median_sec, ...}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from yelp_streaming_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))


def _jvm_gc(spark) -> None:
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


def _reset_caches(spark) -> None:
    for df in E._STAGED_CACHE.values():
        df.unpersist()
    E._STAGED_CACHE.clear()
    spark.catalog.clearCache()
    _jvm_gc(spark)


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark(
        "time_queries",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = E.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs["pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    passes: list[dict[str, float]] = []
    for _ in range(1 + PASSES):
        _reset_caches(spark)
        t: dict[str, float] = {}
        for name in names:
            _jvm_gc(spark)
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            t[name] = round(time.perf_counter() - t0, 3)
        passes.append(t)
    med = {
        name: round(statistics.median(p[name] for p in passes[1:]), 3)
        for name in names
    }
    print(json.dumps(med))


if __name__ == "__main__":
    main()
