"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>}

Execution is forced with the noop datasource writer (full pipeline
runs, nothing collected to the driver). A small warmup job absorbs
JVM/codegen startup so per-query times reflect steady state.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402
from yelp_streaming_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: every operator family, weighted toward the scan/shuffle
# heavy ones that dominate at scale.
HEADLINE = [
    "clean_reviews",
    "quality_issues",
    "review_stats",
    "events_hourly",
    "sessionize_events",
    "pricing_summary",
    "revenue_by_nation",
    "top_customers",
    "supplier_running_revenue",
    "rollup_revenue",
    "cube_revenue",
    "customer_quartiles",
    "top_orders_per_segment",
    "salted_event_counts",
    "numeric_profile",
    "distinct_daily_users",
    "event_type_pivot",
    "value_percentiles",
    "props_extract",
    "returning_users",
    "top_bigrams",
    "tfidf_keywords",
    "dedup_exact",
    "neardup_minhash",
    "simhash_signatures",
    "simhash_pairs",
    "duplicated_passages",
    "text_analysis",
    "gopher_quality",
    "repetition_profile",
    "doc_chunks",
    "bloom_registers",
    "bloom_probe",
    "dedup_quality_prune",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_lsh_multiprobe",
    "ann_ivf_topk",
    "ann_quantized_topk",
    "purchase_prior_click",
    "click_purchase_5min",
    "dedup_clusters",
    "stratified_sample",
    "train_test_split",
    "class_capped_sample",
    "latest_event_per_user",
    "user_event_intervals",
    "hll_registers",
    "hll_estimate",
    "cms_counters",
    "cms_heavy_hitters",
    "value_histogram",
    "lapsed_users",
    "sliding_hourly_stats",
    "lang_id",
    "lm_score",
    "token_budget_pack",
    "decontaminate",
    "training_corpus",
    # sessionize_stream (applyInPandasWithState) is correctness-gated in
    # queries() but excluded here: its cost is streaming-machinery fixed
    # overhead (state store init, per-batch planning), not data-path
    # throughput, and it would swamp the batch suite signal at sf0.1.
]


def sf_from_dir(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    spark = get_spark("bench")
    qs = E.queries()

    # warmup: JVM + codegen + parquet footer caches
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs["pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    # The suite runs as two full passes. Pass 1 is cold (codegen/Janino
    # compile included); pass 2 is steady state — the number that
    # scales, since per-plan compile is a fixed cost that amortizes to
    # zero over any real data volume. The shared gauntlet persist
    # (__spark_entry__._staged) is reset BETWEEN passes, so each pass
    # recomputes it exactly once and the intra-suite sharing (the
    # reference's compute-once-route-many topology) is preserved.
    passes: list[dict[str, float]] = []
    for _ in range(2):
        for df in E._STAGED_CACHE.values():
            df.unpersist()
        E._STAGED_CACHE.clear()
        t: dict[str, float] = {}
        for name in HEADLINE:
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            t[name] = round(time.perf_counter() - t0, 3)
        passes.append(t)
    cold, times = passes

    total = round(sum(times.values()), 3)

    # Throughput vs the reference's documented 1,000 rec/s stress rate
    # (producer.py:242): the full clean->validate->score pass over a
    # 20x-replicated review corpus, steady state.
    from pyspark.sql import functions as F  # noqa: E402

    from yelp_streaming_etl_pipeline_spark.operators import gauntlet as G
    from yelp_streaming_etl_pipeline_spark.sources.reviews import (
        synthetic_reviews,
    )

    reviews = synthetic_reviews(E._ensure_conf(spark), SF_DIR)
    scaled = (
        reviews.crossJoin(spark.range(20).select(F.col("id").alias("_rep")))
        .withColumn("review_id", F.concat_ws("-", "review_id", "_rep"))
        .drop("_rep")
    )
    n_rows = scaled.count()
    staged = G.score_reviews(G.validate_reviews(scaled, E._now()), E._now())
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        staged.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "headline_suite_steady_runtime",
                "value": total,
                "unit": "sec",
                "queries": times,
                "cold_total": round(sum(cold.values()), 3),
                "pipeline_rows": n_rows,
                "pipeline_rps": round(n_rows / best),
                "sf": sf_from_dir(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
