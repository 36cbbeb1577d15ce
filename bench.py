"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>}

Execution is forced with the noop datasource writer (full pipeline
runs, nothing collected to the driver). A small warmup job absorbs
JVM/codegen startup so per-query times reflect steady state.

Measurement hygiene (round-3): one cold pass (codegen/Janino compile
included) then STEADY_PASSES full passes; the reported per-query time
is the MEDIAN across steady passes, so a one-off GC pause or compile
hiccup can't masquerade as a regression. Between queries the JVM is
GC'd OUTSIDE the timed region (each query starts from a clean heap);
between passes every cache — including caches leaked by query-internal
.persist() calls — is dropped and the shared gauntlet intermediate is
reset, so each pass recomputes it exactly once (the reference's
compute-once-route-many topology, faust_app.py:131-170).

Signal separation (round-10, VERDICT r9 #1): three effects are
disentangled WITHIN one artifact — (host) the two heavy calibration
probes run interleaved at start/mid/end of every pass
("inline_calibration"); (suite-context) the isolated reprobe set runs
both BEFORE the suite in a fresh session ("isolated_reprobe") and
AFTER it in the polluted one ("isolated_reprobe_after"); (code)
iso-before compared against the previous round's iso-before.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402
from yelp_streaming_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
STEADY_PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))

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
    "cdc_chunk_pairs",
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
    # round-3 additions
    "pii_profile",
    "pii_redact",
    "zorder_layout",
    "embedding_project",
    "semantic_dedup",
    "kmeans_clusters",
    "hard_negatives",
    "cluster_balanced_sample",
    "quality_classifier",
    "semantic_decontaminate",
    "event_funnel",
    "user_cohorts",
    "pagerank_nodes",
    "hll_set_ops",
    "cms_join_size",
    "event_zscores",
    "user_value_ewma",
    "events_resample_ffill",
    "cusum_changepoints",
    "table_stats_profile",
    "frame_sample_plan",
    "hll_by_type",
    "personalized_pagerank",
    "bpe_merges",
    "bpe_token_counts",
    "sql_surface_q4",
    # round-4 additions
    "lang_id_prefix",
    "pagerank_weighted",
    "quantile_sketch",
    "quantile_estimate",
    "bpe_merges_bytes",
    "bpe_bytes_token_counts",
    "quantile_by_type",
    "sql_surface_q13",
    "sql_surface_q2",
    "sql_surface_q21",
    "cosupply_triangles",
    "bfs_levels",
    "winnowing_fingerprints",
    "salted_skew_join",
    "winnow_neardup",
    "cosupply_clustering",
    "ann_sharded_topk",
    "sql_surface_q16",
    "sql_surface_q18",
    "bigram_lift",
    "jsonl_roundtrip",
    "sql_surface_groupingsets",
    "sql_surface_lateral",
    "table_fingerprints",
    "schema_evolution_read",
    "bucketed_join",
    "partition_overwrite_backfill",
    "constraint_audit",
    "bloom_pruned_join",
    "cosupply_communities",
    "fingerprint_incremental",
    # round-5 additions: every remaining BATCH entry is benched; only
    # the names in BENCH_EXCLUDED (with per-entry reasons) are not.
    "order_priority_counts",
    "customers_without_orders",
    "parts_with_shipments",
    "histogram_median",
    "media_features",
    "media_dims_audit",
    "payload_chunk_manifest",
    "text_features",
    "review_stats_overall",
    "acceptance_summary",
    "issue_counts",
    "dedup_reviews",
    "duplicate_issues",
    "dedup_corpus_prune",
    "embedding_neardup",
    "neardup_ngram",
    "mixture_sample",
    "pps_sample",
    "user_value_ewma_segmented",
    "sql_surface_q3",
    "sql_surface_q5",
    "sql_surface_q10",
    "sql_surface_q14",
    "sql_surface_q19",
    "sql_surface_q22",
    "mmr_topk",
    "cosupply_kcore",
    "sql_surface_q7",
    "sql_surface_q17",
    "measures_unpivot",
    "pps_wor_sample",
    "sql_surface_q8",
    "sql_surface_q12",
    "sql_surface_q1",
    "sql_surface_q6",
    "sql_surface_q9",
    "sql_surface_q11",
    "sql_surface_q15",
    "sql_surface_q20",
    "ann_ivfpq_topk",
    "boilerplate_lines",
    "entity_clusters",
    "pq_codebooks_kmeans",
    "audio_meta_audit",
    # round-7 additions
    "wordpiece_doc_scores",
    "table_stats_deep",
    "bm25_topk",
    "dedup_eval_minhash",
    "ngram_novelty",
    "bottomk_sample",
    # round-8 additions
    "exact_substring_spans",
    "exact_substring_removal",
    "stratified_budget_sample",
    "dsir_importance",
    "unigram_lm_scores",
    "dsir_topk",
    # round-8 continuation additions (batch side; the six new
    # *_maintenance_stream forms are excluded with the standard
    # streaming-overhead reason)
    "exact_substring_spans_bytes",
    "exact_substring_removal_bytes",
    "unigram_em_refine",
    "bigram_lm_scores",
    "paragraph_dedup",
    "lm_filter_roc",
    "lm_filter_mix_shift",
    "unigram_em_scores",
    # round-9 additions
    "unigram_em_loop",
    "exact_substring_spans_bpe",
    "quality_quota_sample",
    # round-10 additions
    "exact_substring_removal_bpe",
    "unigram_em_schedule",
    "bm25_topk_bpe",
    "dsir_quota_sample",
    "bm25_cross_topk",
    "unigram_em_schedule_scores",
    "dsir_budget_pack",
    "bm25_cross_topk_bpe",
    # round-11 additions
    "dsir_mixture_pack",
    "cdc_chunk_pairs_bpe",
    "unigram_schedule_export_scores",
    "cdc_chunk_dedup",
    "kn_bigram_scores",
]

# Entries deliberately NOT in the headline suite — each with the reason.
# main() asserts HEADLINE + BENCH_EXCLUDED covers queries() exactly, so
# a new entry cannot silently skip the bench.
_STREAM_OVERHEAD = (
    "streaming entry: cost is fixed streaming machinery (state-store "
    "init, per-micro-batch planning, checkpoint IO), not data-path "
    "throughput - would swamp the batch signal at sf0.1"
)
BENCH_EXCLUDED = {
    "sessionize_stream": _STREAM_OVERHEAD,
    "dedup_stream": _STREAM_OVERHEAD,
    "windowed_events_stream": _STREAM_OVERHEAD,
    "trending_stream": _STREAM_OVERHEAD,
    "trending_update_stream": _STREAM_OVERHEAD,
    "enriched_events_stream": _STREAM_OVERHEAD,
    "attributed_purchases_stream": _STREAM_OVERHEAD,
    "attributed_purchases_outer_stream": _STREAM_OVERHEAD,
    "attributed_purchases_full_outer_stream": _STREAM_OVERHEAD,
    "hll_registers_stream": _STREAM_OVERHEAD,
    "cms_topk_stream": _STREAM_OVERHEAD,
    "events_hourly_update_stream": _STREAM_OVERHEAD,
    "user_value_ewma_stream": _STREAM_OVERHEAD,
    "dedup_watermark_stream": _STREAM_OVERHEAD,
    "dedup_watermark_multibatch_stream": _STREAM_OVERHEAD,
    "session_window_stream": _STREAM_OVERHEAD,
    "session_window_multibatch_stream": _STREAM_OVERHEAD,
    "kcore_maintenance_stream": _STREAM_OVERHEAD,
    "lpa_maintenance_stream": _STREAM_OVERHEAD,
    "entity_maintenance_stream": _STREAM_OVERHEAD,
    "neardup_maintenance_stream": _STREAM_OVERHEAD,
    "kmeans_maintenance_stream": _STREAM_OVERHEAD,
    "semantic_dedup_maintenance_stream": _STREAM_OVERHEAD,
    "quantile_sketch_stream": _STREAM_OVERHEAD,
    "pagerank_maintenance_stream": _STREAM_OVERHEAD,
    "cdc_maintenance_stream": _STREAM_OVERHEAD,
    "attributed_purchases_semi_stream": _STREAM_OVERHEAD,
    "bm25_maintenance_stream": _STREAM_OVERHEAD,
    "bm25_maintenance_stream_bpe": _STREAM_OVERHEAD,
    "bm25_cross_maintenance_stream_bpe": _STREAM_OVERHEAD,
    "cdc_maintenance_stream_bpe": _STREAM_OVERHEAD,
    "cdc_chunk_dedup_maintenance_stream": _STREAM_OVERHEAD,
    "kn_bigram_maintenance_stream": _STREAM_OVERHEAD,
    "dsir_maintenance_stream": _STREAM_OVERHEAD,
    "dsir_mixture_pack_maintenance_stream": _STREAM_OVERHEAD,
    "bottomk_sample_stream": _STREAM_OVERHEAD,
    "stratified_budget_sample_stream": _STREAM_OVERHEAD,
    "exact_substring_maintenance_stream": _STREAM_OVERHEAD,
    "exact_substring_maintenance_stream_bpe": _STREAM_OVERHEAD,
    "exact_substring_removal_maintenance_stream_bpe": _STREAM_OVERHEAD,
    "bigram_lm_maintenance_stream": _STREAM_OVERHEAD,
    "paragraph_dedup_maintenance_stream": _STREAM_OVERHEAD,
    "pagerank_weighted_maintenance_stream": _STREAM_OVERHEAD,
    "personalized_pagerank_maintenance_stream": _STREAM_OVERHEAD,
    "simhash_maintenance_stream": _STREAM_OVERHEAD,
    "topic_roundtrip_reviews": (
        "file-topic shim round trip: measures tmpdir write+read of the "
        "Kafka stand-in, i.e. local disk, not engine throughput"
    ),
    "corpus_upsert": (
        "replay-safe streaming ingest: foreachBatch + epoch-upsert "
        "sink, same fixed streaming/IO overhead profile as the "
        "_stream entries"
    ),
    "io_roundtrip_formats": (
        "writes and re-reads parquet/json/csv to tmpdir - measures "
        "local disk and format codecs, not query execution"
    ),
}


def sf_from_dir(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


def _jvm_gc(spark) -> None:
    """Force a JVM GC from the driver — run between queries, OUTSIDE
    the timed region, so one query's garbage can't tax the next."""
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


def _reset_caches(spark) -> None:
    """Pass boundary: drop the shared gauntlet intermediate AND every
    cache left behind by query-internal .persist() calls (banded
    simhash tables etc. are cached per-call and the handles discarded
    — without this they accumulate across 59 queries x N passes and
    the later passes pay their memory pressure)."""
    for df in E._STAGED_CACHE.values():
        df.unpersist()
    E._STAGED_CACHE.clear()
    spark.catalog.clearCache()
    _jvm_gc(spark)


def _recycle_session(spark, qs):
    """Mid-suite session recycle (VERDICT r8 directive #3): with 180+
    benched entries the in-suite variance band (steady-pass totals
    spanned 290-318 s in r8) exceeded most real round-over-round
    deltas — heap/JIT context accumulated over a whole pass taxes the
    tail entries. Stopping the SparkContext drops every executor
    block, cache, and shuffle file; the fresh context starts the
    second half of each pass from a clean heap (the JVM — and its JIT
    code cache — persists, so no recompile storm). The fresh session
    is WARMED before timing resumes (range-sum + one parquet-scanning
    query, the same warmup the suite start gets) — the first r9 run
    skipped this and every post-midpoint entry paid fresh-session
    scan/codegen costs each pass (median entry ratio 1.22x vs r8,
    review_stats_overall 4.4x). Runs OUTSIDE any timed region.

    MEASURED OUTCOME (r9, default now OFF): with the warmup the
    in-suite total still ran ~+20% over r8 (386.6 s vs 300.7 + ~20 s
    of new entries) while the ISOLATED reprobe sat exactly at r8
    levels (personalized_pagerank 3.28 vs 3.32, table_stats_profile
    2.58 vs 2.61, pq_codebooks 6.21 vs 6.28) — the restart trades
    late-pass heap pressure for post-restart cold-scan costs and
    breaks round-over-round comparability of in-suite medians. Per
    VERDICT r8 #3's alternative arm, the isolated_reprobe set is the
    code-tracking signal (extended to the r8 in-suite movers) and the
    recycle stays available behind SPARK_GRAFT_BENCH_RECYCLE=1."""
    _reset_caches(spark)
    spark.stop()
    E._STAGED_CACHE.clear()  # stale handles from the stopped session
    fresh = get_spark(
        "bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    fresh.range(1_000_000).selectExpr("sum(id)").collect()
    qs["pricing_summary"](fresh, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    return fresh


def _heavy_probes(spark) -> dict[str, float]:
    """One run each of the two HEAVY calibration probes (same bodies
    as calibration(), single iteration): cheap enough (~4 s) to
    interleave at suite start/midpoint/end so host-speed drift DURING
    the suite is visible inside one artifact (VERDICT r9 #1 — the r9
    run showed +27% in-suite totals with flat end-of-run calibration,
    and the instrument could not say whether the host was slower
    while the suite ran)."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    t0 = time.perf_counter()
    spark.range(6_000_000_000).selectExpr(
        "sum(id % 9973)",
        "sum(((id % 1048573) * 2654435761) % 7919)",
    ).collect()
    cpu_h = time.perf_counter() - t0
    t0 = time.perf_counter()
    (
        li.crossJoin(spark.range(8).select(F.col("id").alias("_rep")))
        .groupBy("l_orderkey", "_rep")
        .agg(
            F.sum("l_extendedprice").alias("s"),
            F.count("*").alias("n"),
        )
        .agg(F.sum("s"), F.sum("n"))
        .collect()
    )
    shuf_h = time.perf_counter() - t0
    return {
        "cpu_heavy_sec": round(cpu_h, 3),
        "shuffle_heavy_sec": round(shuf_h, 3),
    }


def run_suite(spark, qs):
    """One cold pass + STEADY_PASSES steady passes, with an OPTIONAL
    mid-pass session recycle behind SPARK_GRAFT_BENCH_RECYCLE=1
    (default off per the measured r9 outcome — see _recycle_session).
    The two heavy calibration probes run at the start, midpoint, and
    end of EVERY pass (outside the per-entry timed regions) so host
    drift during the suite separates numerically from suite-context
    and code effects within one artifact (VERDICT r9 #1). Returns
    (per-query median of steady passes, all per-pass dicts [cold
    first], per-pass probe triplets, live session)."""
    passes: list[dict[str, float]] = []
    probes: list[dict[str, dict[str, float]]] = []
    recycle = os.environ.get("SPARK_GRAFT_BENCH_RECYCLE", "0") == "1"
    mid = len(HEADLINE) // 2
    for _ in range(1 + STEADY_PASSES):
        _reset_caches(spark)
        t: dict[str, float] = {}
        p: dict[str, dict[str, float]] = {"start": _heavy_probes(spark)}
        for i, name in enumerate(HEADLINE):
            if i == mid:
                if recycle:
                    spark = _recycle_session(spark, qs)
                p["mid"] = _heavy_probes(spark)
            _jvm_gc(spark)
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            t[name] = round(time.perf_counter() - t0, 3)
        p["end"] = _heavy_probes(spark)
        passes.append(t)
        probes.append(p)
    steady = passes[1:]
    med = {
        name: round(statistics.median(p[name] for p in steady), 3)
        for name in HEADLINE
    }
    return med, passes, probes, spark


def calibration(spark) -> dict[str, float]:
    """Code-independent machine-speed reference, for normalizing
    per-query times ACROSS rounds: the same host can differ 1.5-2x
    between bench runs (host contention/throttling — observed r4->r5).
    Four probes, median of 3. The two LIGHT probes (range-sum,
    lineitem scan+reduce) are kept verbatim for continuity with the
    r1-r7 record, but they finish in ~0.1 s and are dominated by
    fixed JVM/task overhead (r6->r7 they moved ~4x while heavy-query
    medians moved <=1.4x) — do NOT linearly normalize heavy queries
    with them. The two HEAVY probes (round-8) run 2-5 s in the same
    regime as the expensive suite entries — sustained codegen'd CPU
    (hash/mod arithmetic over a long range) and a real shuffle
    (8x-replicated lineitem group-aggregate) — and are the ones to
    use for cross-round normalization of heavy queries."""
    import statistics as _st

    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    cpu, scan, cpu_h, shuf_h = [], [], [], []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(1_000_000_000).selectExpr("sum(id)").collect()
        cpu.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        li.selectExpr("sum(l_extendedprice)", "count(*)").collect()
        scan.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        # id is reduced mod 2^20-ish BEFORE the multiply so the
        # product stays under 2^63 at any range size (ANSI overflow)
        spark.range(6_000_000_000).selectExpr(
            "sum(id % 9973)",
            "sum(((id % 1048573) * 2654435761) % 7919)",
        ).collect()
        cpu_h.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        (
            li.crossJoin(spark.range(8).select(F.col("id").alias("_rep")))
            .groupBy("l_orderkey", "_rep")
            .agg(
                F.sum("l_extendedprice").alias("s"),
                F.count("*").alias("n"),
            )
            .agg(F.sum("s"), F.sum("n"))
            .collect()
        )
        shuf_h.append(time.perf_counter() - t0)
    return {
        "range_sum_sec": round(_st.median(cpu), 3),
        "lineitem_scan_sec": round(_st.median(scan), 3),
        "cpu_heavy_sec": round(_st.median(cpu_h), 3),
        "shuffle_heavy_sec": round(_st.median(shuf_h), 3),
    }


def longdoc_probe(spark) -> dict[str, float | int]:
    """Per-op timings on synthetic LONG documents (~50k chars,
    deterministic): the suite's documents are short, so per-row-
    SUPERLINEAR text ops are invisible to the headline numbers — the
    O(n^2) substr-in-fold CDC chunk scan benched fine at sf0.1 for
    two rounds before the round-7 fix. Every op here must scale
    near-linearly in document length; a quadratic one shows up as a
    10-50x outlier against its headline cost. Best of 2 passes.

    NOTE (windows audit, round 6): the headline tail's repeated
    'WindowExec: No Partition Defined' warnings are the documented
    small-table windows (token-budget bucket offsets, <=256-row sketch
    register cumsums, ranked-sample top-k compiling to
    TakeOrderedAndProject) — all bounded, none data-proportional
    (plan-asserted at tests/test_plans.py:325,144). Not a defect."""
    from pyspark.sql import functions as F

    from yelp_streaming_etl_pipeline_spark.functions.language import (
        with_lang_id,
    )
    from yelp_streaming_etl_pipeline_spark.operators import dedup as DD
    from yelp_streaming_etl_pipeline_spark.operators import corpus as CP
    from yelp_streaming_etl_pipeline_spark.operators import (
        corpus_quality as CQ,
    )
    from yelp_streaming_etl_pipeline_spark.operators import (
        text_analysis as TA,
    )
    from yelp_streaming_etl_pipeline_spark.operators import tokenizer as TK

    n_docs, n_words = 64, 8_334  # ~50k chars of 'w<digits>' words
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(n_words)),
                    lambda i: F.concat(
                        F.lit("w"),
                        F.pmod(i * 2654435761 + F.col("id"), F.lit(9973)),
                    ),
                ),
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    doc_chars = docs.agg(F.sum(F.length("text"))).collect()[0][0] // n_docs
    ops = {
        "cdc_chunks": lambda: DD.cdc_chunks(docs, "text", "doc_id"),
        "winnowing_fingerprints": lambda: DD.winnowing_fingerprints(docs),
        "text_analysis": lambda: TA.analyze_documents(docs),
        "repetition_profile": lambda: CQ.repetition_profile(docs),
        "lang_id_full": lambda: with_lang_id(
            docs, "text", method="trigram", id_col="doc_id"
        ),
        "lang_id_prefix": lambda: with_lang_id(
            docs, "text", method="trigram", id_col="doc_id", max_chars=256
        ),
        "wordpiece_doc_scores": lambda: TK.wordpiece_doc_scores(docs),
        # round-8 breadth: the remaining text-heavy ops, so the WHOLE
        # per-document-cost class is probed, not just the five fixed
        # in round 7
        "minhash_pairs": lambda: DD.minhash_lsh_pairs(
            docs, "text", "doc_id"
        ),
        "bm25_topk": lambda: TA.bm25_topk(docs),
        "ngram_novelty": lambda: DD.ngram_novelty(
            docs.filter(F.col("doc_id") % 2 == 1),
            docs.filter(F.col("doc_id") % 2 == 0),
        ),
        "quality_classifier": lambda: CQ.quality_classifier(docs),
        "gopher_quality": lambda: CQ.gopher_quality(docs),
        "exact_substring_spans": lambda: DD.exact_substring_spans(docs),
        "exact_substring_removal": lambda: DD.exact_substring_removal(
            docs
        ),
        "dsir_importance": lambda: CP.dsir_importance(
            docs.filter(F.col("doc_id") % 2 == 0),
            docs.filter(F.col("doc_id") % 2 == 1),
        ),
        "unigram_lm_scores": lambda: TK.unigram_lm_scores(docs),
        # round-8 late additions: byte-level windows are the heaviest
        # per-byte text op in the repo (n_bytes md5s per doc) and the
        # EM refinement re-runs the DP with full path recovery —
        # both must stay linear in document length
        "exact_substring_spans_bytes": lambda: (
            DD.exact_substring_spans_bytes(docs)
        ),
        "unigram_em_refine": lambda: TK.unigram_em_refine(docs),
        "unigram_em_scores": lambda: TK.unigram_em_scores(docs),
        "bigram_lm_scores": lambda: CQ.bigram_lm_scores(
            docs.filter(F.col("doc_id") % 2 == 1),
            docs.filter(F.col("doc_id") % 2 == 0),
        ),
        "exact_substring_removal_bytes": lambda: (
            DD.exact_substring_removal_bytes(docs)
        ),
        # round-9 additions: the R-round EM trainer (3x em_refine's
        # distinct-word DP work) and token-space dedup (BPE learn +
        # broadcast vocab join + piece-window hashing) must both stay
        # linear in document length
        "unigram_em_loop": lambda: TK.unigram_em_loop(docs),
        "exact_substring_spans_bpe": lambda: (
            DD.exact_substring_spans_bpe(docs)
        ),
        # round-10 additions: BPE-space removal reuses the spans
        # machinery plus gap slicing (must stay linear like the byte
        # form); the schedule triples the distinct-word DP like the
        # loop; BPE-piece BM25's postings explode is the
        # length-dependent stage to watch
        "exact_substring_removal_bpe": lambda: (
            DD.exact_substring_removal_bpe(docs)
        ),
        "unigram_em_schedule": lambda: TK.unigram_em_schedule(docs),
        "bm25_topk_bpe": lambda: TA.bm25_topk_bpe(docs),
        "bm25_cross_topk": lambda: TA.bm25_cross_topk(
            docs.filter(F.col("doc_id") % 2 == 0),
            docs.filter(F.col("doc_id") % 2 == 1),
        ),
        # round-10 late extensions (first longdoc baselines in r11's
        # artifact — added after the r10 bench run launched): the
        # scheduled scorer re-runs the distinct-word DP; budget
        # packing's per-doc cost is the regex token count
        "unigram_em_schedule_scores": lambda: (
            TK.unigram_em_schedule_scores(docs)
        ),
        "dsir_budget_pack": lambda: CP.dsir_budget_pack(
            docs.filter(F.col("doc_id") % 2 == 0),
            docs.filter(F.col("doc_id") % 2 == 1),
        ),
        # round-11 additions: the mixture pack adds only the
        # per-source split to budget_pack's per-doc costs (gram
        # hashing + regex token count — both linear); piece-space CDC
        # is a rolling md5 over the piece stream (one hash per piece
        # position — the length-proportional stage to watch). The
        # longdoc corpus is non-alpha, so the BPE piece stages idle
        # (documented for spans_bpe in round 9) — these probe the
        # length-dependent split/scan path, sf0.1 carries the piece
        # signal. dsir_mixture_pack needs a source column: derive one
        # from doc_id (3 synthetic sources).
        "dsir_mixture_pack": lambda: CP.dsir_mixture_pack(
            docs.filter(F.col("doc_id") % 2 == 0).withColumn(
                "source",
                F.concat(F.lit("s"), (F.col("doc_id") % 3).cast("string")),
            ),
            docs.filter(F.col("doc_id") % 2 == 1),
        ),
        "cdc_chunk_pairs_bpe": lambda: DD.cdc_chunk_pairs_bpe(docs),
        # KN adds three model-sized joins over the same bigram
        # stream as the MLE scorer — identical length dependence
        "kn_bigram_scores": lambda: CQ.kn_bigram_scores(
            docs.filter(F.col("doc_id") % 2 == 1),
            docs.filter(F.col("doc_id") % 2 == 0),
        ),
    }
    out: dict[str, float | int] = {
        "n_docs": n_docs, "doc_chars": int(doc_chars),
    }
    for name, fn in ops.items():
        best = float("inf")
        for _ in range(2):
            _jvm_gc(spark)
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[f"{name}_sec"] = round(best, 3)
    docs.unpersist()
    return out


# The round-7 finding: in-suite medians run ~1.2x (one entry 1.4x)
# above a clean session UNIFORMLY — heap/JIT context after 160+
# queries, not code. These entries are re-timed in a FRESH session
# before the suite runs, so a judge can separate machine effects
# (calibration), suite-context effects (isolated vs in-suite delta),
# and code effects (isolated vs last round's isolated) numerically.
ISOLATED_REPROBE = [
    "personalized_pagerank",
    "cosupply_communities",
    "pagerank_weighted",
    "table_stats_profile",
    # round-9 extension (VERDICT r8 #3 alternative arm): the entries
    # whose r8 in-suite medians moved >1.25x with unchanged code join
    # the suite-context-free signal
    "dedup_eval_minhash",
    "simhash_pairs",
    "bfs_levels",
    # round-8 extension (VERDICT r7 / round-9 queue #2): the two
    # slowest remaining iterative entries join the code-tracking
    # signal, so every iteration-heavy family has a suite-context-free
    # number
    "cosupply_triangles",
    "pq_codebooks_kmeans",
]


def isolated_reprobe(spark, qs) -> dict[str, float]:
    """Steady-state per-query seconds measured BEFORE the headline
    suite has touched the session: 2 warmup passes (discarded — JIT
    is still compiling on the first) + 3 steady passes, median — the
    same methodology as run_suite, minus the 160+-query context."""
    out: dict[str, float] = {}
    for name in ISOLATED_REPROBE:
        times = []
        for i in range(5):
            _jvm_gc(spark)
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            if i > 1:
                times.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(times), 3)
    return out


def pipeline_rps(spark) -> dict[str, int | dict[str, int]]:
    """Throughput vs the reference's documented 1,000 rec/s stress rate
    (producer.py:242): the full clean->validate->score pass over a
    20x-replicated review corpus, steady state (best of 2).

    Three L1 (language detection) backends are reported — the cost knob
    the round-2 bench hid (functions/language.py:93):
      - trusted:  language comes from the source column (no detection,
                  the reference's consumer-side cost model);
      - marker:   native stopword/marker heuristic (pure codegen map);
      - trigram:  Cavnar-Trenkle trigram classifier as a broadcast-join
                  plan (the scale-correct default, ~2x the marker cost);
      - trigram_prefix: the trigram classifier capped at the first 256
                  chars (the opt-in production knob, lang_id_prefix) —
                  quantifies what the cap buys on long documents.
    """
    from pyspark.sql import functions as F

    from yelp_streaming_etl_pipeline_spark.functions.language import (
        with_lang_id,
    )
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
    bare = scaled.drop("language", "language_confidence")

    variants = {
        "trusted": scaled,
        "marker": with_lang_id(bare, "text", method="marker"),
        "trigram": with_lang_id(bare, "text", method="trigram",
                                id_col="review_id"),
        "trigram_prefix": with_lang_id(bare, "text", method="trigram",
                                       id_col="review_id",
                                       max_chars=256),
    }
    out: dict[str, int] = {}
    for name, src in variants.items():
        staged = G.score_reviews(G.validate_reviews(src, E._now()), E._now())
        best = float("inf")
        for _ in range(2):
            _jvm_gc(spark)
            t0 = time.perf_counter()
            staged.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(n_rows / best)
    return {"pipeline_rows": n_rows, "pipeline_rps_by_lang_backend": out}


def main() -> None:
    # progress bars share stdout with the JSON line; if the caller
    # retains only a stdout tail, bar spam can push per-query rows out
    # of the record (observed: BENCH_r03 lost 13 queries' timings)
    spark = get_spark(
        "bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    qs = E.queries()

    # warmup: JVM + codegen + parquet footer caches
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs["pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    covered = set(HEADLINE) | set(BENCH_EXCLUDED)
    allq = set(qs)
    assert covered == allq, (
        f"bench coverage drift: unbenched+unexcused={sorted(allq - covered)} "
        f"stale={sorted(covered - allq)}"
    )

    # isolated re-probe FIRST: these timings must see a session the
    # suite hasn't polluted yet (that's the point of the section)
    isolated = isolated_reprobe(spark, qs)

    med, passes, inline_probes, spark = run_suite(spark, qs)
    total = round(sum(med.values()), 3)

    # ... and AGAIN in the suite-polluted session (VERDICT r9 #1):
    # iso(after) - iso(before) IS the suite-context effect; the
    # interleaved probes carry the host effect; iso(before) vs last
    # round's iso(before) carries the code effect — all in one artifact
    isolated_after = isolated_reprobe(spark, qs)
    rps = pipeline_rps(spark)
    calib = calibration(spark)
    longdoc = longdoc_probe(spark)

    payload = {
        "metric": "headline_suite_steady_runtime",
        "value": total,
        "unit": "sec",
        "queries": med,
        "cold_total": round(sum(passes[0].values()), 3),
        "steady_pass_totals": [
            round(sum(p.values()), 3) for p in passes[1:]
        ],
        "pipeline_rows": rps["pipeline_rows"],
        # headline rps stays the trigram (production-default)
        # number so rounds compare like-for-like
        "pipeline_rps": rps["pipeline_rps_by_lang_backend"]["trigram"],
        "pipeline_rps_by_lang_backend": rps[
            "pipeline_rps_by_lang_backend"
        ],
        "sf": sf_from_dir(SF_DIR),
        "calibration": calib,
        # per-pass heavy-probe triplets (start/mid/end of every pass,
        # cold pass first): the within-run host-drift signal
        "inline_calibration": inline_probes,
        "longdoc": longdoc,
        "isolated_reprobe": isolated,
        # same entries re-timed AFTER the suite in the same session:
        # the suite-context signal (vs isolated_reprobe = fresh-session)
        "isolated_reprobe_after": isolated_after,
        "excluded": BENCH_EXCLUDED,
    }
    # durable copy: the full payload (per-query medians, exclusion
    # reasons, per-pass totals) is the authoritative artifact
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_out.json"
    )
    with open(out_path, "w") as fh:
        fh.write(json.dumps(payload) + "\n")

    # stdout gets a COMPACT line as the very last thing printed: the
    # driver records only a 2000-char stdout tail, and the full line
    # (~9 KB with 150+ queries) starts mid-line in that tail and can't
    # be parsed (BENCH_r04/r05 both recorded parsed=null). Keep the
    # headline numbers + the 20 slowest queries; cap hard at 1500 B.
    top = dict(
        sorted(med.items(), key=lambda kv: kv[1], reverse=True)[:20]
    )
    # carry over every query name the PREVIOUS round's compact line
    # reported: a query that got FASTER must not fall out of the map
    # (the round-over-round diff would read the absence as a drop —
    # exactly what happened to 4 sped-up entries in round 11).
    # Additions only; the slowest-20 selection above is unchanged.
    carry: set = set()
    try:
        import glob

        prev_arts = sorted(
            glob.glob(
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "BENCH_r*.json",
                )
            )
        )
        if prev_arts:
            with open(prev_arts[-1]) as fh:
                prev_parsed = json.load(fh).get("parsed") or {}
            carry = set((prev_parsed.get("queries") or {})) & set(med)
            for name in sorted(carry):
                top.setdefault(name, med[name])
    except Exception:
        pass  # a malformed artifact must never break the bench line
    # the three decisive within-one-artifact signals, compact enough
    # for the stdout tail: fresh-session vs post-suite iso totals
    # (suite-context), and the suite-spanning probe envelope (host)
    all_probe_cpu = [
        p[k]["cpu_heavy_sec"] for p in inline_probes for k in p
    ]
    all_probe_shuf = [
        p[k]["shuffle_heavy_sec"] for p in inline_probes for k in p
    ]
    compact = {
        "metric": payload["metric"],
        "value": total,
        "unit": "sec",
        "sf": payload["sf"],
        "queries": top,
        "n_queries": len(med),
        "pipeline_rps": payload["pipeline_rps"],
        "calibration": calib,
        "iso_before_total": round(sum(isolated.values()), 3),
        "iso_after_total": round(sum(isolated_after.values()), 3),
        "probe_envelope": {
            "cpu_heavy": [min(all_probe_cpu), max(all_probe_cpu)],
            "shuffle_heavy": [
                min(all_probe_shuf), max(all_probe_shuf),
            ],
        },
        "full_record": "bench_out.json",
    }
    line = json.dumps(compact)
    while len(line) > 1500 and compact["queries"]:
        # shed the FASTEST non-carryover entry first: carried-over
        # names exist precisely so the round-over-round diff never
        # sees a disappearance; drop them only as a last resort
        shed_pool = [
            n for n in compact["queries"] if n not in carry
        ] or list(compact["queries"])
        shed = min(shed_pool, key=lambda n: compact["queries"][n])
        del compact["queries"][shed]
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()
