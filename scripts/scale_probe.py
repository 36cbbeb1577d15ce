"""Scaling probe: do the operators behave linearly when the data
grows 10x?

Replicates the sf0.1 events/documents/embeddings fixtures 10x (4x
for embeddings) into a temp dir with shifted ids, then times a
representative operator per family at 1x and at the blown-up scale
on the same session. A linear operator should show time ratio <=
replication factor (usually well under — fixed overhead amortizes);
a superlinear ratio flags an accidental quadratic (all-pairs,
unpartitioned window, lineage blowup).

Usage: python scripts/scale_probe.py   (prints one JSON line)
Writes only under /tmp; read-only on /root/testdata.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from yelp_streaming_etl_pipeline_spark.session import get_spark

SF = "/root/testdata/sf0.1"
REP_EVENTS = 10
REP_DOCS = 10
REP_EMB = 4
REP_FACT = 10  # customer/orders consistent-key replication


def replicate(spark, out: str) -> None:
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_ev = ev.agg(F.max("event_id")).collect()[0][0] + 1
    reps = spark.range(REP_EVENTS).select(F.col("id").alias("_r"))
    (
        ev.crossJoin(reps)
        .withColumn("event_id", F.col("event_id") + F.col("_r") * n_ev)
        .drop("_r")
        .write.mode("overwrite")
        .parquet(f"{out}/events.parquet")
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_d = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    dreps = spark.range(REP_DOCS).select(F.col("id").alias("_r"))
    (
        docs.crossJoin(dreps)
        .withColumn("doc_id", F.col("doc_id") + F.col("_r") * n_d)
        .drop("_r")
        .write.mode("overwrite")
        .parquet(f"{out}/documents.parquet")
    )
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n_e = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    ereps = spark.range(REP_EMB).select(F.col("id").alias("_r"))
    (
        emb.crossJoin(ereps)
        .withColumn("vec_id", F.col("vec_id") + F.col("_r") * n_e)
        .drop("_r")
        .write.mode("overwrite")
        .parquet(f"{out}/embeddings.parquet")
    )
    # customer + orders replicated with CONSISTENTLY shifted keys so
    # the per-customer aggregate (and the quartile rank input) truly
    # grows 10x — custkey shift is mirrored on both sides of the join
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    n_c = cust.agg(F.max("c_custkey")).collect()[0][0] + 1
    creps = spark.range(REP_FACT).select(F.col("id").alias("_r"))
    (
        cust.crossJoin(creps)
        .withColumn("c_custkey", F.col("c_custkey") + F.col("_r") * n_c)
        .drop("_r")
        .write.mode("overwrite")
        .parquet(f"{out}/customer.parquet")
    )
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    n_o = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    (
        orders.crossJoin(creps)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("_r") * n_o)
        .withColumn("o_custkey", F.col("o_custkey") + F.col("_r") * n_c)
        .drop("_r")
        .write.mode("overwrite")
        .parquet(f"{out}/orders.parquet")
    )
    # lineitem replicated with the SAME l_orderkey shift as orders, so
    # orderkey referential integrity holds in the scaled dir and
    # orders x lineitem join probes grow BOTH sides consistently
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    (
        li.crossJoin(creps)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("_r") * n_o)
        .drop("_r")
        .write.mode("overwrite")
        .parquet(f"{out}/lineitem.parquet")
    )
    for t in ("region", "nation", "supplier", "part"):
        shutil.copy(f"{SF}/{t}.parquet", f"{out}/{t}.parquet")


# (name, query key, replication factor its input grew by)
PROBES = [
    ("hll_registers", "hll_registers", REP_EVENTS),
    ("cms_counters", "cms_counters", REP_DOCS),
    ("event_zscores", "event_zscores", REP_EVENTS),
    ("user_value_ewma", "user_value_ewma", REP_EVENTS),
    ("sessionize_events", "sessionize_events", REP_EVENTS),
    ("dedup_exact", "dedup_exact", REP_DOCS),
    ("simhash_signatures", "simhash_signatures", REP_DOCS),
    ("gopher_quality", "gopher_quality", REP_DOCS),
    ("lang_id", "lang_id", REP_DOCS),
    ("bpe_merges", "bpe_merges", REP_DOCS),
    ("ann_lsh_topk", "ann_lsh_topk", REP_EMB),
    ("embedding_project", "embedding_project", REP_EMB),
    ("kmeans_clusters", "kmeans_clusters", REP_EMB),
    # round-6 additions: the quartile rewrite's whole point is
    # surviving a rank-input blow-up without a single-partition sort;
    # resample's grid/fill must track events linearly. cdc_chunk_pairs
    # is deliberately NOT probed: exact-copy replication makes every
    # replica a true duplicate of its original, so the PAIR COUNT is
    # quadratic in the replication factor by SEMANTICS, not by plan.
    ("customer_quartiles", "customer_quartiles", REP_FACT),
    ("events_resample_ffill", "events_resample_ffill", REP_EVENTS),
    # round-7: lineitem now replicates with matching l_orderkey
    # shifts, so the orders x lineitem shuffle join (TPC-H Q12 shape)
    # grows both sides 10x consistently; the deep profiler's
    # two-pass + ndv-sized-intermediate claim gets checked at 10x too
    ("orders_lineitem_q12", "sql_surface_q12", REP_FACT),
    ("table_stats_deep", "table_stats_deep", REP_FACT),
    # round-8: the new families. exact_substring_removal is probe-safe
    # under exact-copy replication (unlike cdc_chunk_pairs) because
    # duplication is a per-window COUNT predicate, not a pair join —
    # replicas make more windows duplicated but the row volume stays
    # linear through cov/anti-join/reassembly. dsir's bucket tables
    # are fixed at 1024 regardless of corpus size.
    ("exact_substring_removal", "exact_substring_removal", REP_DOCS),
    ("dsir_importance", "dsir_importance", REP_DOCS),
    ("stratified_budget_sample", "stratified_budget_sample", REP_EVENTS),
    # round-8 late additions: byte windows share removal's probe
    # safety (per-window COUNT, no pair join); the EM refinement's DP
    # runs over DISTINCT words (constant under exact-copy replication)
    # — only the word-frequency aggregate and doc-word join grow 10x,
    # so a strongly sub-linear ratio is the EXPECTED signature
    ("exact_substring_spans_bytes", "exact_substring_spans_bytes", REP_DOCS),
    ("unigram_em_refine", "unigram_em_refine", REP_DOCS),
    # bigram-LM model tables are distinct-bigram-sized (constant under
    # exact-copy replication); only the count aggregates and the
    # scored-stream join grow 10x
    ("bigram_lm_scores", "bigram_lm_scores", REP_DOCS),
    # replication multiplies pages AND makes every paragraph a hot
    # duplicate — the keep-first rank must stay linear because each
    # hash partition grows by the replication factor only
    ("paragraph_dedup", "paragraph_dedup", REP_DOCS),
    ("exact_substring_removal_bytes", "exact_substring_removal_bytes",
     REP_DOCS),
    # round-9: the EM loop's DP runs over DISTINCT words (constant
    # under exact-copy replication — strongly sub-linear expected,
    # like em_refine); BPE-space spans share removal's probe safety
    # (per-window COUNT, vocab table constant); the quota sampler's
    # bin/alloc tables are constant-bounded, only the score join and
    # the group-limited rank grow 10x
    ("unigram_em_loop", "unigram_em_loop", REP_DOCS),
    ("exact_substring_spans_bpe", "exact_substring_spans_bpe", REP_DOCS),
    ("quality_quota_sample", "quality_quota_sample", REP_DOCS),
    # round-10: removal in BPE space shares the spans entry's probe
    # safety (per-window COUNT + gap slicing — no covered-position
    # explode); the schedule's DP is distinct-word-sized like the
    # loop (strongly sub-linear expected); BPE-piece BM25's postings
    # grow 10x but the vocab/query-term/idf tables are constant;
    # dsir_quota_sample adds only bounded bin/alloc tables over the
    # 10x-growing score join
    ("exact_substring_removal_bpe", "exact_substring_removal_bpe",
     REP_DOCS),
    ("unigram_em_schedule", "unigram_em_schedule", REP_DOCS),
    ("bm25_topk_bpe", "bm25_topk_bpe", REP_DOCS),
    ("dsir_quota_sample", "dsir_quota_sample", REP_DOCS),
    # round-10 late extensions (first baselines land in round 11):
    # cross BM25's target side reduces to 5 broadcast rows; the
    # scheduled scorer is distinct-word-DP-bound (sub-linear
    # expected); budget packing adds per-bin windows + a bounded
    # bin-offset cumsum over the 10x-growing score join
    ("bm25_cross_topk", "bm25_cross_topk", REP_DOCS),
    ("unigram_em_schedule_scores", "unigram_em_schedule_scores",
     REP_DOCS),
    ("dsir_budget_pack", "dsir_budget_pack", REP_DOCS),
    # round-11: the mixture pack adds one strata table + per-source
    # partitioned windows over budget_pack's shape (linear expected);
    # the export scorer is the schedule scorer plus an
    # inventory-sized parquet round trip (distinct-word-DP-bound,
    # sub-linear expected). cdc_chunk_pairs_bpe is deliberately NOT
    # probed for the same reason as cdc_chunk_pairs: exact-copy
    # replication makes every replica a true duplicate, so the PAIR
    # COUNT is quadratic in the replication factor by SEMANTICS —
    # its chunk-SET stage is covered by the spans_bpe probe (same
    # tokenize + per-position hashing shape).
    ("dsir_mixture_pack", "dsir_mixture_pack", REP_DOCS),
    ("unigram_schedule_export_scores", "unigram_schedule_export_scores",
     REP_DOCS),
    # KN model tables are distinct-bigram-sized (constant under
    # exact-copy replication) like the MLE model; only the count
    # aggregates and the scored-stream joins grow 10x
    ("kn_bigram_scores", "kn_bigram_scores", REP_DOCS),
]


def main() -> None:
    import __spark_entry__ as E

    spark = get_spark("scale_probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out = tempfile.mkdtemp(prefix="scale10_")
    replicate(spark, out)
    qs = E.queries()
    results = {}
    for name, key, factor in PROBES:
        print(f"probe: {name}", flush=True)
        fn = qs[key]
        times = {}
        for label, d in (("base", SF), ("big", out)):
            best = float("inf")
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            times[label] = best
        ratio = times["big"] / times["base"]
        results[name] = {
            "base_s": round(times["base"], 3),
            "big_s": round(times["big"], 3),
            "factor": factor,
            "ratio": round(ratio, 2),
            "linear_ok": ratio <= factor * 1.5,
        }
    shutil.rmtree(out, ignore_errors=True)
    print(json.dumps({"metric": "scale_probe", "probes": results}))


if __name__ == "__main__":
    main()
