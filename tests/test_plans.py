"""Physical-plan audits over the headline queries — the local proxy
for 100 TB readiness (pushdown, pruning, broadcast, codegen, no
Python UDFs in the hot path)."""

from __future__ import annotations

import __spark_entry__ as E
from yelp_streaming_etl_pipeline_spark.plans import audit as A

SF = "/root/testdata/sf0.001"


def test_pricing_summary_pushdown_and_pruning(spark):
    df = E.q_pricing_summary(spark, SF)
    assert A.has_pushed_filters(df), "shipdate filter must reach the scan"
    cols = set(A.read_schema_columns(df))
    assert "l_comment" not in cols  # (not in fixture anyway)
    # only the needed columns are read
    assert cols <= {
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_shipdate",
    }
    assert not A.has_python_udf(df)
    # codegen ids are only assigned to non-AQE plans before execution
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df2 = E.q_pricing_summary(spark, SF)
        assert A.whole_stage_codegen_stages(df2) >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_revenue_by_nation_join_strategies(spark):
    df = E.q_revenue_by_nation(spark, SF)
    assert A.has_broadcast_join(df), "dim chain must broadcast"
    assert not A.has_python_udf(df)


def test_top_customers_broadcast(spark):
    df = E.q_top_customers(spark, SF)
    assert A.has_broadcast_join(df)


def test_gauntlet_is_pure_map(spark):
    # the full clean pipeline must be a scan -> project/filter chain:
    # no data-dependent (hash/range) shuffles, no Python UDFs. The
    # round-robin small-input spread (sources/tables.py) is permitted —
    # it is a no-op at scale by construction.
    df = E.q_clean_reviews(spark, SF)
    assert A.key_shuffle_exchanges(df) == 0, "gauntlet must not key-shuffle"
    assert not A.has_python_udf(df)


def test_text_features_column_pruning(spark):
    df = E.q_text_features(spark, SF)
    cols = set(A.read_schema_columns(df))
    assert cols == {"doc_id", "text"}, cols


def test_review_stats_single_shuffle(spark):
    df = E.q_review_stats(spark, SF)
    # one hash-partitioning exchange for the (hour, business) groupBy
    assert A.key_shuffle_exchanges(df) == 1, A.physical_plan(df)[:2000]


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """The 100 TB co-location story: both fact tables written bucketed
    by the join key join with ZERO exchanges — the shuffle is paid once
    at write time, then every downstream join is local. (Broadcast is
    disabled to prove the bucketing, not dim size, removes the shuffle.)
    """
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        (
            orders.write.mode("overwrite")
            .option("path", str(tmp_path / "orders_b"))
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable("orders_bucketed")
        )
        (
            lineitem.write.mode("overwrite")
            .option("path", str(tmp_path / "lineitem_b"))
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable("lineitem_bucketed")
        )
        joined = (
            spark.table("lineitem_bucketed")
            .join(
                spark.table("orders_bucketed"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        plan = A.physical_plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # the only key exchange allowed is the final groupBy agg — the
        # JOIN itself must be exchange-free (bucket co-location)
        assert A.key_shuffle_exchanges(joined) <= 1, plan[:3000]
        # sanity: it actually computes
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")


def test_sessionize_single_key_shuffle(spark):
    # window by user_id + groupBy(user_id, session_seq): the groupBy
    # reuses the window's hash partitioning (subset-key satisfaction),
    # and there is no cosmetic final sort — exactly ONE key exchange.
    df = E.q_sessionize_events(spark, SF)
    assert A.key_shuffle_exchanges(df) == 1, A.physical_plan(df)[:2000]


def test_anti_semi_join_no_final_sort(spark):
    # outputs scale with the dimension tables: no range exchange allowed
    for q in (E.q_customers_without_orders, E.q_parts_with_shipments):
        plan = A.physical_plan(q(spark, SF))
        assert "rangepartitioning" not in plan, plan[:2000]


def test_ivf_assignment_is_aggregate_not_window(spark):
    # the n x n_centroids cross product must collapse via a partial
    # aggregate (map-side combine) before any exchange; only the small
    # query-side window and final top-k may add key shuffles
    df = E.q_ann_ivf_topk(spark, SF)
    plan = A.physical_plan(df)
    assert "max_by" in plan or "HashAggregate" in plan
    assert A.key_shuffle_exchanges(df) <= 3, plan[:3000]


def test_top_bigrams_take_ordered(spark):
    # global top-k must compile to TakeOrderedAndProject, never a full
    # range-shuffle sort
    df = E.q_top_bigrams(spark, SF)
    plan = A.physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "rangepartitioning" not in plan, plan[:2000]


def test_pivot_two_phase_shape(spark):
    # Spark's pivot is two aggregations: partial-combined (day, type)
    # counts, then the pivot agg keyed by day. Both exchanges carry
    # already-reduced rows (one per group), never raw events.
    df = E.q_event_type_pivot(spark, SF)
    assert A.key_shuffle_exchanges(df) == 2, A.physical_plan(df)[:2000]
    plan = A.physical_plan(df)
    assert "partial_count" in plan, plan[:2000]


def test_partitioned_write_prunes_scan(spark, tmp_path):
    """The 100 TB scan lever: data written partitioned by a date key is
    read with partition pruning — the filtered scan lists only matching
    directories (PartitionFilters), never touching other partitions'
    files."""
    from pyspark.sql import functions as F

    from yelp_streaming_etl_pipeline_spark.sources.events import read_events

    ev = read_events(spark, SF).withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    out = str(tmp_path / "events_by_day")
    ev.write.partitionBy("day").mode("overwrite").parquet(out)

    one_day = ev.select("day").first()["day"]
    df = spark.read.parquet(out).filter(F.col("day") == one_day)
    plan = A.physical_plan(df)
    assert "PartitionFilters" in plan
    # the partition predicate must appear as a partition filter, not a
    # post-scan data filter
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "day" in m.group(1), plan[:2000]
    assert df.count() == ev.filter(F.col("day") == one_day).count()


def test_approx_sketches_track_exact(spark):
    """The sketch scale path (HLL distinct, approx quantiles) tracks
    the exact operators within documented error bounds — exact versions
    are the oracle-checked queries; these are their 100 TB stand-ins."""
    from pyspark.sql import functions as F

    from yelp_streaming_etl_pipeline_spark.sources.events import read_events

    ev = read_events(spark, "/root/testdata/sf0.01")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        F.expr("percentile(value, 0.5)").alias("p50_exact"),
        F.expr("approx_percentile(value, 0.5, 10000)").alias("p50_approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05
    assert abs(row["p50_approx"] - row["p50_exact"]) < 1.0


def test_asof_join_is_single_window_pass(spark):
    # union + one window over user_id: exactly ONE key shuffle, no
    # join operator at all (the naive theta-join would BNL-explode)
    df = E.q_purchase_prior_click(spark, SF)
    plan = A.physical_plan(df)
    assert A.key_shuffle_exchanges(df) == 1, plan[:3000]
    assert "NestedLoop" not in plan, plan[:3000]
    assert not A.has_python_udf(df)


def test_interval_pairs_is_equi_join(spark):
    # binned range join must plan as a hash/sort-merge EQUI join on
    # (user, bucket), never a broadcast nested loop on the inequality
    df = E.q_click_purchase_5min(spark, SF)
    plan = A.physical_plan(df)
    assert "NestedLoop" not in plan, plan[:3000]
    assert not A.has_python_udf(df)


def test_sampling_is_pure_map(spark):
    # hash-bucket sampling and split assignment are per-row decisions:
    # zero shuffles at any scale, no Python in the row path
    for q in (E.q_stratified_sample, E.q_train_test_split):
        df = q(spark, SF)
        assert A.key_shuffle_exchanges(df) == 0, A.physical_plan(df)[:2000]
        assert not A.has_python_udf(df)


def test_compact_latest_is_aggregate_not_window(spark):
    # log compaction must plan as hash aggregate with map-side partial
    # (shuffle carries <= one row per key per partition), never as a
    # row_number window that sorts every version of every key
    df = E.q_latest_event_per_user(spark, SF)
    plan = A.physical_plan(df)
    assert "Window" not in plan, plan[:3000]
    assert A.key_shuffle_exchanges(df) == 1, plan[:3000]


def test_aqe_splits_skewed_join(spark):
    """Runtime skew handling, executed: a join where one key holds ~90%
    of the rows must come out of AQE with the skewed partition SPLIT
    (the 'skew=true' marker on the final sort-merge join) instead of a
    single straggler task. This is the safety net behind every equi-join
    in the library whose key distribution is data-dependent — the
    hand-built mitigations (salted aggregation, sub-banded LSH) cover
    the cases AQE cannot see."""
    from pyspark.sql import functions as F

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in [
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        ]
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        # shrink the thresholds so the ~MB-scale fixture counts as skewed
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "65536",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")

        # incompressible payload (skew detection reads COMPRESSED map
        # sizes) that the aggregate below keeps alive through pruning
        pad = F.concat(
            *[F.md5((F.col("id") + F.lit(i)).cast("string")) for i in range(4)]
        )
        big = spark.range(100_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            pad.alias("payload"),
        )
        small = spark.range(2_000).select(
            (F.col("id") % 1000).alias("k"), F.col("id").alias("v")
        )
        # aggregate on top so the driver collects one row, not the join
        # output; the SMJ beneath it is what AQE re-plans
        joined = big.join(small, "k").agg(
            F.count("*"), F.sum("v"), F.sum(F.length("payload"))
        )
        joined.collect()  # executes THIS plan -> AQE finalizes it
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_decontaminate_broadcasts_benchmark_grams(spark):
    """The corpus side must meet the benchmark grams through a
    broadcast join — no shuffle of the exploded corpus by gram."""
    from pyspark.sql import functions as F

    from yelp_streaming_etl_pipeline_spark.operators import corpus as C

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 101 == 0)
    df = C.decontaminate(docs, bench)
    plan = A.physical_plan(df)
    assert "BroadcastHashJoin" in plan
    # the only hash-partitioned exchanges are doc-keyed (hit count +
    # join-back), never gram-keyed
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "gram" not in line, line


def test_token_budget_pack_single_partition_is_offsets_only(spark):
    """The distributed prefix sum may serialize ONLY the bucket-offsets
    table (bounded at PACK_BUCKETS rows); the corpus-side window must
    run under a hash partitioning on the bucket column."""
    from yelp_streaming_etl_pipeline_spark.operators import corpus as C

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = A.physical_plan(C.token_budget_pack(docs))
    assert "hashpartitioning(_bucket" in plan, plan[:2000]
    single = [
        ln
        for ln in plan.splitlines()
        if "Arguments: SinglePartition" in ln
    ]
    assert len(single) == 1, plan[:3000]  # offsets table only
    assert "BroadcastHashJoin" in plan  # offsets re-enter via broadcast


def test_pii_operators_are_pure_maps(spark):
    for q in (E.q_pii_profile, E.q_pii_redact):
        df = q(spark, SF)
        assert A.key_shuffle_exchanges(df) == 0
        assert not A.has_python_udf(df)


def test_zorder_layout_is_pure_map(spark):
    df = E.q_zorder_layout(spark, SF)
    assert A.key_shuffle_exchanges(df) == 0
    assert not A.has_python_udf(df)


def test_embedding_project_is_pure_map(spark):
    df = E.q_embedding_project(spark, SF)
    assert A.key_shuffle_exchanges(df) == 0
    assert not A.has_python_udf(df)


def test_quality_classifier_single_doc_shuffle(spark):
    # explode + one hash aggregate keyed by doc_id; the weight lookup
    # is arithmetic, so there must be no join and exactly one key
    # shuffle (partial agg upstream of it)
    df = E.q_quality_classifier(spark, SF)
    assert A.key_shuffle_exchanges(df) == 1
    assert not A.has_python_udf(df)


def test_semantic_ops_broadcast_the_small_side(spark):
    for q in (E.q_semantic_dedup, E.q_semantic_decontaminate,
              E.q_hard_negatives):
        df = q(spark, SF)
        assert A.has_broadcast_side(df), q.__name__
        assert not A.has_python_udf(df)


def test_pagerank_no_udf_and_joins_by_key(spark):
    # iterations are equi-joins + hash aggregates; nothing Python,
    # no cartesian product anywhere in the chained plan
    df = E.q_pagerank_nodes(spark, SF)
    assert not A.has_python_udf(df)
    plan = A.physical_plan(df)
    assert "CartesianProduct" not in plan


def test_sketch_compositions_stay_register_sized(spark):
    # hll_set_ops: every post-sketch stage operates on <= 256-row
    # register tables; the estimate combination must not re-shuffle
    # the raw events beyond the two sketch aggregates
    df = E.q_hll_set_ops(spark, SF)
    assert not A.has_python_udf(df)
    df2 = E.q_cms_join_size(spark, SF)
    assert not A.has_python_udf(df2)


def test_zscore_broadcasts_group_stats(spark):
    # the per-group moment table is tiny -> must broadcast back onto
    # the events scan, never sort-merge
    df = E.q_event_zscores(spark, SF)
    assert A.has_broadcast_join(df)
    assert not A.has_python_udf(df)


def test_ewma_single_key_shuffle(spark):
    # one hash aggregate keyed by user_id (collect + fold inside the
    # aggregate); no window, no join
    df = E.q_user_value_ewma(spark, SF)
    assert A.key_shuffle_exchanges(df) == 1
    assert not A.has_python_udf(df)


def test_sql_surface_exists_decorrelates_to_semi_join(spark):
    # the identical ANSI text runs on both engines; Catalyst must
    # rewrite the correlated EXISTS into a (left) semi join — never
    # a per-row subquery or cartesian product
    df = E.q_sql_surface_q4(spark, SF)
    plan = A.physical_plan(df)
    assert "LeftSemi" in plan or "Semi" in plan, plan
    assert "CartesianProduct" not in plan
    assert not A.has_python_udf(df)


def test_salted_skew_join_partitions_on_composite_key(spark):
    # the whole point of the salt: the join's exchange must hash on
    # (user_id, _salt) so a hot user spreads over n_salts reducers,
    # and the plan must stay free of Python UDFs and cartesians
    df = E.q_salted_skew_join(spark, SF)
    plan = A.physical_plan(df)
    import re

    assert re.search(r"hashpartitioning\(user_id[^)]*_salt", plan), plan[:3000]
    assert "CartesianProduct" not in plan
    assert not A.has_python_udf(df)


def test_sql_surface_q2_decorrelates_scalar_subquery(spark):
    # the correlated scalar min() must become an aggregate + join —
    # no per-row subquery execution node in the physical plan
    df = E.q_sql_surface_q2(spark, SF)
    plan = A.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "Subquery" not in plan or "SubqueryBroadcast" in plan, plan[:3000]
    assert not A.has_python_udf(df)


def test_sql_surface_q21_decorrelates_both_exists(spark):
    # EXISTS -> semi join, NOT EXISTS -> anti join, in one query
    df = E.q_sql_surface_q21(spark, SF)
    plan = A.physical_plan(df)
    assert "Semi" in plan, plan[:3000]
    assert "Anti" in plan, plan[:3000]
    assert "CartesianProduct" not in plan
    assert not A.has_python_udf(df)


def test_triangle_counts_no_cartesian(spark):
    # wedge build + closing-edge probe must both be equi-joins
    df = E.q_cosupply_triangles(spark, SF)
    plan = A.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert not A.has_python_udf(df)


def test_winnowing_single_doc_shuffle(spark):
    # one per-doc window (hash exchange on doc_id) + the final
    # per-doc aggregate reusing that partitioning; distinct adds one
    df = E.q_winnowing_fingerprints(spark, SF)
    assert A.key_shuffle_exchanges(df) <= 2, A.physical_plan(df)[:2000]
    assert not A.has_python_udf(df)


def test_sql_surface_q16_null_aware_anti_join(spark):
    # NOT IN must become a null-aware anti join, not a per-row subquery
    df = E.q_sql_surface_q16(spark, SF)
    plan = A.physical_plan(df)
    assert "Anti" in plan, plan[:3000]
    assert "CartesianProduct" not in plan
    assert not A.has_python_udf(df)


def test_sql_surface_q18_semi_join_over_aggregate(spark):
    # IN over a grouped HAVING subquery -> semi join against the agg
    df = E.q_sql_surface_q18(spark, SF)
    plan = A.physical_plan(df)
    assert "Semi" in plan, plan[:3000]
    assert "CartesianProduct" not in plan
    assert not A.has_python_udf(df)


def test_sql_surface_q1_pushes_date_filter(spark):
    # the scan-heavy aggregate: the shipdate bound must reach the
    # parquet scan as a pushed filter, and the whole plan is
    # scan -> partial agg -> exchange -> final agg, no join
    df = E.q_sql_surface_q1(spark, SF)
    plan = A.physical_plan(df)
    assert "PushedFilters" in plan and "l_shipdate" in plan, plan[:3000]
    assert "Join" not in plan
    assert not A.has_python_udf(df)


def test_sql_surface_q6_all_predicates_pushed(spark):
    # all four conjuncts are pushable (date range, discount band,
    # quantity cap); the aggregate is a scalar - no join, no window
    df = E.q_sql_surface_q6(spark, SF)
    plan = A.physical_plan(df)
    assert "PushedFilters" in plan
    for c in ("l_shipdate", "l_discount", "l_quantity"):
        assert c in plan, (c, plan[:3000])
    assert "Join" not in plan
    assert not A.has_python_udf(df)


def test_sql_surface_q11_scalar_subquery_not_cartesian(spark):
    # the uncorrelated global-total subquery must evaluate once as a
    # scalar (Subquery node), never as a join multiplying the fact
    df = E.q_sql_surface_q11(spark, SF)
    plan = A.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert not A.has_python_udf(df)


def test_sql_surface_q15_no_full_sort(spark):
    # the argmax-by-scalar-subquery form must not globally sort the
    # revenue table (that's the point vs ORDER BY ... LIMIT 1 with
    # ties broken wrong); max() is an aggregate, not a sort
    df = E.q_sql_surface_q15(spark, SF)
    plan = A.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert not A.has_python_udf(df)


def test_sql_surface_q20_nested_semi_joins(spark):
    # both INs -> semi joins; the correlated scalar in HAVING ->
    # decorrelated aggregate join; nothing cartesian, nothing per-row
    df = E.q_sql_surface_q20(spark, SF)
    plan = A.physical_plan(df)
    assert "Semi" in plan, plan[:3000]
    assert "CartesianProduct" not in plan
    assert not A.has_python_udf(df)


def test_sql_surface_lateral_decorrelates(spark):
    # the correlated LATERAL top-k must plan as a join (window or
    # aggregated), never a per-outer-row subquery or cartesian
    df = E.q_sql_surface_lateral(spark, SF)
    plan = A.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert not A.has_python_udf(df)


def test_sql_surface_groupingsets_single_expand(spark):
    # grouping sets compile to one Expand + aggregate, not a union of
    # three scans
    import re

    df = E.q_sql_surface_groupingsets(spark, SF)
    plan = A.physical_plan(df)
    assert "Expand" in plan, plan[:2000]
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.MULTILINE)
    assert len(scans) == 1, plan[:2000]
    assert not A.has_python_udf(df)


def test_bucketed_join_entry_no_shuffle(spark):
    # the oracle-checked entry variant of the bucketing story: with
    # broadcast disabled (so bucketing, not dim size, removes the
    # shuffle), the join adds zero exchanges — only the final groupBy
    # aggregate shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = E.q_bucketed_join(spark, SF)
        plan = A.physical_plan(df)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, (
            plan[:2000]
        )
        assert A.key_shuffle_exchanges(df) <= 1, plan[:3000]
        assert "Bucketed: true" in plan, plan[:3000]
        assert not A.has_python_udf(df)
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", "10485760"
        )


def test_partition_overwrite_touches_one_partition(spark, tmp_path):
    """Dynamic partition overwrite must leave other partitions' files
    untouched on disk (same file set before and after the backfill),
    replacing only the target day's directory."""
    import os

    from pyspark.sql import functions as F

    from yelp_streaming_etl_pipeline_spark.sources.events import read_events

    ev = read_events(spark, SF).withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    out = str(tmp_path / "by_day")
    ev.write.partitionBy("day").mode("overwrite").parquet(out)

    def files_by_day():
        m = {}
        for d in os.listdir(out):
            if d.startswith("day="):
                m[d] = sorted(os.listdir(os.path.join(out, d)))
        return m

    before = files_by_day()
    target = sorted(before)[1]
    day_val = target.split("=", 1)[1]
    (
        ev.filter(F.col("day") == day_val)
        .withColumn("value", F.col("value") * 2)
        .write.partitionBy("day")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(out)
    )
    after = files_by_day()
    assert set(before) == set(after)  # no partition added/removed
    unchanged = [d for d in before if d != target]
    for d in unchanged:
        assert before[d] == after[d], d  # untouched files
    assert before[target] != after[target]  # target rewritten


def test_bloom_pruned_join_is_map_side(spark):
    # the bloom probe must not add any exchange: register table
    # broadcasts, probe is a pure map before the join's own shuffle
    df = E.q_bloom_pruned_join(spark, SF)
    plan = A.physical_plan(df)
    assert "BroadcastExchange" in plan, plan[:2000]
    # allowed keyed exchanges: the join (<=2 sides) + final agg
    assert A.key_shuffle_exchanges(df) <= 3, plan[:3000]
    assert not A.has_python_udf(df)


def test_ivfpq_no_python_udf_no_cartesian_on_data(spark):
    # the whole IVF-PQ pipeline (assign, encode, ADC, rerank) must
    # stay JVM-side; the only nested-loop joins are broadcast-small
    # (centroids / codebooks / probe tables), never data x data
    df = E.q_ann_ivfpq_topk(spark, SF)
    plan = A.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert not A.has_python_udf(df)


def test_customer_quartiles_no_single_partition_exchange(spark):
    # exact ntile(4) must NOT plan the textbook Exchange
    # SinglePartition global-window sort; the two-pass range-partition
    # rank keeps every exchange keyed/ranged (VERDICT r5 item #3)
    df = E.q_customer_quartiles(spark, SF)
    plan = A.physical_plan(df)
    assert "SinglePartition" not in plan, plan[:2000]
    assert "ntile" not in plan.lower(), plan[:2000]


def test_resample_ffill_two_key_shuffles(spark):
    # slot aggregate + span aggregate; the grid join and the forward-
    # fill window must REUSE the key partitioning, not add exchanges
    df = E.q_events_resample_ffill(spark, SF)
    assert A.key_shuffle_exchanges(df) <= 2, A.physical_plan(df)[:2000]
    assert "SinglePartition" not in A.physical_plan(df)


def test_cusum_single_key_shuffle_no_udf(spark):
    # one grouped collect per key; the integer fold is all Column
    # algebra inside whole-stage codegen
    df = E.q_cusum_changepoints(spark, SF)
    assert A.key_shuffle_exchanges(df) == 1, A.physical_plan(df)[:2000]
    assert not A.has_python_udf(df)


def test_payload_chunk_manifest_pure_map(spark):
    # chunking + hashing is a map + posexplode: ZERO exchanges — the
    # payload bytes never shuffle
    df = E.q_payload_chunk_manifest(spark, SF)
    plan = A.physical_plan(df)
    assert "Exchange" not in plan, plan[:2000]
    assert not A.has_python_udf(df)


def test_cdc_chunk_pairs_keyed_joins_only(spark):
    # chunk sets materialized once; tail is keyed equi-joins — no
    # cartesian, no python, and the shuffle count stays small (cap
    # join + pair join + sizes), not one per consumer of the scan
    df = E.q_cdc_chunk_pairs(spark, SF)
    plan = A.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert not A.has_python_udf(df)
    assert A.key_shuffle_exchanges(df) <= 5, plan[:3000]


def test_cdc_chunk_pairs_bpe_broadcast_vocab_keyed_joins(spark):
    # piece-space CDC: the entry's tail (over the eagerly
    # checkpointed chunk sets) is keyed equi-joins only — no
    # cartesian, no python UDF; the vocab-broadcast property lives
    # UPSTREAM of the checkpoint, so it is audited on the lazy
    # tokenize->chunk pipeline directly
    from yelp_streaming_etl_pipeline_spark.operators.dedup import (
        _bpe_piece_chunk_sets,
        bpe_token_stream,
    )
    from yelp_streaming_etl_pipeline_spark.operators.tokenizer import (
        bpe_learn,
    )

    df = E.q_cdc_chunk_pairs_bpe(spark, SF)
    plan = A.physical_plan(df)
    assert "CartesianProduct" not in plan
    assert not A.has_python_udf(df)

    docs = E._doc_corpus_cpu(spark, SF)
    _, vocab = bpe_learn(docs, "text", 4, "char")
    sets = _bpe_piece_chunk_sets(
        bpe_token_stream(docs, vocab, "text", "doc_id")
    )
    sets_plan = A.physical_plan(sets)
    assert A.has_broadcast_join(sets), "vocab join must broadcast"
    assert "CartesianProduct" not in sets_plan


def test_dsir_mixture_pack_partitioned_windows_only(spark):
    # the mixture pack's token prefix sums must all be PARTITIONED
    # windows (per (source, bin) locals + the per-source bin-offset
    # cumsum) — an unpartitioned TOKEN window would mean the
    # decomposition regressed to a global single-partition sort. The
    # ONLY allowed unpartitioned spec is the allocation's
    # largest-remainder rank (orders by `rem` over the strata table —
    # bounded by the number of sources, the adjudicated class).
    # Allocation/offset tables join back as broadcasts; no python,
    # no cartesian.
    df = E.q_dsir_mixture_pack(spark, SF)
    plan = A.physical_plan(df)
    assert not A.has_python_udf(df)
    assert "CartesianProduct" not in plan
    assert A.has_broadcast_side(df)
    import re

    specs = re.findall(r"windowspecdefinition\(([^,]*),", plan)
    assert specs, plan[:3000]
    for first_arg in specs:
        # first arg an ORDER column (ASC/DESC) == no partition clause
        if " ASC" in first_arg or " DESC" in first_arg:
            assert "rem" in first_arg, (first_arg, plan[:3000])


def test_bm25_topk_take_ordered_no_udf(spark):
    # the retrieval top-k must compile to TakeOrderedAndProject (never
    # a full range-shuffle sort), stay UDF-free, and broadcast the
    # tiny query-term / idf tables into the postings join
    df = E.q_bm25_topk(spark, SF)
    plan = A.physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "rangepartitioning" not in plan, plan[:2000]
    assert not A.has_python_udf(df)
    assert A.has_broadcast_join(df), "query terms / idf must broadcast"


def test_bm25_topk_bpe_broadcast_vocab_take_ordered(spark):
    # BPE-piece retrieval: the segmented-word vocab join must
    # broadcast (vocabulary-sized), the top-k must compile to
    # TakeOrderedAndProject, no UDF and no pair join anywhere
    df = E.q_bm25_topk_bpe(spark, SF)
    plan = A.physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert "rangepartitioning" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan
    assert not A.has_python_udf(df)
    assert A.has_broadcast_join(df), "vocab join must broadcast"


def test_wordpiece_doc_scores_no_udf_no_rangesort(spark):
    # all segmentation work is Column algebra over the distinct-word
    # table; the vocab top-k is a TakeOrdered, never a global sort
    df = E.q_wordpiece_doc_scores(spark, SF)
    plan = A.physical_plan(df)
    assert not A.has_python_udf(df)
    assert "rangepartitioning" not in plan, plan[:2000]
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_table_stats_deep_no_global_window(spark):
    # the heavy-hitter rank runs in PER-COLUMN windows: no
    # unpartitioned (SinglePartition) window over data-proportional
    # rows may appear; the profiler stays UDF-free
    df = E.q_table_stats_deep(spark, SF)
    plan = A.physical_plan(df)
    assert not A.has_python_udf(df)
    # every window spec must be PARTITIONED (the quantile cumsum and
    # heavy-hitter rank are keyed by col_name): an unpartitioned spec
    # starts straight with its ORDER BY column ("x ASC/DESC ..."),
    # a partitioned one starts with the partition column
    import re

    specs = re.findall(r"windowspecdefinition\(([^,]*),", plan)
    assert specs, plan[:3000]  # the profiler does use windows
    for first_arg in specs:
        assert " ASC" not in first_arg and " DESC" not in first_arg, (
            first_arg, plan[:3000],
        )


def test_exact_substring_spans_doc_partitioned_windows_no_udf(spark):
    # the span merge must run in doc_id-PARTITIONED windows (never an
    # unpartitioned SinglePartition window over data-proportional
    # covered positions), the dup test is a hash count agg (no pair
    # join, no cartesian), and everything stays JVM-side
    import re

    df = E.q_exact_substring_spans(spark, SF)
    plan = A.physical_plan(df)
    assert not A.has_python_udf(df)
    assert "CartesianProduct" not in plan
    specs = re.findall(r"windowspecdefinition\(([^,]*),", plan)
    assert specs, plan[:3000]
    for first_arg in specs:
        assert " ASC" not in first_arg and " DESC" not in first_arg, (
            first_arg, plan[:3000],
        )


def test_exact_substring_removal_linear_no_udf(spark):
    # round-11: removal is the gap-slicing shape (shared
    # _removal_from_toks_and_spans tail) — windows are allowed but
    # every one must be PARTITIONED (doc_id span merge / h occurrence
    # count), never an unpartitioned single-partition sort; no
    # cartesian, no Python UDF, and no covered-position explode
    # (sequence() Generate) anywhere
    import re

    df = E.q_exact_substring_removal(spark, SF)
    plan = A.physical_plan(df)
    assert not A.has_python_udf(df)
    assert "CartesianProduct" not in plan
    assert "sequence(" not in plan, plan[:3000]
    specs = re.findall(r"windowspecdefinition\(([^,]*),", plan)
    assert specs, plan[:3000]
    for first_arg in specs:
        assert " ASC" not in first_arg and " DESC" not in first_arg, (
            first_arg, plan[:3000],
        )


def test_stratified_budget_sample_group_limit_and_broadcast(spark):
    # the rank window is stratum-partitioned with a constant bound
    # (WindowGroupLimit pushdown), the allocation table broadcasts,
    # and the only unpartitioned window runs over the strata-sized
    # allocation table — never over event rows
    df = E.q_stratified_budget_sample(spark, SF)
    plan = A.physical_plan(df)
    assert not A.has_python_udf(df)
    assert "WindowGroupLimit" in plan, plan[:3000]
    assert A.has_broadcast_join(df), "allocation table must broadcast"


def test_dsir_importance_broadcast_weights_no_udf(spark):
    # the 1024-row bucket weight map and 1-row constant must
    # broadcast; the gram stream is never pair-joined; JVM-side only
    df = E.q_dsir_importance(spark, SF)
    plan = A.physical_plan(df)
    assert not A.has_python_udf(df)
    assert "CartesianProduct" not in plan
    assert A.has_broadcast_join(df), "bucket weights must broadcast"


def test_unigram_lm_scores_no_udf_takeordered_vocab(spark):
    # all DP work is Column algebra over the distinct-word table; the
    # multigram vocab top-k is a TakeOrdered, never a global sort;
    # the piece inventory broadcasts into the candidate join
    df = E.q_unigram_lm_scores(spark, SF)
    plan = A.physical_plan(df)
    assert not A.has_python_udf(df)
    assert "rangepartitioning" not in plan, plan[:2000]
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert A.has_broadcast_join(df), "piece inventory must broadcast"


def test_exact_substring_spans_bytes_doc_windows_no_udf(spark):
    # same discipline as the token variant: doc-partitioned span-merge
    # windows only, hash-count dup test (no pair join / cartesian).
    # The window hashing itself is the repo's one deliberate
    # Arrow-batched vectorized stage (round-9: mapInPandas + numpy
    # rolling hash — stride-1 byte windows have no efficient Column
    # expression); assert it is MapInPandas, never a row-at-a-time
    # BatchEvalPython
    import re

    df = E.q_exact_substring_spans_bytes(spark, SF)
    plan = A.physical_plan(df)
    assert not A.has_python_udf(df)  # no row-at-a-time / scalar UDF
    assert "MapInPandas" in plan, plan[:3000]
    assert "CartesianProduct" not in plan
    specs = re.findall(r"windowspecdefinition\(([^,]*),", plan)
    assert specs, plan[:3000]
    for first_arg in specs:
        assert " ASC" not in first_arg and " DESC" not in first_arg, (
            first_arg, plan[:3000],
        )


def test_exact_substring_spans_bpe_broadcast_vocab(spark):
    # dedup in BPE token space: the segmented-word vocab join must
    # BROADCAST (vocabulary-sized, never corpus-sized), the dup test
    # stays a hash-count aggregate (no pair join / cartesian), and
    # span-merge windows stay doc-partitioned
    import re

    df = E.q_exact_substring_spans_bpe(spark, SF)
    plan = A.physical_plan(df)
    assert A.has_broadcast_join(df), "vocab join must broadcast"
    assert "CartesianProduct" not in plan
    specs = re.findall(r"windowspecdefinition\(([^,]*),", plan)
    assert specs, plan[:3000]
    for first_arg in specs:
        assert " ASC" not in first_arg and " DESC" not in first_arg, (
            first_arg, plan[:3000],
        )


def test_exact_substring_removal_bpe_broadcast_vocab_no_explode(spark):
    # token-space removal: broadcast vocab join, no pair join, and the
    # reassembly must be the gap-slicing shape — no covered-position
    # explode (Generate only over the window-hash/token arrays, which
    # appear once each; a position explode would add a
    # sequence(pos, pos+L-1) Generate). materialize=False keeps the
    # full lineage plan-visible (the default path eagerly
    # localCheckpoints the result and unpersists the token cache, so
    # its plan is a checkpoint scan — see the operator docstring).
    from yelp_streaming_etl_pipeline_spark.operators.dedup import (
        exact_substring_removal_bpe,
    )

    df = exact_substring_removal_bpe(
        E._doc_corpus_cpu(spark, SF), "text", "doc_id", materialize=False
    )
    plan = A.physical_plan(df)
    assert A.has_broadcast_join(df), "vocab join must broadcast"
    assert "CartesianProduct" not in plan
    assert "sequence(" not in plan, plan[:3000]


def test_unigram_em_refine_no_udf_no_window(spark):
    # path recovery is joins + bounded folds over the distinct-word
    # table: no Python UDF, no cartesian (the 1-row Qc constant joins
    # as a broadcast nested loop), and no window function anywhere.
    # The words/vocab/pw/dpfull intermediates are localCheckpointed
    # (distinct-word-sized), so the final plan reads checkpointed
    # RDDs — the vocab top-k's TakeOrderedAndProject discipline is
    # asserted on the shared construction in
    # test_unigram_lm_scores_no_udf_takeordered_vocab
    df = E.q_unigram_em_refine(spark, SF)
    plan = A.physical_plan(df)
    assert not A.has_python_udf(df)
    assert "CartesianProduct" not in plan
    assert "WindowExec" not in plan, plan[:3000]


def test_bigram_lm_scores_no_udf_no_window(spark):
    # model counts are plain aggregates; the scored stream equi-joins
    # the weight table (no pair join / cartesian — the 1-row OOV
    # constant broadcasts as a nested loop); no window, JVM-side only
    df = E.q_bigram_lm_scores(spark, SF)
    plan = A.physical_plan(df)
    assert not A.has_python_udf(df)
    assert "CartesianProduct" not in plan
    assert "WindowExec" not in plan, plan[:3000]


def test_paragraph_dedup_hash_partitioned_window_no_udf(spark):
    # the keep-first rank must run in ph-PARTITIONED windows (hot
    # boilerplate paragraphs are one partition each, never a global
    # sort); the footer crossJoin broadcasts; JVM-side only
    import re

    df = E.q_paragraph_dedup(spark, SF)
    plan = A.physical_plan(df)
    assert not A.has_python_udf(df)
    assert "CartesianProduct" not in plan
    specs = re.findall(r"windowspecdefinition\(([^,]*),", plan)
    assert specs, plan[:3000]
    for first_arg in specs:
        assert " ASC" not in first_arg and " DESC" not in first_arg, (
            first_arg, plan[:3000],
        )


def test_exact_substring_removal_bytes_linear_no_udf(spark):
    # gap-slicing form: the only windows are the doc-partitioned span
    # merge (never an unpartitioned one), no cartesian, JVM-side; no
    # per-byte covered-position explode exists anywhere in the plan
    import re

    df = E.q_exact_substring_removal_bytes(spark, SF)
    plan = A.physical_plan(df)
    assert not A.has_python_udf(df)
    assert "CartesianProduct" not in plan
    specs = re.findall(r"windowspecdefinition\(([^,]*),", plan)
    assert specs, plan[:3000]
    for first_arg in specs:
        assert " ASC" not in first_arg and " DESC" not in first_arg, (
            first_arg, plan[:3000],
        )


def test_lm_filter_roc_no_udf_bounded_window(spark):
    # the LM scoring is joins + aggregates; the only window is the
    # cumulative sweep over the <= 1024-row bin table (the adjudicated
    # bounded small-table class); JVM-side only, no cartesian product
    df = E.q_lm_filter_roc(spark, SF)
    plan = A.physical_plan(df)
    assert not A.has_python_udf(df)
    assert "CartesianProduct" not in plan


def test_lm_filter_mix_shift_group_partitioned_window(spark):
    # the cumulative sweep must run in source-PARTITIONED windows
    # over the bounded bin table; JVM-side, no cartesian
    import re

    df = E.q_lm_filter_mix_shift(spark, SF)
    plan = A.physical_plan(df)
    assert not A.has_python_udf(df)
    assert "CartesianProduct" not in plan
    specs = re.findall(r"windowspecdefinition\(([^,]*),", plan)
    assert specs, plan[:3000]
    for first_arg in specs:
        assert " ASC" not in first_arg and " DESC" not in first_arg, (
            first_arg, plan[:3000],
        )


def test_unigram_em_scores_no_udf_no_window(spark):
    # round-2 scoring inherits em_refine's checkpointed intermediates
    # and stays joins + bounded folds: no Python UDF, no cartesian,
    # no window function
    df = E.q_unigram_em_scores(spark, SF)
    plan = A.physical_plan(df)
    assert not A.has_python_udf(df)
    assert "CartesianProduct" not in plan
    assert "WindowExec" not in plan, plan[:3000]


def test_unigram_em_loop_no_udf_no_window(spark):
    # the R-round trainer loop is R copies of em_refine's discipline
    # chained through checkpointed inventories: the FINAL round's plan
    # (what physical_plan sees — earlier rounds are checkpointed away)
    # must stay joins + bounded folds with no Python UDF, no
    # cartesian, no window function
    df = E.q_unigram_em_loop(spark, SF)
    plan = A.physical_plan(df)
    assert not A.has_python_udf(df)
    assert "CartesianProduct" not in plan
    assert "WindowExec" not in plan, plan[:3000]
