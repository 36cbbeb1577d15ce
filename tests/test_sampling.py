"""Deterministic-sampling behavior: stable under re-runs and data
growth, rates near nominal, splits exhaustive and disjoint."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelp_streaming_etl_pipeline_spark.operators import sampling as SAMP


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("label"),
    )


def test_hash_bucket_uniform_and_stable(spark):
    df = _docs(spark).select(
        "doc_id", SAMP.hash_bucket(F.col("doc_id"), 10).alias("b")
    )
    counts = {r["b"]: r["n"] for r in df.groupBy("b").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(range(10))
    assert all(130 <= c <= 270 for c in counts.values()), counts
    # stable: same input -> same buckets on a second evaluation
    again = {r["doc_id"]: r["b"] for r in df.collect()}
    assert {r["doc_id"]: r["b"] for r in df.collect()} == again


def test_stratified_sample_rates(spark):
    out = SAMP.stratified_sample(
        _docs(spark), "label", {"0": 0.5, "1": 0.1}, "doc_id",
        default_rate=0.0,
    )
    counts = {
        r["label"]: r["n"]
        for r in out.groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) <= {"0", "1"}  # default rate 0 drops labels 2, 3
    assert 200 <= counts["0"] <= 300  # ~250 of 500
    assert 25 <= counts["1"] <= 75  # ~50 of 500


def test_sample_decisions_stable_under_growth(spark):
    # hash sampling must not reshuffle earlier decisions when rows
    # are added — the property rand() sampling loses
    small = SAMP.stratified_sample(
        _docs(spark, 500), "label", {}, "doc_id", default_rate=0.3
    )
    big = SAMP.stratified_sample(
        _docs(spark, 2000), "label", {}, "doc_id", default_rate=0.3
    )
    kept_small = {r["doc_id"] for r in small.collect()}
    kept_big = {r["doc_id"] for r in big.collect() if r["doc_id"] < 500}
    assert kept_small == kept_big


def test_train_test_split_exhaustive_disjoint(spark):
    out = SAMP.train_test_split(
        _docs(spark), "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1}
    )
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(counts.values()) == 2000  # every row labeled exactly once
    assert counts["train"] > counts["valid"] and counts["train"] > counts["test"]
    assert 1500 <= counts["train"] <= 1700
    # bucket ranges, not modulo tricks: highest bucket is 'test'
    assert 150 <= counts["valid"] + counts["test"] <= 450


def test_class_capped_sample(spark):
    out = SAMP.class_capped_sample(_docs(spark), "label", "doc_id", 7)
    counts = {
        r["label"]: r["n"]
        for r in out.groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"0": 7, "1": 7, "2": 7, "3": 7}
    # deterministic pick: the same 28 ids every run
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in SAMP.class_capped_sample(
            _docs(spark), "label", "doc_id", 7
        ).collect()
    )
    assert ids1 == ids2


def test_pps_sample_rate_proportional_to_weight(spark):
    # weight w kept with probability ~w/scale; heavy rows kept more
    rows = [(i, 100 if i < 1000 else 900) for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    out = SAMP.pps_sample(df, "w", "doc_id", 1000.0)
    kept = out.groupBy("w").agg(F.count("*").alias("n")).collect()
    by_w = {r["w"]: r["n"] for r in kept}
    # expect ~10% of light (100) and ~90% of heavy (900) rows
    assert 50 <= by_w.get(100, 0) <= 160
    assert 820 <= by_w.get(900, 0) <= 960
    # determinism: identical second draw
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in SAMP.pps_sample(df, "w", "doc_id", 1000.0).collect()
    )
    assert ids1 == ids2


def test_mixture_sample_hits_target_shares(spark):
    from yelp_streaming_etl_pipeline_spark.operators.sampling import (
        mixture_sample,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    targets = {"en": 0.5, "es": 0.2, "fr": 0.2, "de": 0.1}
    got = mixture_sample(
        docs.select("doc_id", "lang"), "lang", "doc_id", targets
    )
    by_class = {
        r["lang"]: r["count"] for r in got.groupBy("lang").count().collect()
    }
    assert set(by_class) <= set(targets)  # zh dropped
    total = sum(by_class.values())
    avail = {
        r["lang"]: r["count"]
        for r in docs.groupBy("lang").count().collect()
    }
    # shares match targets to within floor rounding
    for c, p in targets.items():
        assert abs(by_class.get(c, 0) - p * total) <= len(targets)
    # maximality: the scarcest class is fully used (its cap binds)
    binding = min(targets, key=lambda c: avail[c] / targets[c])
    assert by_class[binding] >= avail[binding] - len(targets)
    # determinism
    again = mixture_sample(
        docs.select("doc_id", "lang"), "lang", "doc_id", targets
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_cluster_balanced_sample_caps_every_cluster(spark):
    from yelp_streaming_etl_pipeline_spark.operators.sampling import (
        class_capped_sample,
    )

    # skewed clusters: 0 has 40 members, 1 has 3
    rows = [(i, 0) for i in range(40)] + [(100 + i, 1) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, cluster_id long")
    out = class_capped_sample(df, "cluster_id", "vec_id", cap=10).collect()
    from collections import Counter

    sizes = Counter(r["cluster_id"] for r in out)
    assert sizes[0] == 10  # dense cluster capped
    assert sizes[1] == 3  # sparse cluster intact


# ---------------- PPS without replacement ----------------


def test_pps_wor_matches_sequential_model(spark):
    import hashlib

    from yelp_streaming_etl_pipeline_spark.operators.sampling import (
        pps_wor_sample,
    )

    rows = [(i, 1 + (i * 7) % 9) for i in range(1, 60)]
    df = spark.createDataFrame(rows, "id long, w long")
    got = [
        (r["rank"], r["key"], r["weight"])
        for r in pps_wor_sample(df, "w", "id", k=10)
        .orderBy("rank")
        .collect()
    ]
    # sequential model: min md5 over w candidates per key, k smallest
    model = sorted(
        (
            min(
                hashlib.md5(f"{i}|{j}".encode()).hexdigest()
                for j in range(1, w + 1)
            ),
            i,
            w,
        )
        for i, w in rows
    )[:10]
    want = [(r + 1, i, w) for r, (_, i, w) in enumerate(model)]
    assert got == want


def test_pps_wor_rejects_out_of_range_weight(spark):
    import pytest

    from yelp_streaming_etl_pipeline_spark.operators.sampling import (
        pps_wor_sample,
    )

    df = spark.createDataFrame(
        [(1, 5), (2, 0)], "id long, w long"
    )
    with pytest.raises(Exception, match="weight|assert"):
        pps_wor_sample(df, "w", "id", k=1).collect()
    df2 = spark.createDataFrame([(1, 2000)], "id long, w long")
    with pytest.raises(Exception, match="weight|assert"):
        pps_wor_sample(df2, "w", "id", k=1, max_weight=1024).collect()


def test_bottomk_sample_exact_size_and_merge_property(spark):
    """Bottom-k: exact per-group size (k, or group size if smaller),
    pinned deterministic picks, and MERGEABILITY — bottom-k of a
    union equals prune(union of the halves' bottom-ks), the property
    that makes the streaming maintenance order-independent."""
    from pyspark.sql import functions as F

    from yelp_streaming_etl_pipeline_spark.operators.sampling import (
        bottomk_sample_by_group,
    )

    df = spark.createDataFrame(
        [(f"g{i % 3}", i) for i in range(60)] + [("tiny", 999)],
        "cls string, uid long",
    )
    got = bottomk_sample_by_group(
        df, F.col("cls"), F.col("uid"), k=4
    )
    sizes = {r["g"]: r["n"] for r in got.groupBy("g").agg(
        F.count("*").alias("n")).collect()}
    assert sizes == {"g0": 4, "g1": 4, "g2": 4, "tiny": 1}
    full = sorted(map(tuple, got.collect()))
    # merge: split by uid parity, bottom-k each half, re-prune union
    a = bottomk_sample_by_group(
        df.filter(F.col("uid") % 2 == 0), F.col("cls"), F.col("uid"), k=4)
    b = bottomk_sample_by_group(
        df.filter(F.col("uid") % 2 == 1), F.col("cls"), F.col("uid"), k=4)
    merged = bottomk_sample_by_group(
        a.unionByName(b), F.col("g"), F.col("unit"), k=4)
    assert sorted(map(tuple, merged.collect())) == full


def test_bottomk_stream_equals_batch(spark):
    """Final epoch of the streaming maintenance equals the batch
    sample over all data — arrival order cannot matter."""
    from pyspark.sql import functions as F

    from yelp_streaming_etl_pipeline_spark.operators.sampling import (
        bottomk_sample_by_group,
        bottomk_sample_maintain_stream,
    )

    df = spark.createDataFrame(
        [(f"g{i % 2}", i) for i in range(40)], "cls string, uid long"
    )
    batch = sorted(map(tuple, bottomk_sample_by_group(
        df, F.col("cls"), F.col("uid"), k=3).collect()))
    stream = sorted(map(tuple, bottomk_sample_maintain_stream(
        spark, df, F.col("cls"), F.col("uid"), k=3, n_slices=3,
        order_cols=["uid"]).collect()))
    assert stream == batch and len(batch) == 6


def test_bottomk_null_units_never_consume_slots(spark):
    """A NULL unit hashes to NULL (sorts first in Spark ascending,
    last in DuckDB) — excluded in both engines so it can neither
    consume a sample slot nor diverge cross-engine (ADVICE r7)."""
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 2), ("a", 3), ("b", None)],
        "cls string, uid long",
    )
    out = SAMP.bottomk_sample_by_group(
        df, F.col("cls"), F.col("uid"), k=3
    ).collect()
    assert sorted(r["unit"] for r in out) == [1, 2, 3]
    assert all(r["g"] == "a" for r in out)  # b had only the NULL row


def test_stratified_budget_alloc_largest_remainder(spark):
    """60/30/10/1 rows, budget 24: floors are 14/7/2/0 (sum 23) and
    the single extra goes to the largest remainder (stratum c)."""
    counts = spark.createDataFrame(
        [("a", 60), ("b", 30), ("c", 10), ("d", 1)], "g string, w long"
    )
    alloc = {
        r["g"]: r["k_g"]
        for r in SAMP.stratified_budget_alloc(counts, budget=24).collect()
    }
    assert alloc == {"a": 14, "b": 7, "c": 3, "d": 0}


def test_stratified_budget_sample_exact_total_and_caps(spark):
    """The sample holds exactly the budget when data allows, never
    exceeds a stratum's population, and is deterministic."""
    from pyspark.sql import functions as F

    rows = (
        [("a", i) for i in range(60)]
        + [("b", 1000 + i) for i in range(30)]
        + [("c", 5000 + i) for i in range(10)]
        + [("d", 9999)]
    )
    df = spark.createDataFrame(rows, "cls string, uid long")
    out = SAMP.stratified_budget_sample(
        df, F.col("cls"), F.col("uid"), budget=24
    )
    per = {r["g"]: r["count"] for r in out.groupBy("g").count().collect()}
    assert sum(per.values()) == 24
    assert per == {"a": 14, "b": 7, "c": 3}
    again = SAMP.stratified_budget_sample(
        df, F.col("cls"), F.col("uid"), budget=24
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, again.collect())
    )
    # budget larger than the data: every row sampled, nothing invented
    tiny = spark.createDataFrame(
        [("a", 1), ("b", 2)], "cls string, uid long"
    )
    n = SAMP.stratified_budget_sample(
        tiny, F.col("cls"), F.col("uid"), budget=24
    ).count()
    assert n == 2


def test_stratified_budget_sample_neyman_style_weights(spark):
    """Caller-supplied (g, w) weights steer the allocation (the
    Neyman hook: w = n_g * sd_g scaled to integers) — a high-variance
    small stratum out-allocates a low-variance big one."""
    from pyspark.sql import functions as F

    rows = [("big", i) for i in range(50)] + [
        ("small", 100 + i) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "cls string, uid long")
    weights = spark.createDataFrame(
        [("big", 10), ("small", 90)], "g string, w long"
    )
    out = SAMP.stratified_budget_sample(
        df, F.col("cls"), F.col("uid"), budget=10, weight_counts=weights
    )
    per = {r["g"]: r["count"] for r in out.groupBy("g").count().collect()}
    assert per == {"big": 1, "small": 9}


def test_stratified_budget_stream_equals_batch(spark):
    """Mergeable counts + bottom-budget state: the final epoch equals
    the batch sample regardless of arrival order."""
    from pyspark.sql import functions as F

    rows = [(f"g{i % 3}", i) for i in range(45)]
    df = spark.createDataFrame(rows, "cls string, uid long")
    batch = sorted(
        map(
            tuple,
            SAMP.stratified_budget_sample(
                df, F.col("cls"), F.col("uid"), budget=12
            ).collect(),
        )
    )
    stream = sorted(
        map(
            tuple,
            SAMP.stratified_budget_sample_maintain_stream(
                spark,
                df,
                F.col("cls"),
                F.col("uid"),
                budget=12,
                n_slices=3,
                order_cols=["uid"],
            ).collect(),
        )
    )
    assert stream == batch and len(batch) == 12
