"""Explicit-HLL behavior: accuracy envelope and sketch mergeability."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelp_streaming_etl_pipeline_spark.operators import sketches as SK


def test_hll_estimate_within_error_envelope(spark):
    # m=256 -> standard error ~1.04/sqrt(256) = 6.5%; assert 3 sigma
    for n in (500, 5000, 50000):
        df = spark.range(n).select(F.col("id").alias("k"))
        est = SK.hll_estimate(SK.hll_registers(df, F.col("k"))).collect()[0][
            "hll_estimate"
        ]
        assert abs(est - n) / n < 0.20, (n, est)


def test_hll_registers_mergeable(spark):
    # sketch(A ∪ B) == bucket-wise max of sketch(A), sketch(B) — the
    # property that makes the 256-row shuffle sufficient at any scale
    a = spark.range(0, 3000).select(F.col("id").alias("k"))
    b = spark.range(2000, 6000).select(F.col("id").alias("k"))
    direct = {
        (r["bucket"], r["max_rho"])
        for r in SK.hll_registers(a.union(b), F.col("k")).collect()
    }
    merged = {
        (r["bucket"], r["max_rho"])
        for r in (
            SK.hll_registers(a, F.col("k"))
            .unionByName(SK.hll_registers(b, F.col("k")))
            .groupBy("bucket")
            .agg(F.max("max_rho").alias("max_rho"))
        ).collect()
    }
    assert direct == merged


def test_hll_insensitive_to_duplication(spark):
    # distinct-count sketch must not move when rows repeat
    df = spark.range(4000).select(F.col("id").alias("k"))
    dup = df.union(df).union(df)
    one = SK.hll_estimate(SK.hll_registers(df, F.col("k"))).collect()[0][0]
    three = SK.hll_estimate(SK.hll_registers(dup, F.col("k"))).collect()[0][0]
    assert one == three


def test_cms_never_undercounts(spark):
    # est >= exact for EVERY term (the count-min guarantee), and the
    # overcount is bounded in aggregate
    rows = [(f"w{i % 50}",) for i in range(3000)] + [("hot",)] * 500
    df = spark.createDataFrame(rows, ["term"])
    exact = {
        r["term"]: r["n"]
        for r in df.groupBy("term").agg(F.count("*").alias("n")).collect()
    }
    est = {
        r["term"]: r["est_count"]
        for r in SK.cms_heavy_hitters(df, F.col("term"), k=100).collect()
    }
    assert est["hot"] >= 500
    for t, e in est.items():
        assert e >= exact[t], (t, e, exact[t])
    # hot term dominates the estimates
    assert max(est, key=est.get) == "hot"


def test_cms_counters_merge_by_sum(spark):
    a = spark.createDataFrame([(f"a{i % 7}",) for i in range(200)], ["term"])
    b = spark.createDataFrame([(f"a{i % 5}",) for i in range(300)], ["term"])
    direct = {
        (r["salt"], r["bucket"]): r["cnt"]
        for r in SK.cms_counters(a.union(b), F.col("term")).collect()
    }
    merged = {}
    for part in (a, b):
        for r in SK.cms_counters(part, F.col("term")).collect():
            k = (r["salt"], r["bucket"])
            merged[k] = merged.get(k, 0) + r["cnt"]
    assert direct == merged


def test_histogram_quantile_tracks_exact(spark):
    df = spark.range(10000).select(
        ((F.col("id") * 37) % 1000).cast("double").alias("v")
    )
    hist = sorted(
        SK.value_histogram(df, F.col("v")).collect(), key=lambda r: r["bin"]
    )
    total = sum(r["n"] for r in hist)
    assert total == 10000
    # estimate the median from the cumulative histogram (bin midpoint)
    acc = 0
    for r in hist:
        acc += r["n"]
        if acc >= total / 2:
            est = (r["lo"] + r["hi"]) / 2
            break
    exact = df.selectExpr("percentile(v, 0.5) AS m").collect()[0]["m"]
    span = hist[-1]["hi"] - hist[0]["lo"]
    assert abs(est - exact) <= span / SK.HIST_BINS, (est, exact)


def test_histogram_merge_by_sum(spark):
    # same bin edges (same global range in both halves) -> merge = sum
    a = spark.range(0, 4000).select((F.col("id") % 1000).cast("double").alias("v"))
    b = spark.range(0, 3000).select((F.col("id") % 1000).cast("double").alias("v"))
    direct = {
        r["bin"]: r["n"]
        for r in SK.value_histogram(a.union(b), F.col("v")).collect()
    }
    merged = {}
    for part in (a, b):
        for r in SK.value_histogram(part, F.col("v")).collect():
            merged[r["bin"]] = merged.get(r["bin"], 0) + r["n"]
    assert direct == merged


def test_hll_small_range_correction_accuracy(spark):
    """At low cardinality most registers are empty and the raw HLL
    formula is biased high; the linear-counting correction must bring
    the estimate within a tight envelope of the exact count."""
    from pyspark.sql import functions as F

    from yelp_streaming_etl_pipeline_spark.operators import sketches as SK

    n = 20
    df = spark.range(1000).select(
        (F.col("id") % n).cast("string").alias("k")
    )
    regs = SK.hll_registers(df, F.col("k"))
    est = SK.hll_estimate(regs).collect()[0]["hll_estimate"]
    assert abs(est - n) / n < 0.15, est


def test_cms_join_size_never_undercounts(spark):
    # true join size = sum_k |L_k|*|R_k|; each salt's dot product adds
    # only non-negative collision mass, so min over salts >= truth
    left = spark.range(2000).select(
        (F.col("id") % 150).cast("string").alias("k")
    )
    right = spark.range(1000).select(
        (F.col("id") % 100).cast("string").alias("k")
    )
    exact = left.join(right, "k").count()
    rows = SK.cms_join_size(
        left, F.col("k"), right, F.col("k")
    ).collect()
    assert len(rows) == SK.CMS_DEPTH
    est = rows[0]["est_join_size"]
    assert all(r["est_join_size"] == est for r in rows)
    assert est == min(r["dot_product"] for r in rows)
    assert est >= exact
    # buckets (4096) >> keys (150): collisions are rare, estimate tight
    assert est <= exact * 1.2


def test_hll_set_ops_disjoint_and_identical(spark):
    a = spark.range(0, 3000).select(F.col("id").alias("k"))
    b = spark.range(3000, 6000).select(F.col("id").alias("k"))
    row = SK.hll_set_ops(a, F.col("k"), b, F.col("k")).collect()[0]
    # disjoint: union ~ |a|+|b|, intersection ~ 0 (within HLL error)
    assert abs(row["est_union"] - 6000) / 6000 < 0.20
    assert row["est_intersection"] < 0.25 * 3000
    same = SK.hll_set_ops(a, F.col("k"), a, F.col("k")).collect()[0]
    # identical inputs: union registers == input registers, so the
    # estimates agree exactly and intersection == est_a exactly
    assert same["est_union"] == same["est_a"] == same["est_b"]
    assert abs(same["est_intersection"] - same["est_a"]) < 1e-9


def test_hll_merge_equals_union_build(spark):
    a = spark.range(0, 2500).select(F.col("id").alias("k"))
    b = spark.range(1500, 4000).select(F.col("id").alias("k"))
    merged = {
        (r["bucket"], r["max_rho"])
        for r in SK.hll_merge(
            SK.hll_registers(a, F.col("k")),
            SK.hll_registers(b, F.col("k")),
        ).collect()
    }
    direct = {
        (r["bucket"], r["max_rho"])
        for r in SK.hll_registers(
            a.unionAll(b), F.col("k")
        ).collect()
    }
    assert merged == direct


def test_grouped_hll_matches_global_per_group(spark):
    # building per-group sketches == building a global sketch over
    # each group's rows in isolation (registers identical), and the
    # estimate tracks the true per-group distinct count
    df = spark.range(9000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id")).alias("k"),
    )
    grouped = SK.hll_estimate_by_group(
        SK.hll_registers_by_group(df, F.col("g"), F.col("k"))
    ).collect()
    assert len(grouped) == 3
    for r in grouped:
        n = 3000  # each residue class has 3000 distinct ids
        assert abs(r["hll_estimate"] - n) / n < 0.20, r
    # register-level equivalence vs isolated global builds
    for g in ("0", "1", "2"):
        iso = {
            (x["bucket"], x["max_rho"])
            for x in SK.hll_registers(
                df.filter(F.col("g") == g), F.col("k")
            ).collect()
        }
        per = {
            (x["bucket"], x["max_rho"])
            for x in SK.hll_registers_by_group(
                df, F.col("g"), F.col("k")
            )
            .filter(F.col("g") == g)
            .collect()
        }
        assert iso == per


# ---------------- HDR quantile sketch ----------------

def test_quantile_sketch_registers_mergeable(spark):
    # registers(A ∪ B) == per-bucket sum of registers(A), registers(B)
    # — the additivity that makes the sketch a 100 TB quantile answer
    a = spark.range(1, 4000).selectExpr("id * 0.37 AS v")
    b = spark.range(4000, 9000).selectExpr("id * 0.37 AS v")
    direct = {
        (r["bucket"], r["lb_q"], r["width_q"], r["n"])
        for r in SK.quantile_sketch_registers(
            a.union(b), F.col("v")
        ).collect()
    }
    merged = {
        (r["bucket"], r["lb_q"], r["width_q"], r["n"])
        for r in (
            SK.quantile_sketch_registers(a, F.col("v"))
            .unionByName(SK.quantile_sketch_registers(b, F.col("v")))
            .groupBy("bucket")
            .agg(
                F.min("lb_q").alias("lb_q"),
                F.min("width_q").alias("width_q"),
                F.sum("n").alias("n"),
            )
        ).collect()
    }
    assert direct == merged


def test_quantile_sketch_relative_error_bound(spark):
    # guaranteed relative value error 2^-QSK_SUB_BITS per quantile
    # (bucket width / bucket lower bound <= 2^-B; midpoint halves it)
    df = spark.range(1, 20001).selectExpr("id * 0.11 AS v")
    regs = SK.quantile_sketch_registers(df, F.col("v"))
    got = {
        r["p"]: r["est"]
        for r in SK.quantile_sketch_estimate(regs).collect()
    }
    import math

    n = 20000
    for p in SK.QSK_PS:
        exact = math.ceil(p * n) * 0.11
        rel = abs(got[p] - exact) / exact
        assert rel <= 2.0 ** -SK.QSK_SUB_BITS, (p, got[p], exact, rel)


def test_quantile_sketch_buckets_data_range_independent(spark):
    # unlike equi-width histograms, a value's bucket never depends on
    # what else is in the dataset — an outlier can't stretch the bins
    base = spark.range(1, 1000).selectExpr("id * 1.0 AS v")
    spiked = base.union(spark.range(1).selectExpr("1.0e9 AS v"))
    f = F.col("v")
    b1 = {
        r["bucket"]: r["n"]
        for r in SK.quantile_sketch_registers(base, f).collect()
    }
    b2 = {
        r["bucket"]: r["n"]
        for r in SK.quantile_sketch_registers(spiked, f).collect()
    }
    # every base bucket unchanged; the outlier adds exactly one bucket
    for k, v in b1.items():
        assert b2[k] == v
    assert len(b2) == len(b1) + 1


def test_quantile_sketch_by_group_matches_isolated_builds(spark):
    # the grouped registers equal per-group isolated global builds —
    # grouping is pure key-space partitioning, no cross-group effects
    df = spark.range(1, 5000).selectExpr(
        "CASE WHEN id % 3 = 0 THEN 'a' ELSE 'b' END AS g",
        "id * 0.21 AS v",
    )
    grouped = {
        (r["g"], r["bucket"], r["lb_q"], r["width_q"], r["n"])
        for r in SK.quantile_sketch_registers_by_group(
            df, F.col("g"), F.col("v")
        ).collect()
    }
    isolated = set()
    for g in ("a", "b"):
        for r in SK.quantile_sketch_registers(
            df.filter(F.col("g") == g), F.col("v")
        ).collect():
            isolated.add((g, r["bucket"], r["lb_q"], r["width_q"], r["n"]))
    assert grouped == isolated
    # and the per-group estimates match the global estimator applied
    # to each group's registers
    got = {
        (r["g"], r["p"]): r["est"]
        for r in SK.quantile_sketch_estimate_by_group(
            SK.quantile_sketch_registers_by_group(
                df, F.col("g"), F.col("v")
            )
        ).collect()
    }
    for g in ("a", "b"):
        solo = {
            r["p"]: r["est"]
            for r in SK.quantile_sketch_estimate(
                SK.quantile_sketch_registers(
                    df.filter(F.col("g") == g), F.col("v")
                )
            ).collect()
        }
        for p, est in solo.items():
            assert got[(g, p)] == est


def test_cms_topk_from_counters_matches_inline_build(spark):
    """Decoupled readout over a prebuilt counter table equals the
    one-shot cms_heavy_hitters on the same data."""
    from pyspark.sql import functions as F

    from yelp_streaming_etl_pipeline_spark.operators import sketches as SK

    rows = [("a",)] * 30 + [("b",)] * 20 + [("c",)] * 5 + [("d",)] * 1
    df = spark.createDataFrame(rows, "term string")
    counters = SK.cms_counters(df, F.col("term"))
    terms = df.select("term").distinct()
    got = [
        (r["term"], r["est_count"])
        for r in SK.cms_topk_from_counters(counters, terms, k=3).collect()
    ]
    want = [
        (r["term"], r["est_count"])
        for r in SK.cms_heavy_hitters(df, F.col("term"), k=3).collect()
    ]
    assert got == want
    assert got[0][0] == "a" and got[0][1] >= 30  # CMS never undercounts
