"""Order-independent table fingerprints (operators/integrity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelp_streaming_etl_pipeline_spark.operators.integrity import (
    table_fingerprint,
)


def _fp(spark, rows):
    df = spark.createDataFrame(rows, "a long, b string")
    row = table_fingerprint(
        df, [F.col("a"), F.col("b")], "t"
    ).collect()[0]
    return row["n_rows"], row["checksum"]


def test_fingerprint_is_order_and_partition_independent(spark):
    rows = [(i, f"v{i % 7}") for i in range(200)]
    base = _fp(spark, rows)
    shuffled = _fp(spark, list(reversed(rows)))
    assert base == shuffled
    df = spark.createDataFrame(rows, "a long, b string").repartition(13)
    row = table_fingerprint(df, [F.col("a"), F.col("b")], "t").collect()[0]
    assert (row["n_rows"], row["checksum"]) == base


def test_fingerprint_detects_single_cell_change(spark):
    rows = [(i, "x") for i in range(50)]
    changed = list(rows)
    changed[17] = (17, "y")
    assert _fp(spark, rows) != _fp(spark, changed)


def test_fingerprint_null_tagging_disambiguates(spark):
    # ("a", NULL) vs (NULL, "a") must not collide — concat_ws alone
    # would encode both as "a"
    r1 = [( None, "a")]
    r2 = [(97, None)]  # "97"|NULL vs NULL|"a" -> distinct encodings
    df1 = spark.createDataFrame(r1, "a long, b string")
    df2 = spark.createDataFrame(r2, "a long, b string")
    c1 = table_fingerprint(df1, [F.col("a"), F.col("b")], "t").collect()[0]["checksum"]
    c2 = table_fingerprint(df2, [F.col("a"), F.col("b")], "t").collect()[0]["checksum"]
    assert c1 != c2


def test_fingerprint_incremental_delta(spark):
    # fingerprint(base + delta) == (fingerprint(base) + fingerprint(delta)) mod 2^61
    from yelp_streaming_etl_pipeline_spark.operators.integrity import FP_MOD

    base = [(i, "r") for i in range(30)]
    delta = [(100 + i, "s") for i in range(5)]
    _, cb = _fp(spark, base)
    _, cd = _fp(spark, delta)
    _, call = _fp(spark, base + delta)
    assert call == (cb + cd) % FP_MOD


def test_fingerprint_empty_table_is_zero_not_null(spark):
    # SUM over zero rows is NULL; the operator must coalesce so an
    # empty replica fingerprints to (0 rows, checksum 0) and audits
    # never compare NULL = NULL
    n, c = _fp(spark, [])
    assert n == 0
    assert c == 0


def test_table_stats_profile_exact_on_small_table(spark):
    """Profiler semantics on a hand-checkable table: native (not
    lexicographic) min/max, null counting, and an HLL ndv that is
    EXACT at tiny cardinality (linear-counting regime)."""
    from pyspark.sql import functions as F

    from yelp_streaming_etl_pipeline_spark.operators.integrity import (
        table_stats_profile,
    )

    rows = [(2, "b"), (10, "a"), (None, "a"), (3, None)]
    df = spark.createDataFrame(rows, "k long, s string")
    out = {
        r["col_name"]: r
        for r in table_stats_profile(
            df,
            [
                ("k", F.col("k"), lambda c: c.cast("string")),
                ("s", F.col("s"), lambda c: c.cast("string")),
            ],
        ).collect()
    }
    k, s = out["k"], out["s"]
    assert k["n_rows"] == 4 and k["n_nulls"] == 1
    # numeric min/max: 2..10, NOT the lexicographic "10".."3"
    assert (k["min_val"], k["max_val"]) == ("2", "10")
    assert abs(k["ndv_est"] - 3.0) < 0.1  # linear-counting regime
    assert s["n_nulls"] == 1
    assert (s["min_val"], s["max_val"]) == ("a", "b")
    assert abs(s["ndv_est"] - 2.0) < 0.1


def test_table_stats_profile_reports_all_null_column(spark):
    # an entirely-NULL column has no melted HLL rows; it must still
    # profile (ndv 0) instead of silently disappearing from the report
    from pyspark.sql import functions as F

    from yelp_streaming_etl_pipeline_spark.operators.integrity import (
        table_stats_profile,
    )

    df = spark.createDataFrame(
        [(1, None), (2, None)], "k long, dead string"
    )
    out = {
        r["col_name"]: r
        for r in table_stats_profile(
            df,
            [
                ("k", F.col("k"), lambda c: c.cast("string")),
                ("dead", F.col("dead"), lambda c: c.cast("string")),
            ],
        ).collect()
    }
    assert "dead" in out
    d = out["dead"]
    assert d["n_nulls"] == 2 and d["ndv_est"] == 0.0
    assert d["min_val"] is None and d["max_val"] is None


def test_table_stats_profile_deep_quartiles_and_topk(spark):
    """Deep profile on a hand-checkable table: exact quartiles in the
    sub-bucket-exact HDR regime, pinned top-k order (count DESC,
    value ASC), NULL p* for non-numeric columns, and the all-NULL
    column still reporting (ndv 0, no topk)."""
    from pyspark.sql import functions as F

    from yelp_streaming_etl_pipeline_spark.functions.rounding import (
        quantize,
    )
    from yelp_streaming_etl_pipeline_spark.operators.integrity import (
        table_stats_profile_deep,
    )

    rows = [(1, "a", None), (2, "b", None), (3, "a", None), (4, "a", None)]
    df = spark.createDataFrame(rows, "k long, s string, dead string")
    out = {
        r["col_name"]: r
        for r in table_stats_profile_deep(
            df,
            [
                ("k", F.col("k"), lambda c: c.cast("string")),
                ("s", F.col("s"), lambda c: c.cast("string")),
                ("dead", F.col("dead"), lambda c: c.cast("string")),
            ],
            {"k": quantize(F.col("k"), 3)},
        ).collect()
    }
    k, s, d = out["k"], out["s"], out["dead"]
    # ranks ceil(p*4) = 1, 2, 3 -> values 1, 2, 3, each read at its
    # HDR bucket midpoint (relative error <= 1/64 by construction)
    for got, want in ((k["p25"], 1.0), (k["p50"], 2.0), (k["p75"], 3.0)):
        assert abs(got - want) / want <= 1.0 / 64, (got, want)
    assert k["topk"] == "1:1|2:1|3:1|4:1"  # ties break value-ASC
    assert s["p25"] is None and s["p50"] is None
    assert s["topk"] == "a:3|b:1"
    assert d["ndv_est"] == 0.0 and d["topk"] is None
    assert d["n_nulls"] == 4
