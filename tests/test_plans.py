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
