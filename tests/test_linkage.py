"""Record linkage / entity resolution (operators/linkage.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelp_streaming_etl_pipeline_spark.operators import linkage as LK


def _people(spark, rows):
    return spark.createDataFrame(rows, "person_id long, name string")


def test_variant_links_to_base_regardless_of_drop_position(spark):
    # drop at the very FIRST char (kills the prefix block) and the
    # very LAST char (kills the suffix block): multi-pass blocking
    # must still recall both pairs
    rows = [
        (1, "maria garcia"),
        (2, "ivan petrov"),
        (100, "aria garcia"),   # first char dropped
        (200, "ivan petro"),    # last char dropped
    ]
    out = {
        r["person_id"]: r["cluster_id"]
        for r in LK.entity_clusters(_people(spark, rows)).collect()
    }
    assert out[100] == out[1] == 1
    assert out[200] == out[2] == 2


def test_distinct_entities_stay_apart(spark):
    rows = [(1, "maria garcia"), (2, "wei chen"), (3, "omar ali")]
    out = {
        r["person_id"]: r["cluster_id"]
        for r in LK.entity_clusters(_people(spark, rows)).collect()
    }
    assert out == {1: 1, 2: 2, 3: 3}


def test_exact_name_collision_clusters(spark):
    # same name on two ids = duplicate mentions of one entity
    rows = [(5, "yuki tanaka"), (9, "yuki tanaka")]
    out = {
        r["person_id"]: r["cluster_id"]
        for r in LK.entity_clusters(_people(spark, rows)).collect()
    }
    assert out == {5: 5, 9: 5}


def test_transitive_chain_one_cluster(spark):
    # a -1char- b -1char- c: a and c are 2 edits apart but must land
    # in one cluster through b (transitivity, not direct match)
    rows = [(1, "priya patel"), (2, "pria patel"), (3, "ria patel")]
    out = {
        r["person_id"]: r["cluster_id"]
        for r in LK.entity_clusters(_people(spark, rows)).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1}


def test_synthetic_corpus_every_variant_resolves(spark):
    cust = spark.range(1, 400).select(F.col("id").alias("c_custkey"))
    people = LK.with_name_variants(LK.synthetic_people(cust))
    out = LK.entity_clusters(people)
    # every planted variant must share a cluster with its base row
    base = out.filter(F.col("person_id") < LK.VARIANT_ID_OFFSET).select(
        F.col("person_id").alias("b_id"), F.col("cluster_id").alias("b_cl")
    )
    var = out.filter(F.col("person_id") >= LK.VARIANT_ID_OFFSET).select(
        (F.col("person_id") - LK.VARIANT_ID_OFFSET).alias("b_id"),
        F.col("cluster_id").alias("v_cl"),
    )
    joined = base.join(var, "b_id")
    assert joined.count() > 0
    assert joined.filter(F.col("b_cl") != F.col("v_cl")).count() == 0


def test_match_runs_on_name_dictionary_not_rows(spark):
    # 1000 rows, 2 distinct names -> the pair stage sees <= 1 pair,
    # not ~10^6: assert via the pair table itself
    rows = [(i, "sven larsen" if i % 2 else "lena muller")
            for i in range(1000)]
    pairs = LK.blocked_match_pairs(_people(spark, rows))
    assert pairs.count() <= 1


def test_entity_maintain_stream_matches_batch(spark):
    cust = spark.range(1, 300).select(F.col("id").alias("c_custkey"))
    people = LK.with_name_variants(LK.synthetic_people(cust))
    got = LK.entity_maintain_stream(spark, people, n_slices=3)
    batch = LK.entity_clusters(people)
    g = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert g == b


def test_entity_maintain_stream_pairs_are_complete(spark):
    # an old-old pair must never be missed: two names that match each
    # other arrive in DIFFERENT batches, and a third matching name in
    # the last batch must link to both earlier ones
    rows = [
        (1, "priya patel"),    # slice 1
        (50, "pria patel"),    # slice 2 (matches 1)
        (90, "ria patel"),     # slice 3 (matches 50; links all three)
    ]
    df = spark.createDataFrame(rows, "person_id long, name string")
    out = {
        r["person_id"]: r["cluster_id"]
        for r in LK.entity_maintain_stream(spark, df, n_slices=3).collect()
    }
    assert out == {1: 1, 50: 1, 90: 1}


def test_block_cap_bounds_hot_block(spark):
    # 50 names all sharing both block keys ("p:aa", "s:aa"); with
    # block_cap=5 the per-block dictionary is capped at 5 names, so
    # candidate pairs are <= 2 blocks * C(5,2) = 20 instead of 1225
    rows = [(i, "aa" + "x" * (i % 3) + "aa") for i in range(1, 51)]
    capped = LK.blocked_match_pairs(_people(spark, rows), block_cap=5)
    assert capped.count() <= 20
    # deterministic: same cap selection on re-run
    again = LK.blocked_match_pairs(_people(spark, rows), block_cap=5)
    assert sorted(map(tuple, capped.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_block_cap_default_does_not_bind_on_small_dictionary(spark):
    rows = [
        (1, "maria garcia"),
        (2, "ivan petrov"),
        (100, "aria garcia"),
        (200, "ivan petro"),
    ]
    df = _people(spark, rows)
    with_cap = sorted(map(tuple, LK.blocked_match_pairs(df).collect()))
    no_cap = sorted(
        map(tuple, LK.blocked_match_pairs(df, block_cap=None).collect())
    )
    assert with_cap == no_cap and len(no_cap) == 2
