"""Semantics tests for operators/clustering.py (quantized Lloyd)."""

from __future__ import annotations

import random

from yelp_streaming_etl_pipeline_spark.operators.clustering import (
    KMEANS_OFFSET,
    kmeans_lloyd,
    quantize_vec,
)

from pyspark.sql import functions as F


def _blobs(spark, n_per=30, dim=8):
    """Two well-separated blobs; ids 0 and 1 (the seeds) sit one in
    each blob, so k=2 seeding starts with one centroid per blob."""
    rng = random.Random(3)
    rows = []
    for i in range(n_per):
        rows.append((2 * i, [1.0 + rng.uniform(-0.05, 0.05) for _ in range(dim)]))
        rows.append(
            (2 * i + 1, [-1.0 + rng.uniform(-0.05, 0.05) for _ in range(dim)])
        )
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_separates_blobs(spark):
    df = _blobs(spark)
    out = kmeans_lloyd(df, k=2, iters=2).collect()
    by_parity = {0: set(), 1: set()}
    for r in out:
        by_parity[r["vec_id"] % 2].add(r["cluster_id"])
    # each blob lands entirely in one cluster, and they differ
    assert len(by_parity[0]) == 1 and len(by_parity[1]) == 1
    assert by_parity[0] != by_parity[1]


def test_kmeans_deterministic(spark):
    df = _blobs(spark)
    a = sorted(map(tuple, kmeans_lloyd(df, k=2, iters=2).collect()))
    b = sorted(map(tuple, kmeans_lloyd(df, k=2, iters=2).collect()))
    assert a == b


def test_kmeans_iteration_does_not_increase_cost(spark):
    df = _blobs(spark)

    def cost(iters):
        return (
            kmeans_lloyd(df, k=2, iters=iters)
            .agg(F.sum("sq_dist").alias("c"))
            .collect()[0]["c"]
        )

    assert cost(2) <= cost(1) <= cost(0)


def test_quantize_vec_offset_and_rounding(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 1.0, -1.0, 0.0000005])], "vec_id long, embedding array<float>"
    )
    [row] = df.select(quantize_vec(F.col("embedding")).alias("q")).collect()
    base = KMEANS_OFFSET
    assert row["q"][0] == base
    assert row["q"][1] == base + 1_000_000
    assert row["q"][2] == base - 1_000_000
    # 5e-7 rounds half-up to 1 quantum (float32 of 5e-7 is just below
    # or above .5 ulp — accept the stable kernel's answer both sides
    assert row["q"][3] in (base, base + 1)


def test_pq_kmeans_codebooks_shape_and_training(spark):
    from yelp_streaming_etl_pipeline_spark.operators.similarity import (
        pq_kmeans_codebooks,
    )

    # 64-dim corpus; ids 0..79 -> centroid_mod=40 gives 2 coarse
    # centroids, cb_mod=20 seeds 4 codes per subspace
    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(80)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = pq_kmeans_codebooks(df).collect()
    by_code = {}
    for r in out:
        by_code.setdefault((r["m"], r["code_id"]), []).append(r)
    # every subspace present; every surviving code has all 8 dims and
    # a positive member count
    assert {m for m, _ in by_code} == set(range(8))
    for (_, _), rs in by_code.items():
        assert sorted(r["dim_j"] for r in rs) == list(range(8))
        assert all(r["n_members"] >= 1 for r in rs)
    # training MOVED the codebook off its seed: a seed code's trained
    # centroid is the mean of its members, not the seed subvector
    seeds = {
        (r["m"], r["code_id"]): r["cq"]
        for r in out
        if r["dim_j"] == 0 and r["n_members"] > 1
    }
    assert seeds, "expected at least one multi-member code"
    # deterministic across runs
    again = pq_kmeans_codebooks(df).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_kmeans_maintain_stream_equals_batch(spark):
    """The associative-state maintenance must land on the identical
    fixed point as batch Lloyd: same (vec_id, cluster_id, sq_dist)
    triples after replaying the corpus as three micro-batches."""
    from yelp_streaming_etl_pipeline_spark.operators.clustering import (
        kmeans_maintain_stream,
    )

    df = _blobs(spark)
    batch = {
        (r["vec_id"], r["cluster_id"], r["sq_dist"])
        for r in kmeans_lloyd(df, k=2, iters=2).collect()
    }
    streamed = {
        (r["vec_id"], r["cluster_id"], r["sq_dist"])
        for r in kmeans_maintain_stream(spark, df, k=2, iters=2).collect()
    }
    assert streamed == batch


def test_kmeans_maintain_stream_requires_seeds_in_first_batch(spark):
    """Seeds are pinned from the first micro-batch: with k larger
    than the first slice's id coverage the call must fail loudly
    rather than maintain state against a partial seed set."""
    import pytest

    from yelp_streaming_etl_pipeline_spark.operators.clustering import (
        kmeans_maintain_stream,
    )

    df = _blobs(spark, n_per=6)
    # foreachBatch wraps the AssertionError in a StreamingQueryException
    with pytest.raises(Exception, match="seed centroids"):
        kmeans_maintain_stream(spark, df, k=12, iters=2, n_slices=3)
