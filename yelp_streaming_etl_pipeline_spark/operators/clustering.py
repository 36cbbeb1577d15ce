"""Distributed k-means (Lloyd's algorithm) over embedding columns.

The iterative-ML shape on DataFrames: each iteration is
(1) assignment — every vector scored against the broadcast centroid
set, argmin via a partial aggregate (NOT a window: the aggregate
collapses the n x k cross product map-side before the exchange);
(2) update — per-(cluster, dimension) means via one posexplode +
hash aggregate, rebuilt into centroid arrays. The loop composes
lazily: no driver-side collect anywhere, the final plan is
``iters`` chained broadcast-join/aggregate stages (Spark MLlib
collects centers to the driver per iteration; we keep them
distributed and the broadcast does the same job).

EXACTNESS ACROSS ENGINES — the interesting part. Float means are
order-dependent (partial aggregation sums in partition-scheduling
order), which would make cluster assignments flap between runs and
engines. So the whole algorithm runs in QUANTIZED INTEGER space:

- each component is quantized once on input:
  ``floor(x * 10^qs + 0.5) + OFFSET`` as a 64-bit integer (OFFSET
  shifts everything positive, so the only cross-engine division
  below is on non-negative operands where Spark's truncating ``div``
  and DuckDB's flooring ``//`` agree);
- squared-euclidean distances are exact integer folds, and the
  OFFSET cancels in every difference, so it never needs removing;
- the centroid update is integer round-half-up WITHOUT floats:
  ``(2 * sum + n) div (2 * n)``, exact at any scale (a 100 TB
  cluster sum of 2e9-magnitude components stays under 2^63 up to
  ~4e9 members; past that the hi/lo two-long split of
  functions/rounding.py applies unchanged).

Ties (equal integer distances) break toward the lower centroid id —
pinned identically in the Spark ``min_by`` struct and the oracle's
``row_number`` ORDER BY. A centroid that captures no members drops
out (its group never materializes) — declared semantics.

Centroid seeding is the deterministic ``vec_id < k`` subsample to
keep the operator oracle-checkable end-to-end; swap k-means++ at
production scale without changing the iteration shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KMEANS_K = 8
KMEANS_ITERS = 2
KMEANS_QS = 6  # 1e-6 component resolution
KMEANS_OFFSET = 10**9


def quantize_vec(vec: Column, qs: int = KMEANS_QS) -> Column:
    """array<float> -> array<long>: stable per-component quantization
    shifted non-negative (see module docstring)."""
    m = F.lit(float(10**qs))
    return F.transform(
        vec,
        lambda x: F.floor(x.cast("double") * m + F.lit(0.5)).cast("long")
        + F.lit(KMEANS_OFFSET),
    )


def _sq_dist(a: Column, b: Column) -> Column:
    """Exact integer squared-euclidean distance between long arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _assign(base: DataFrame, cent: DataFrame) -> DataFrame:
    """(vid, qvec) x broadcast(cid, cvec) -> nearest centroid per vid
    via argmin partial aggregate; ties to the lower cid."""
    scored = base.crossJoin(F.broadcast(cent)).withColumn(
        "dist", _sq_dist(F.col("qvec"), F.col("cvec"))
    )
    best = F.min(F.struct(F.col("dist"), F.col("cid"))).alias("best")
    return (
        scored.groupBy("vid")
        .agg(best, F.first("qvec").alias("qvec"))
        .select(
            "vid",
            "qvec",
            F.col("best.cid").alias("cid"),
            F.col("best.dist").alias("dist"),
        )
    )


def _update(assigned: DataFrame) -> DataFrame:
    """Per-(cluster, dim) integer round-half-up mean -> new centroid
    arrays. One explode + one hash aggregate + one rebuild."""
    dims = assigned.select(
        "cid", F.posexplode(F.col("qvec")).alias("j", "q")
    )
    per_dim = (
        dims.groupBy("cid", "j")
        .agg(F.sum("q").alias("s"), F.count("*").alias("n"))
        .withColumn("cq", F.expr("(2 * s + n) div (2 * n)"))
    )
    return (
        per_dim.groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("j"), F.col("cq")))
                ),
                lambda x: x.getField("cq"),
            ).alias("cvec")
        )
    )


def kmeans_lloyd(
    embeddings: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``iters`` Lloyd iterations; returns the final assignment
    (vec_id, cluster_id, sq_dist) with sq_dist in exact quantized
    units (BIGINT)."""
    base = embeddings.select(
        F.col(id_col).alias("vid"),
        quantize_vec(F.col(vec_col)).alias("qvec"),
    )
    cent = base.filter(F.col("vid") < k).select(
        F.col("vid").alias("cid"), F.col("qvec").alias("cvec")
    )
    for _ in range(iters):
        cent = _update(_assign(base, cent))
    final = _assign(base, cent)
    return final.select(
        F.col("vid").alias("vec_id"),
        F.col("cid").alias("cluster_id"),
        F.col("dist").alias("sq_dist"),
    )
