"""Z-order layout audit: files written in Morton-key order must have
small per-file spans in BOTH dimensions, where a single-column sort
leaves the second dimension unclustered. This is the local proxy for
row-group pruning on two-predicate scans at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelp_streaming_etl_pipeline_spark.functions import zorder as Z

N_FILES = 16
SIDE = 64  # points on a SIDE x SIDE grid


def _grid(spark):
    # uniform 2-d grid: x and y are independent, the adversarial case
    # for single-column sorting
    return (
        spark.range(SIDE * SIDE)
        .select(
            (F.col("id") % SIDE).alias("x"),
            (F.col("id") / SIDE).cast("long").alias("y"),
        )
    )


def _mean_file_spans(df, tmp_path, sort_key, name):
    out = f"{tmp_path}/{name}"
    (
        df.repartitionByRange(N_FILES, sort_key)
        .sortWithinPartitions(sort_key)
        .write.mode("overwrite")
        .parquet(out)
    )
    spark = df.sparkSession
    spans = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .agg(F.avg("sx").alias("mx"), F.avg("sy").alias("my"))
        .collect()[0]
    )
    return spans["mx"], spans["my"]


def test_zorder_clusters_both_dimensions(spark, tmp_path):
    df = _grid(spark)
    zkey = Z.interleave_bits(
        Z.bucketize(F.col("x"), 0, SIDE, 6),
        Z.bucketize(F.col("y"), 0, SIDE, 6),
        6,
    )
    zx, zy = _mean_file_spans(df, tmp_path, zkey, "zorder")
    sx, sy = _mean_file_spans(df, tmp_path, F.col("x"), "xsort")

    # x-sort: x clusters tightly but y spans the whole range
    assert sx < SIDE / 4
    assert sy > SIDE * 0.9
    # z-order: BOTH dimensions cluster well below the global span
    assert zx < SIDE / 2, (zx, zy)
    assert zy < SIDE / 2, (zx, zy)
    # and the worst z-order dimension beats the x-sort's worst (y)
    assert max(zx, zy) < sy / 2


def test_interleave_bits_orders_like_morton(spark):
    rows = spark.createDataFrame(
        [(a, b) for a in range(8) for b in range(8)], ["a", "b"]
    ).select(
        "a", "b", Z.interleave_bits(F.col("a"), F.col("b"), 3).alias("z")
    )
    got = {(r["a"], r["b"]): r["z"] for r in rows.collect()}

    def morton(a, b):
        z = 0
        for i in range(3):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    for (a, b), z in got.items():
        assert z == morton(a, b), (a, b, z)
    # bijective on the grid
    assert len(set(got.values())) == 64
