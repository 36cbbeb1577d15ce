"""Scaling probe, part 2: the quadratic-RISK operators.

Part 1 (scale_probe.py) covers map/aggregate families. This probe
targets the operators where superlinearity could actually hide —
banded similarity self-joins, connected components, the n-gram
repetition shuffle, and PageRank's edge build + iterations.

Replication detail that matters: duplicating documents verbatim
would make every replica a TRUE near-duplicate of its original, so
the output pair count itself grows quadratically in the replication
factor — that's output growth, not operator superlinearity. Instead
each replica's text goes through a distinct letter-rotation
(translate over 10 consonants), so replicas are NOT near-dups of
each other and the true pair structure is exactly 10 disjoint copies
of the original's: output rows scale linearly, and the time ratio
isolates the operator's own behavior. PageRank replicates
orders+lineitem 5x with shifted order keys over the SAME
customer/supplier population (denser graph, same node count).

Usage: python scripts/scale_probe_pairs.py  (one JSON line)
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
REP_DOCS = 10
REP_FACT = 5

CONS = "bcdfghjklm"


def _rot(s: str, r: int) -> str:
    return s[r:] + s[:r]


def replicate(spark, out: str) -> None:
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_d = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for r in range(REP_DOCS):
        parts.append(
            docs.select(
                (F.col("doc_id") + r * n_d).alias("doc_id"),
                F.translate("text", CONS, _rot(CONS, r)).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionAll(p)
    big.write.mode("overwrite").parquet(f"{out}/documents.parquet")

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    n_o = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    reps = spark.range(REP_FACT).select(F.col("id").alias("_r"))
    (
        orders.crossJoin(reps)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("_r") * n_o)
        .drop("_r")
        .write.mode("overwrite")
        .parquet(f"{out}/orders.parquet")
    )
    (
        li.crossJoin(reps)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("_r") * n_o)
        .drop("_r")
        .write.mode("overwrite")
        .parquet(f"{out}/lineitem.parquet")
    )
    for t in ("region", "nation", "customer", "supplier", "part",
              "events", "embeddings"):
        shutil.copy(f"{SF}/{t}.parquet", f"{out}/{t}.parquet")


def replicate_graph(spark, out: str) -> None:
    """Graph probe dir: REP_FACT DISJOINT copies of the interaction
    graph (every key space shifted per replica — orderkeys alone
    would leave the distinct (cust,supp)/(part,supp) pair sets
    unchanged and the probe would measure nothing). Linear structure:
    big graph = factor x disjoint copies of the base graph."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    n_o = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    n_c = cust.agg(F.max("c_custkey")).collect()[0][0] + 1
    n_s = li.agg(F.max("l_suppkey")).collect()[0][0] + 1
    n_p = li.agg(F.max("l_partkey")).collect()[0][0] + 1
    reps = spark.range(REP_FACT).select(F.col("id").alias("_r"))
    (
        cust.crossJoin(reps)
        .withColumn("c_custkey", F.col("c_custkey") + F.col("_r") * n_c)
        .drop("_r")
        .write.mode("overwrite")
        .parquet(f"{out}/customer.parquet")
    )
    (
        orders.crossJoin(reps)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("_r") * n_o)
        .withColumn("o_custkey", F.col("o_custkey") + F.col("_r") * n_c)
        .drop("_r")
        .write.mode("overwrite")
        .parquet(f"{out}/orders.parquet")
    )
    (
        li.crossJoin(reps)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("_r") * n_o)
        .withColumn("l_suppkey", F.col("l_suppkey") + F.col("_r") * n_s)
        .withColumn("l_partkey", F.col("l_partkey") + F.col("_r") * n_p)
        .drop("_r")
        .write.mode("overwrite")
        .parquet(f"{out}/lineitem.parquet")
    )
    for t in ("region", "nation", "supplier", "part", "events",
              "embeddings", "documents"):
        shutil.copy(f"{SF}/{t}.parquet", f"{out}/{t}.parquet")


PROBES = [
    ("simhash_pairs", REP_DOCS, "docs"),
    ("neardup_minhash", REP_DOCS, "docs"),
    ("dedup_clusters", REP_DOCS, "docs"),
    ("repetition_profile", REP_DOCS, "docs"),
    ("duplicated_passages", REP_DOCS, "docs"),
    ("pagerank_nodes", REP_FACT, "docs"),
    ("winnowing_fingerprints", REP_DOCS, "docs"),
    ("winnow_neardup", REP_DOCS, "docs"),
    ("cosupply_triangles", REP_FACT, "graph"),
    ("bfs_levels", REP_FACT, "graph"),
]


def main() -> None:
    import __spark_entry__ as E

    spark = get_spark("scale_probe_pairs")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out = tempfile.mkdtemp(prefix="scalepairs_")
    replicate(spark, out)
    out_g = tempfile.mkdtemp(prefix="scalegraph_")
    replicate_graph(spark, out_g)
    qs = E.queries()
    results = {}
    for name, factor, dir_key in PROBES:
        fn = qs[name]
        big_dir = out if dir_key == "docs" else out_g
        times, rows = {}, {}
        for label, d in (("base", SF), ("big", big_dir)):
            best = float("inf")
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            times[label] = best
            rows[label] = fn(spark, d).count()
        ratio = times["big"] / times["base"]
        results[name] = {
            "base_s": round(times["base"], 3),
            "big_s": round(times["big"], 3),
            "base_rows": rows["base"],
            "big_rows": rows["big"],
            "factor": factor,
            "time_ratio": round(ratio, 2),
            "linear_ok": ratio <= factor * 1.5,
        }
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(out_g, ignore_errors=True)
    print(json.dumps({"metric": "scale_probe_pairs", "probes": results}))


if __name__ == "__main__":
    main()
