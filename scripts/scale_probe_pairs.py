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


PROBES = [
    ("simhash_pairs", REP_DOCS),
    ("neardup_minhash", REP_DOCS),
    ("dedup_clusters", REP_DOCS),
    ("repetition_profile", REP_DOCS),
    ("duplicated_passages", REP_DOCS),
    ("pagerank_nodes", REP_FACT),
]


def main() -> None:
    import __spark_entry__ as E

    spark = get_spark("scale_probe_pairs")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out = tempfile.mkdtemp(prefix="scalepairs_")
    replicate(spark, out)
    qs = E.queries()
    results = {}
    for name, factor in PROBES:
        fn = qs[name]
        times, rows = {}, {}
        for label, d in (("base", SF), ("big", out)):
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
    print(json.dumps({"metric": "scale_probe_pairs", "probes": results}))


if __name__ == "__main__":
    main()
