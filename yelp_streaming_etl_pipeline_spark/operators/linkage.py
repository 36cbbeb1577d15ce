"""Record linkage / entity resolution (north-star extension).

The classic match pipeline a large-scale data-integration or
training-data attribution job needs, expressed Spark-first:

  1. NAME DICTIONARY — matching runs over DISTINCT names, not rows:
     at 100 TB the row table is billions but the name dictionary is
     millions, so the quadratic-ish pair stage touches the small
     table and rows rejoin by equality at the end.
  2. MULTI-PASS BLOCKING — candidate pairs come only from names
     sharing a block key; two passes (2-char prefix, 2-char suffix)
     union'd, so a corruption at either end of the string still
     lands the true pair in >= 1 block (single-pass blocking loses
     exactly the edits that touch its key).
  3. BOUNDED PAIR MATCH — levenshtein(a, b) <= max_dist inside each
     block; edit distance is exact integer arithmetic in every
     engine, so the match set is oracle-checkable.
  4. TRANSITIVE CLUSTERING — connected components (pointer-halving
     min-label propagation, operators/dedup.py:dedup_clusters) over
     the name-pair graph; every row inherits its name's cluster.

The reference has no linkage surface (hwong511/yelp-streaming-etl-
pipeline quality_engine.py stops at per-record checks); this module
is part of the Phase-2 LLM-pipeline library, with the synthetic
person corpus standing in for the people/merchant dimension a real
deployment would link.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_clusters

NAME_FIRST = [
    "maria", "john", "wei", "fatima", "ivan", "aisha",
    "carlos", "yuki", "lena", "omar", "priya", "sven",
]
NAME_LAST = [
    "garcia", "smith", "chen", "hassan", "petrov", "okafor",
    "silva", "tanaka", "muller", "ali", "patel", "larsen",
]
VARIANT_EVERY = 7          # every 7th person gets a corrupted twin
VARIANT_ID_OFFSET = 10_000_000
LEV_MAX_DIST = 2


def synthetic_people(customer: DataFrame) -> DataFrame:
    """Deterministic person dimension derived from the customer
    table: ``name = FIRST[id % 12] + ' ' + LAST[(id // 12) % 12]``.
    144 distinct names over the key space — name collisions across
    different customers are intentional (they model exact-duplicate
    mentions of one entity)."""
    cid = F.col("c_custkey").cast("long")
    first = F.array(*[F.lit(x) for x in NAME_FIRST])
    last = F.array(*[F.lit(x) for x in NAME_LAST])
    return customer.select(
        cid.alias("person_id"),
        F.concat(
            F.element_at(first, (cid % 12 + 1).cast("int")),
            F.lit(" "),
            F.element_at(
                last, (F.floor(cid / 12).cast("long") % 12 + 1).cast("int")
            ),
        ).alias("name"),
    )


def with_name_variants(
    people: DataFrame, every: int = VARIANT_EVERY
) -> DataFrame:
    """Plant deterministic corrupted twins: every ``every``-th person
    re-appears under ``person_id + VARIANT_ID_OFFSET`` with ONE
    character dropped at position ``1 + id % length`` (1-based) — a
    typo anywhere in the string, including both blocking-key
    regions, so the match stage's multi-pass recall is exercised."""
    base = people.filter(F.col("person_id") % every == 0)
    p = (F.lit(1) + F.col("person_id") % F.length("name")).cast("int")
    corrupted = F.concat(
        F.expr("substring(name, 1, p - 1)"),
        F.expr("substring(name, p + 1, length(name))"),
    )
    variants = base.withColumn("p", p).select(
        (F.col("person_id") + VARIANT_ID_OFFSET).alias("person_id"),
        corrupted.alias("name"),
    )
    return people.unionByName(variants)


def _block_keys(name: Column) -> Column:
    """Two blocking passes as an array of keys: 2-char prefix and
    2-char suffix (tagged so a prefix key never equi-joins a suffix
    key)."""
    return F.array(
        F.concat(F.lit("p:"), F.substring(name, 1, 2)),
        F.concat(F.lit("s:"), F.substring(name, -2, 2)),
    )


def blocked_match_pairs(
    people: DataFrame, max_dist: int = LEV_MAX_DIST
) -> DataFrame:
    """Candidate generation + match over the DISTINCT-name
    dictionary. Returns ``(nid_a, nid_b, name_a, name_b, dist)``
    with ``nid_a < nid_b`` where nid is the minimum person_id
    carrying that name (the name's stable representative).

    Scale: pair generation is per-block quadratic over the name
    DICTIONARY (millions, not billions); levenshtein runs once per
    candidate pair, JVM-side. Hot blocks would get the same cap/
    sub-band discipline as the LSH dedup path (dedup.py:315) — at
    the 144-name synthetic dictionary every block is tiny."""
    names = (
        people.groupBy("name")
        .agg(F.min("person_id").alias("nid"))
        .withColumn("bk", F.explode(_block_keys(F.col("name"))))
    )
    a = names.select(
        F.col("bk"), F.col("nid").alias("nid_a"), F.col("name").alias("name_a")
    )
    b = names.select(
        F.col("bk"), F.col("nid").alias("nid_b"), F.col("name").alias("name_b")
    )
    return (
        a.join(b, "bk")
        .filter(F.col("nid_a") < F.col("nid_b"))
        .withColumn("dist", F.levenshtein(F.col("name_a"), F.col("name_b")))
        .filter(F.col("dist") <= max_dist)
        .select("nid_a", "nid_b", "name_a", "name_b", "dist")
        .distinct()
    )


def entity_clusters(
    people: DataFrame, max_dist: int = LEV_MAX_DIST
) -> DataFrame:
    """Full linkage: every row gets its entity cluster id (the
    minimum person_id reachable through the name-match graph;
    unmatched names are their own singleton cluster). Returns
    ``(person_id, name, cluster_id)``."""
    pairs = blocked_match_pairs(people, max_dist)
    clusters = dedup_clusters(pairs, a_col="nid_a", b_col="nid_b")
    name_rep = people.groupBy("name").agg(F.min("person_id").alias("nid"))
    name_cluster = name_rep.join(
        clusters.withColumnRenamed("doc_id", "nid"), "nid", "left"
    ).select(
        "name",
        F.coalesce(F.col("cluster_id"), F.col("nid")).alias("cluster_id"),
    )
    return people.join(name_cluster, "name").select(
        "person_id", "name", "cluster_id"
    )
