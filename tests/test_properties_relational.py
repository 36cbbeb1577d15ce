"""Property-based tests: the as-of join, range join, clustering,
compaction, and split operators vs brute-force pure-Python models on
randomized keyed histories. Few examples per property (each example
runs Spark jobs), but each example covers many rows/keys at once."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from yelp_streaming_etl_pipeline_spark.operators import cdc as CDC
from yelp_streaming_etl_pipeline_spark.operators import dedup as DD
from yelp_streaming_etl_pipeline_spark.operators import relational as REL
from yelp_streaming_etl_pipeline_spark.operators import sampling as SAMP

# (event_id is assigned by enumeration; draw keys and minute offsets)
HISTORIES = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 120)),
    min_size=1,
    max_size=40,
)


def _frame(spark, rows):
    data = [
        (i, k, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m))
        for i, (k, m) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp"
    )


@settings(max_examples=8, deadline=None)
@given(left=HISTORIES, right=HISTORIES)
def test_asof_join_matches_bruteforce(spark, left, right):
    # right side must be unique per (key, ts): keep max event_id
    rdata = {}
    for i, (k, m) in enumerate(right):
        rid = len(left) + i
        cur = rdata.get((k, m))
        if cur is None or rid > cur:
            rdata[(k, m)] = rid
    ldf = _frame(spark, left)
    rdf = spark.createDataFrame(
        [
            (rid, k, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m))
            for (k, m), rid in rdata.items()
        ],
        "event_id long, user_id long, ts timestamp",
    )
    out = REL.asof_join(
        ldf, rdf.select("user_id", "ts", "event_id"), "user_id",
        right_cols=("event_id",),
    ).collect()
    assert len(out) == len(left)
    for r in out:
        k, lt = r["user_id"], r["ts"]
        matches = [
            ((m, rid))
            for (rk, m), rid in rdata.items()
            if rk == k
            and dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m) <= lt
        ]
        if not matches:
            assert r["prior_event_id"] is None
        else:
            best_m, best_id = max(matches)
            assert r["prior_event_id"] == best_id, (r, matches)


@settings(max_examples=8, deadline=None)
@given(rows=HISTORIES, gap=st.sampled_from([60, 300, 900]))
def test_interval_pairs_matches_bruteforce(spark, rows, gap):
    df = _frame(spark, rows)
    out = REL.interval_pairs(df, df, "user_id", gap)
    got = {
        (r["l_event_id"], r["r_event_id"]): r["gap_us"] for r in out.collect()
    }
    expected = {}
    for i, (ki, mi) in enumerate(rows):
        for j, (kj, mj) in enumerate(rows):
            d = (mj - mi) * 60
            if ki == kj and 0 < d <= gap:
                expected[(i, j)] = d * 1_000_000
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=25,
    )
)
def test_dedup_clusters_matches_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in DD.dedup_clusters(pairs).collect()
    }
    # union-find model
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(rows=HISTORIES)
def test_compact_latest_matches_max(spark, rows):
    df = _frame(spark, rows)
    got = {
        r["user_id"]: r["event_id"]
        for r in CDC.compact_latest(
            df, ["user_id"], ["ts", "event_id"]
        ).collect()
    }
    expected = {}
    for i, (k, m) in enumerate(rows):
        cur = expected.get(k)
        if cur is None or (m, i) > cur:
            expected[k] = (m, i)
    assert got == {k: v[1] for k, v in expected.items()}


@settings(max_examples=6, deadline=None)
@given(n=st.integers(1, 300))
def test_split_partition_property(spark, n):
    # every row gets exactly one split; the assignment is a pure
    # function of the id (stable across calls and data sizes)
    df = spark.range(n).select(F.col("id").alias("doc_id"))
    out = SAMP.train_test_split(
        df, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1}
    )
    rows = out.collect()
    assert len(rows) == n
    assert all(r["split"] in ("train", "valid", "test") for r in rows)
    again = {
        r["doc_id"]: r["split"]
        for r in SAMP.train_test_split(
            spark.range(2 * n).select(F.col("id").alias("doc_id")),
            "doc_id",
            {"train": 0.8, "valid": 0.1, "test": 0.1},
        ).collect()
    }
    for r in rows:
        assert again[r["doc_id"]] == r["split"]
