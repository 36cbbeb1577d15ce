"""Fixed-point PageRank (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelp_streaming_etl_pipeline_spark.operators.graph import (
    PR_SCALE,
    bipartite_edges,
    pagerank,
)


def _py_pagerank(edges, iters=3):
    """Sequential integer-math model of the declared semantics."""
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    n = len(deg)
    r = {v: PR_SCALE // n for v in deg}
    tele = (15 * (PR_SCALE // n)) // 100
    for _ in range(iters):
        inc = {v: 0 for v in deg}
        for s, d in edges:
            inc[d] = inc.get(d, 0) + r[s] // deg[s]
        r = {v: tele + (85 * inc[v]) // 100 for v in deg}
    return r


def _run(spark, edges, iters=3):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        row["node"]: row["rank_fp"]
        for row in pagerank(df, iters=iters).collect()
    }
    return got


def test_pagerank_matches_sequential_model(spark):
    # small undirected (symmetrized) graph with a hub
    und = [(1, 2), (1, 3), (1, 4), (2, 3), (4, 5)]
    edges = und + [(b, a) for a, b in und]
    got = _run(spark, edges)
    want = _py_pagerank(edges)
    assert got == want
    # the hub (node 1, degree 3) outranks the leaf (node 5, degree 1)
    assert got[1] > got[5]


def test_pagerank_ring_is_uniform(spark):
    # directed ring: stationary distribution is exactly uniform, and
    # the integer recurrence keeps every node identical each step
    n = 7
    edges = [(i, (i + 1) % n) for i in range(n)]
    got = _run(spark, edges)
    assert len(set(got.values())) == 1


def test_pagerank_mass_bounded(spark):
    # truncating division only ever loses sub-unit mass: total stays
    # within N*(iters+1) units below SCALE and never exceeds it
    und = [(i, i + 1) for i in range(1, 20)]
    edges = und + [(b, a) for a, b in und]
    got = _run(spark, edges)
    total = sum(got.values())
    n = len(got)
    assert total <= PR_SCALE
    assert total >= PR_SCALE - n * 4 * 100  # generous slack, still tight


def test_bipartite_edges_symmetric(spark):
    orders = spark.createDataFrame(
        [(1, 10), (2, 11)], "o_orderkey long, o_custkey long"
    )
    lineitem = spark.createDataFrame(
        [(1, 5), (1, 6), (2, 5)], "l_orderkey long, l_suppkey long"
    )
    edges = bipartite_edges(orders, lineitem)
    fwd = edges.filter(F.col("src") % 2 == 0).count()
    rev = edges.filter(F.col("src") % 2 == 1).count()
    assert fwd == rev == 3  # (10,5),(10,6),(11,5) each both ways
    # partition-order independence of the whole operator
    a = {r["node"]: r["rank_fp"] for r in pagerank(edges).collect()}
    b = {
        r["node"]: r["rank_fp"]
        for r in pagerank(edges.repartition(7)).collect()
    }
    assert a == b


def test_personalized_pagerank_concentrates_on_seeds(spark):
    from yelp_streaming_etl_pipeline_spark.operators.graph import (
        PR_SCALE,
        pagerank,
    )

    # star: hub 0 connected to leaves 2..20 (even nodes), seed = {2}
    und = [(0, k) for k in range(2, 21, 2)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    seeds = spark.createDataFrame([(2,)], "node long")
    got = {r["node"]: r["rank_fp"]
           for r in pagerank(edges, seeds=seeds).collect()}
    # all mass originates at the seed: seed outranks the other leaves
    others = [got[k] for k in range(4, 21, 2)]
    assert got[2] > max(others)
    # non-seed leaves are symmetric -> identical ranks
    assert len(set(others)) == 1
    # global variant == personalized with all nodes seeded
    all_nodes = edges.select(F.col("src").alias("node")).distinct()
    g = {r["node"]: r["rank_fp"] for r in pagerank(edges).collect()}
    p = {r["node"]: r["rank_fp"]
         for r in pagerank(edges, seeds=all_nodes).collect()}
    assert g == p
    assert sum(got.values()) <= PR_SCALE


def test_empty_inputs_yield_empty_outputs(spark):
    from yelp_streaming_etl_pipeline_spark.operators.timeseries import (
        ewma_by_key,
        zscore_anomalies,
    )
    from yelp_streaming_etl_pipeline_spark.operators.tokenizer import (
        bpe_train,
    )

    edges = spark.createDataFrame([], "src long, dst long")
    assert pagerank(edges).count() == 0
    ev = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )
    assert zscore_anomalies(ev).count() == 0
    assert ewma_by_key(ev).count() == 0
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert bpe_train(docs).count() == 0
