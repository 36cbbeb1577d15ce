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


def test_pagerank_weighted_unit_weights_equal_unweighted(spark):
    # w = 1 everywhere must reproduce the classic integers exactly:
    # (r * 1) div deg == r div deg term by term
    edges = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    wdf = spark.createDataFrame(
        [(s, d, 1) for s, d in edges], ["src", "dst", "w"]
    )
    plain = {
        r["node"]: r["rank_fp"] for r in pagerank(df).collect()
    }
    weighted = {
        r["node"]: r["rank_fp"]
        for r in pagerank(wdf, weight_col="w").collect()
    }
    assert plain == weighted


def test_pagerank_weighted_shifts_mass_to_heavy_edge(spark):
    # node 1 sends 3/4 of its rank to 2 and 1/4 to 3 under weights
    # (3, 1); under unit weights the split is even — 2 must outrank 3
    edges = [
        (1, 2, 3), (1, 3, 1),
        (2, 1, 1), (3, 1, 1),
    ]
    wdf = spark.createDataFrame(edges, ["src", "dst", "w"])
    ranks = {
        r["node"]: r["rank_fp"]
        for r in pagerank(wdf, weight_col="w").collect()
    }
    assert ranks[2] > ranks[3]
    # integer model: contribution of node 1 splits (r*3) div 4, (r*1) div 4
    r0 = PR_SCALE // 3
    tele = (15 * r0) // 100
    r = {1: r0, 2: r0, 3: r0}
    for _ in range(3):
        inc = {
            1: r[2] + r[3],
            2: (r[1] * 3) // 4,
            3: r[1] // 4,
        }
        r = {v: tele + (85 * inc[v]) // 100 for v in r}
    assert ranks == r


def test_pagerank_releases_all_caches(spark):
    # persist hygiene: cached tables must not scale with the
    # iteration count (superseded rank tables are unpersisted), and
    # everything the call persisted is released on return
    edges = [(i, (i + 1) % 20) for i in range(20)] + [
        ((i + 1) % 20, i) for i in range(20)
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])

    def run(iters):
        out = pagerank(df, iters=iters)
        out.collect()
        return len(spark.sparkContext._jsc.getPersistentRDDs())

    assert run(6) <= run(2) + 1  # bounded, not O(iters)


# ------------------------- triangle counts -------------------------

from yelp_streaming_etl_pipeline_spark.operators.graph import (  # noqa: E402
    bfs_levels,
    triangle_counts,
)


def _py_triangles(edges):
    es = {tuple(sorted(e)) for e in edges}
    nodes = sorted({v for e in es for v in e})
    count = {}
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) not in es:
                continue
            for c in nodes[nodes.index(b) + 1:]:
                if (a, c) in es and (b, c) in es:
                    for v in (a, b, c):
                        count[v] = count.get(v, 0) + 1
    return count


def test_triangle_counts_matches_bruteforce(spark):
    # K4 plus a pendant edge and a disconnected edge
    und = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (8, 9)]
    df = spark.createDataFrame(
        [tuple(sorted(e)) for e in und], "u long, v long"
    )
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(df).collect()
    }
    assert got == _py_triangles(und)
    # K4: every member is in C(3,2) = 3 triangles; pendant absent
    assert got[1] == 3 and 5 not in got


def test_triangle_counts_triangle_free(spark):
    # a path and a star have no triangles
    und = [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13)]
    df = spark.createDataFrame(und, "u long, v long")
    assert triangle_counts(df).count() == 0


# ------------------------- BFS levels -------------------------


def _py_bfs(edges, seeds, max_level):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    level = {s: 0 for s in seeds}
    frontier = set(seeds)
    for lvl in range(1, max_level + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, []):
                if v not in level:
                    level[v] = lvl
                    nxt.add(v)
        frontier = nxt
    return level


def test_bfs_levels_matches_sequential(spark):
    und = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (2, 6), (7, 8)]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["level"]
        for r in bfs_levels(df, seeds, max_level=3).collect()
    }
    assert got == _py_bfs(edges, [1], 3)
    # node 4 is 3 hops away (1-2-3-4); 7/8 unreachable
    assert got[4] == 3 and 7 not in got


def test_bfs_seed_outside_graph_stays_level_zero(spark):
    edges = [(1, 2), (2, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(1,), (99,)], "node long")
    got = {
        r["node"]: r["level"]
        for r in bfs_levels(df, seeds, max_level=2).collect()
    }
    # isolated seed is reported at level 0 and expands nowhere
    assert got == {1: 0, 99: 0, 2: 1}


def test_bfs_min_level_wins_on_multiple_paths(spark):
    # two routes to node 4: 1-2-4 (2 hops) and 1-3-5-4 (3 hops)
    und = [(1, 2), (2, 4), (1, 3), (3, 5), (5, 4)]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["level"]
        for r in bfs_levels(df, seeds, max_level=4).collect()
    }
    assert got[4] == 2


def test_clustering_coefficients(spark):
    from yelp_streaming_etl_pipeline_spark.operators.graph import (
        clustering_coefficients,
    )

    # K4 (cc = 1.0 each) + a path node bridging to it
    und = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(und, "u long, v long")
    got = {
        r["node"]: (r["degree"], r["n_triangles"], round(r["_cc"], 6))
        for r in clustering_coefficients(df).collect()
    }
    assert got[1] == (3, 3, 1.0)
    # node 4: degree 4, triangles 3 -> 2*3/(4*3) = 0.5
    assert got[4] == (4, 3, 0.5)
    # pendant node 5: degree 1 -> declared cc 0.0
    assert got[5] == (1, 0, 0.0)


def test_label_propagation_two_communities(spark):
    from yelp_streaming_etl_pipeline_spark.operators.graph import (
        label_propagation,
    )

    # two triangles joined by one bridge edge: LPA should keep each
    # triangle in its own community (labels 1 and 4 win by min rule)
    und = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    df = spark.createDataFrame(und, "u long, v long")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, rounds=4).collect()
    }
    assert got[1] == got[2] == got[3]
    assert got[4] == got[5] == got[6]
    assert got[1] != got[4]


def test_label_propagation_is_deterministic(spark):
    from yelp_streaming_etl_pipeline_spark.operators.graph import (
        label_propagation,
    )

    und = [(i, j) for i in range(1, 8) for j in range(i + 1, 8) if (i + j) % 3]
    df = spark.createDataFrame(und, "u long, v long")
    a = sorted(map(tuple, label_propagation(df, rounds=4).collect()))
    b = sorted(
        map(
            tuple,
            label_propagation(df.repartition(7), rounds=4).collect(),
        )
    )
    assert a == b


# ------------------------- co-supply hot-part cap -------------------------


def test_cosupply_part_cap_bounds_hot_part(spark):
    from yelp_streaming_etl_pipeline_spark.operators.graph import (
        cosupply_edges,
    )

    # one pathological part supplied by 100 suppliers + a few normal
    # parts: with part_cap=8 the hot part contributes at most 8*7
    # ordered pairs instead of 100*99 — the self-join is no longer
    # quadratic in the hot part's fan-out
    rows = [(1, s) for s in range(100)] + [
        (p, s) for p in (2, 3) for s in (0, 1, 2)
    ]
    li = spark.createDataFrame(rows, "l_partkey long, l_suppkey long")
    capped = cosupply_edges(li, k=4, part_cap=8)
    # every edge endpoint that co-occurs ONLY via the hot part must
    # come from the deterministic md5-ranked selection of 8
    import hashlib

    keep = sorted(
        range(100),
        key=lambda s: (hashlib.md5(f"1|{s}".encode()).hexdigest(), s),
    )[:8]
    hot_only = set(range(100)) - {0, 1, 2}
    for r in capped.collect():
        for node in (r["u"], r["v"]):
            if node in hot_only:
                assert node in keep


def test_cosupply_part_cap_noop_below_cap(spark):
    from yelp_streaming_etl_pipeline_spark.operators.graph import (
        cosupply_edges,
    )

    # no part exceeds the cap -> identical edges with cap on or off
    rows = [(p, s) for p in range(1, 6) for s in range(p, p + 4)]
    li = spark.createDataFrame(rows, "l_partkey long, l_suppkey long")
    with_cap = sorted(
        map(tuple, cosupply_edges(li, k=3, part_cap=8).collect())
    )
    no_cap = sorted(
        map(tuple, cosupply_edges(li, k=3, part_cap=None).collect())
    )
    assert with_cap == no_cap


def test_triangle_counts_rejects_wide_node_ids(spark):
    import pytest
    from pyspark.sql.utils import PythonException

    from yelp_streaming_etl_pipeline_spark.operators.graph import (
        triangle_counts,
    )

    wide = 1 << 33
    df = spark.createDataFrame(
        [(wide, wide + 1), (wide, wide + 2), (wide + 1, wide + 2)],
        "u long, v long",
    )
    with pytest.raises(Exception, match="2\\^32|assert"):
        triangle_counts(df).collect()


def test_kcore_peels_to_fixpoint(spark):
    from yelp_streaming_etl_pipeline_spark.operators.graph import (
        kcore_nodes,
    )

    # triangle {1,2,3} + pendant chain 3-4-5: the 2-core is exactly
    # the triangle (4 and 5 peel off over TWO rounds - chain depth
    # exercises the iteration)
    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {
        r["node"]: r["core_degree"]
        for r in kcore_nodes(df, k=2, rounds=4).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_raises_when_rounds_too_small(spark):
    import pytest

    from yelp_streaming_etl_pipeline_spark.operators.graph import (
        kcore_nodes,
    )

    # a long pendant chain off a triangle needs ~chain-length rounds;
    # rounds=1 cannot converge and must raise, not return a non-core
    chain = [(i, i + 1) for i in range(3, 10)]
    edges = [(1, 2), (1, 3), (2, 3)] + chain
    df = spark.createDataFrame(edges, "u long, v long")
    with pytest.raises(Exception, match="converged|assert"):
        kcore_nodes(df, k=2, rounds=1).collect()


def test_kcore_empty_core_is_valid(spark):
    from yelp_streaming_etl_pipeline_spark.operators.graph import (
        kcore_nodes,
    )

    # a path graph has no 2-core: peeling must reach the empty
    # fixpoint without tripping the convergence assert
    edges = [(1, 2), (2, 3), (3, 4)]
    df = spark.createDataFrame(edges, "u long, v long")
    assert kcore_nodes(df, k=2, rounds=4).count() == 0


def test_kcore_maintain_stream_matches_batch_and_grows(spark):
    from yelp_streaming_etl_pipeline_spark.operators.graph import (
        kcore_maintain_stream, kcore_nodes,
    )

    # two triangles bridged by a chain; edges arrive in 3 micro-
    # batches (ntile over (u,v)) — the final maintained core must
    # equal the batch 2-core over ALL edges, and every intermediate
    # epoch's monotonicity assert must hold (insert-only growth)
    edges = [
        (1, 2), (1, 3), (2, 3),          # triangle A
        (3, 4), (4, 5),                  # pendant chain (peels off)
        (6, 7), (6, 8), (7, 8),          # triangle B
    ]
    df = spark.createDataFrame(edges, "u long, v long")
    got = kcore_maintain_stream(spark, df, k=2, rounds=6, n_slices=3)
    batch = kcore_nodes(df, k=2, rounds=6)
    g = {(r["node"], r["core_degree"]) for r in got.collect()}
    b = {(r["node"], r["core_degree"]) for r in batch.collect()}
    assert g == b
    assert {n for n, _ in g} == {1, 2, 3, 6, 7, 8}


def test_lpa_maintain_stream_matches_batch(spark):
    from yelp_streaming_etl_pipeline_spark.operators.graph import (
        label_propagation, lpa_maintain_stream,
    )

    # two cliques joined by one bridge: LPA should find two
    # communities; streamed maintenance must equal the batch result
    edges = [
        (1, 2), (1, 3), (2, 3),
        (4, 5), (4, 6), (5, 6),
        (3, 4),
    ]
    df = spark.createDataFrame(edges, "u long, v long")
    got = lpa_maintain_stream(spark, df, rounds=4, n_slices=3)
    batch = label_propagation(df, rounds=4)
    g = sorted((r["node"], r["label"]) for r in got.collect())
    b = sorted((r["node"], r["label"]) for r in batch.collect())
    assert g == b
    assert len(g) == 6


def test_pagerank_maintain_stream_matches_batch(spark):
    from yelp_streaming_etl_pipeline_spark.operators.graph import (
        _symmetrize, pagerank, pagerank_maintain_stream,
    )

    # hub + leaf pairs arriving in 3 micro-batches: the maintained
    # final epoch must equal batch pagerank over the symmetrized
    # union, and every epoch's totality/mass invariants must hold
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (4, 5), (5, 6), (2, 6)]
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank_maintain_stream(spark, df, n_slices=3).collect()
    }
    batch = {
        r["node"]: r["rank_fp"]
        for r in pagerank(_symmetrize(df)).collect()
    }
    assert got == batch
    assert got[1] > got[3]  # the hub outranks a degree-2 node


def test_pagerank_weighted_maintain_stream_matches_batch(spark):
    from yelp_streaming_etl_pipeline_spark.operators.graph import (
        pagerank, pagerank_weighted_maintain_stream, _symmetrize_w,
    )
    from pyspark.sql import functions as F

    # occurrences WITH duplicates: (1,2) x3 across different batches —
    # the multiplicity merge must accumulate weight across epochs and
    # the final epoch must equal batch weighted pagerank
    occ = [(1, 2), (1, 2), (1, 2), (1, 3), (2, 3), (3, 4), (2, 4), (1, 4)]
    df = spark.createDataFrame(occ, "a long, b long")
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank_weighted_maintain_stream(
            spark, df, n_slices=3
        ).collect()
    }
    counts = df.groupBy("a", "b").agg(F.count("*").cast("long").alias("w"))
    batch = {
        r["node"]: r["rank_fp"]
        for r in pagerank(_symmetrize_w(counts), weight_col="w").collect()
    }
    assert got == batch
    assert len(got) == 4


def test_personalized_pagerank_maintain_stream_matches_batch(spark):
    from yelp_streaming_etl_pipeline_spark.operators.graph import (
        _symmetrize, pagerank, personalized_pagerank_maintain_stream,
    )

    # seed node 90 appears only in the LAST slice (pairs sorted by
    # (a,b)) — earlier epochs must emit the declared empty table and
    # the final epoch must equal batch personalized pagerank
    pairs = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (90, 1), (90, 5)]
    df = spark.createDataFrame(pairs, "a long, b long")
    seeds = spark.createDataFrame([(90,)], "node long")
    got = {
        r["node"]: r["rank_fp"]
        for r in personalized_pagerank_maintain_stream(
            spark, df, seeds, n_slices=3
        ).collect()
    }
    batch = {
        r["node"]: r["rank_fp"]
        for r in pagerank(_symmetrize(df), seeds=seeds).collect()
    }
    assert got == batch
    # mass reaches the whole component from the seed; the seed itself
    # retains its teleport share
    assert got[90] > 0 and all(v > 0 for v in got.values())


def test_personalized_pagerank_maintain_stream_seedless_is_empty(spark):
    from yelp_streaming_etl_pipeline_spark.operators.graph import (
        personalized_pagerank_maintain_stream,
    )

    # a seed that never joins the graph: every epoch (including the
    # final) emits the declared empty rank table
    df = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    seeds = spark.createDataFrame([(999,)], "node long")
    out = personalized_pagerank_maintain_stream(
        spark, df, seeds, n_slices=2
    )
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["node", "rank_fp"]
