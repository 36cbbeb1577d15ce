"""Property tests (hypothesis): round-3 iterative/sequential
operators vs independent pure-Python models — fixed-point PageRank
(global + personalized), per-key EWMA fold order, and BPE merge
learning with greedy application."""

from __future__ import annotations

import datetime as dt
from collections import Counter

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F  # noqa: F401

from yelp_streaming_etl_pipeline_spark.operators.graph import (
    PR_SCALE,
    pagerank,
)
from yelp_streaming_etl_pipeline_spark.operators.timeseries import (
    EWMA_ALPHA,
    ewma_by_key,
)
from yelp_streaming_etl_pipeline_spark.operators.tokenizer import (
    bpe_train,
)

# small random undirected graphs: edge list over nodes 0..9
UND_EDGES = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=1,
    max_size=18,
    unique=True,
)


def _py_pagerank(edges, seeds=None, iters=3):
    deg: Counter = Counter(s for s, _ in edges)
    nodes = set(deg)
    sset = nodes if seeds is None else (set(seeds) & nodes)
    n = len(sset)
    r = {v: (PR_SCALE // n if v in sset else 0) for v in nodes}
    tele = {
        v: ((15 * (PR_SCALE // n)) // 100 if v in sset else 0)
        for v in nodes
    }
    for _ in range(iters):
        inc = {v: 0 for v in nodes}
        for s, d in edges:
            inc[d] += r[s] // deg[s]
        r = {v: tele[v] + (85 * inc[v]) // 100 for v in nodes}
    return r


@settings(max_examples=6, deadline=None)
@given(und=UND_EDGES, seed_bits=st.integers(1, 1023))
def test_pagerank_personalized_matches_model(spark, und, seed_bits):
    edges = list({e for ab in und for e in (ab, ab[::-1])})
    seeds = [v for v in range(10) if seed_bits >> v & 1]
    df = spark.createDataFrame(edges, "src long, dst long")
    nodes = {s for s, _ in edges}
    if not (set(seeds) & nodes):
        seeds = [next(iter(nodes))]
    sdf = spark.createDataFrame([(s,) for s in seeds], "node long")
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank(df, seeds=sdf).collect()
    }
    assert got == _py_pagerank(edges, seeds=seeds)


SERIES = st.lists(
    st.tuples(
        st.integers(0, 2),  # key
        st.integers(0, 120),  # minute offset
        st.floats(0, 100, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=8, deadline=None)
@given(rows=SERIES)
def test_ewma_matches_model(spark, rows):
    data = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), k,
         "click", float(v))
        for i, (k, m, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )
    got = {r["key"]: r["ewma"] for r in ewma_by_key(df).collect()}
    per_key: dict[int, list] = {}
    for eid, ts, k, _, v in data:
        per_key.setdefault(k, []).append((ts, eid, v))
    import math

    for k, evs in per_key.items():
        evs.sort()
        r = evs[0][2]
        for _, _, x in evs[1:]:
            r = EWMA_ALPHA * x + (1 - EWMA_ALPHA) * r
        want = math.floor(r * 1e6 + 0.5) / 1e6
        assert got[k] == want, (k, got[k], want)


WORDS = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=5),
    min_size=1,
    max_size=12,
)


def _py_bpe(word_freq, n_merges):
    vocab = {w: list(w) for w in word_freq}
    merges = []
    for rank in range(n_merges):
        counts: Counter = Counter()
        for w, toks in vocab.items():
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] += word_freq[w]
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, c))
        for w, toks in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            vocab[w] = out
    return merges


@settings(max_examples=6, deadline=None)
@given(words=WORDS)
def test_bpe_matches_model_on_ab_corpus(spark, words):
    # tiny {a,b} alphabet maximizes overlapping-run coverage (aaaa...)
    wf = Counter(words)
    n_pairs_exist = any(len(w) >= 2 for w in wf)
    docs = spark.createDataFrame(
        [(" ".join(words),)], "text string"
    )
    want = _py_bpe(dict(wf), 2)
    got = sorted(
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train(docs, n_merges=2).collect()
    )
    if not n_pairs_exist:
        assert got == []
    else:
        assert got == sorted(want)
