"""T1-T7 unit tests against straight-Python reference semantics
(SURVEY.md §2.3; reference quality_engine.py:177-221)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yelp_streaming_etl_pipeline_spark.functions import text_features as TF

CASES = [
    "Hello world! This is GREAT.",
    "",
    "   ",
    "one",
    "a b c d e f",
    "UPPER CASE ONLY!!!",
    "numbers 123 456 and punct ,,,;;;",
    "ends with punct...",
    ".,!? leading punct words here",
    "tab\tseparated\twords and  double  spaces",
]


def py_word_count(t):
    return len(t.split()) if t else 0


def py_sentence_count(t):
    t = t or ""
    return max(1, t.count(".") + t.count("!") + t.count("?"))


def py_avg_word_length(t):
    if not t or not t.strip():
        return 0.0
    words = t.split()
    lens = [len(w.strip(".,!?;:")) for w in words]
    import math

    return math.floor(sum(lens) / len(words) * 100 + 0.5) / 100


def py_caps_ratio(t):
    t = t or ""
    nonspace = t.replace(" ", "")
    if not nonspace:
        return 0.0
    caps = sum(1 for ch in t if "A" <= ch <= "Z")
    import math

    return math.floor(caps / len(nonspace) * 100 + 0.5) / 100


def _run(spark, col_fn):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(CASES)], ["i", "t"])
    rows = df.select("i", col_fn(F.col("t")).alias("v")).collect()
    return {r["i"]: r["v"] for r in rows}


def test_word_count(spark):
    got = _run(spark, TF.word_count)
    for i, c in enumerate(CASES):
        assert got[i] == py_word_count(c), (c, got[i])


def test_sentence_count(spark):
    got = _run(spark, TF.sentence_count)
    for i, c in enumerate(CASES):
        assert got[i] == py_sentence_count(c), (c, got[i])


def test_avg_word_length(spark):
    got = _run(spark, TF.avg_word_length)
    for i, c in enumerate(CASES):
        assert got[i] == pytest.approx(py_avg_word_length(c)), (c, got[i])


def test_caps_ratio(spark):
    got = _run(spark, TF.caps_ratio)
    for i, c in enumerate(CASES):
        assert got[i] == pytest.approx(py_caps_ratio(c)), (c, got[i])


def test_null_text(spark):
    df = spark.createDataFrame([(1, None)], "i int, t string")
    row = df.select(
        TF.word_count(F.col("t")).alias("wc"),
        TF.char_count(F.col("t")).alias("cc"),
        TF.avg_word_length(F.col("t")).alias("awl"),
        TF.punct_ratio(F.col("t")).alias("pr"),
    ).collect()[0]
    assert row["wc"] == 0 and row["cc"] == 0
    assert row["awl"] == 0.0 and row["pr"] == 0.0


def test_bigram_lift_exact_values(spark):
    """Lift is the exact integer-product ratio N*c(xy)/(c(x)c(y)) —
    hand-computed on a fixed corpus, with min_count filtering."""
    from yelp_streaming_etl_pipeline_spark.operators.text_analysis import (
        bigram_lift,
    )

    # 6x "p q" + 6x "p r q s": N = 36 tokens;
    # c(p)=c(q)=12, c(r)=c(s)=6; pairs (count 6 each): pq, pr, rq, qs
    docs = [(i, "p q") for i in range(6)]
    docs += [(100 + i, "p r q s") for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = bigram_lift(df, min_count=3, k=10).collect()
    got = [(r["bigram"], r["pair_count"], r["lift"]) for r in rows]
    # lifts: pq = 36*6/144 = 1.5; pr = rq = qs = 36*6/72 = 3.0;
    # ordered by (lift desc, bigram asc)
    assert got == [
        ("p r", 6, 3.0),
        ("q s", 6, 3.0),
        ("r q", 6, 3.0),
        ("p q", 6, 1.5),
    ]
    # min_count filters everything in a sparser corpus
    sparse = spark.createDataFrame([(1, "u v")], "doc_id long, text string")
    assert bigram_lift(sparse, min_count=3).count() == 0


def test_bm25_topk_hand_fixture(spark):
    """Integer BM25 on a hand-computed corpus: N=3, T=10, A=(100//3)=33;
    query = top-2 terms (bird cnt 5, cat cnt 3); idf_q(bird)=
    len(bin(8//3))=2, idf_q(cat)=len(bin(8//5))=1; per-term scores
    floor-divide exactly as below."""
    from yelp_streaming_etl_pipeline_spark.operators.text_analysis import (
        bm25_topk,
    )

    docs = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "cat mouse"),
         (3, "bird bird bird bird bird")],
        "doc_id long, text string",
    )
    got = [
        tuple(r)
        for r in bm25_topk(docs, n_query_terms=2, k=3).collect()
    ]
    # d3: (2*22*5*33*1000)//(10*33*5+3*33+90*5) = 7260000//2199 = 3301
    # d1: (1*22*2*33*1000)//(10*33*2+99+270)    = 1452000//1029 = 1411
    # d2: (1*22*1*33*1000)//(330+99+180)        =  726000//609  = 1192
    assert got == [(3, 3301, 1), (1, 1411, 1), (2, 1192, 1)]


def test_bm25_cross_topk_hand_fixture(spark):
    """Query terms come from the TARGET corpus, stats from the ranked
    one: target is all 'bird'/'cat', so docs stream stats reuse the
    bm25_topk fixture — ranking must equal bm25_topk with the same
    (bird, cat) query set even though 'cat' (not 'dog'/'mouse')
    dominates the ranked corpus; a doc containing neither query term
    emits no row."""
    from yelp_streaming_etl_pipeline_spark.operators.text_analysis import (
        bm25_cross_topk,
    )

    docs = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "cat mouse"),
         (3, "bird bird bird bird bird"), (4, "dog mouse ferret")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(100, "bird bird bird cat cat"), (101, "bird cat")],
        "doc_id long, text string",
    )
    got = [
        tuple(r)
        for r in bm25_cross_topk(
            docs, target, n_query_terms=2, k=4
        ).collect()
    ]
    # ranked-corpus stats now include doc 4: N=4, T=13, A=(130//4)=32
    # query = target's top-2 (bird cnt 4, cat cnt 3); df(bird)=1 ->
    # idf=len(bin(10//3))=2; df(cat)=2 -> idf=len(bin(10//5))=2
    # d3: (2*22*5*32*1000)//(10*32*5+3*32+90*5) = 7040000//2146 = 3280
    # d1: (2*22*2*32*1000)//(10*32*2+96+270)    = 2816000//1006 = 2799
    # d2: (2*22*1*32*1000)//(320+96+180)        = 1408000//596  = 2362
    assert got == [(3, 3280, 1), (1, 2799, 1), (2, 2362, 1)]
    assert all(r[0] != 4 for r in got)  # no query term -> no row


def test_bm25_cross_topk_bpe_anchor_and_oov(spark):
    """Anchor: with target == docs the cross form's query pieces
    equal the self-query set, so it must reproduce bm25_topk_bpe row
    for row. OOV: a target made of words absent from the ranked
    corpus contributes no in-vocab pieces... except single-char
    pieces it shares with the base alphabet — so a fully-disjoint
    ALPHABET target yields an empty result."""
    from yelp_streaming_etl_pipeline_spark.operators.text_analysis import (
        bm25_cross_topk_bpe,
        bm25_topk_bpe,
    )

    docs = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "cat mouse"),
         (3, "bird bird bird bird bird")],
        "doc_id long, text string",
    )
    self_q = sorted(
        tuple(r) for r in bm25_topk_bpe(docs, n_query_terms=2).collect()
    )
    cross_same = sorted(
        tuple(r)
        for r in bm25_cross_topk_bpe(
            docs, docs, n_query_terms=2
        ).collect()
    )
    assert cross_same == self_q and self_q
    disjoint = spark.createDataFrame(
        [(9, "zzz qqq zzz qqq")], "doc_id long, text string"
    )
    empty = bm25_cross_topk_bpe(docs, disjoint, n_query_terms=2).collect()
    assert empty == []  # no shared alphabet -> no query pieces


def test_bm25_maintain_stream_equals_batch(spark):
    """Streaming BM25 maintenance: the final epoch's top-k equals
    batch bm25_topk over the full corpus — the query-term set,
    document frequencies, and avgdl are all re-derived per epoch from
    the accumulated postings, so arrival order cannot matter."""
    from pyspark.sql import functions as F

    from yelp_streaming_etl_pipeline_spark.operators.text_analysis import (
        bm25_maintain_stream,
        bm25_topk,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i % 5} w{i % 3} common common w{i}") for i in range(30)],
        "doc_id long, text string",
    )
    batch = [tuple(r) for r in bm25_topk(docs, k=10).collect()]
    stream = [
        tuple(r)
        for r in bm25_maintain_stream(spark, docs, k=10, n_slices=3)
        .collect()
    ]
    assert stream == batch and len(batch) == 10


def test_bm25_maintain_stream_bpe_equals_batch_fixed_vocab(spark):
    """Streaming BPE-space BM25 maintenance under the fixed
    parquet-artifact vocab: the final epoch's top-k equals batch
    bm25_topk_bpe over the full corpus — the vocab is the one batch
    trains (trained once up front, round-tripped through parquet),
    and the per-epoch readout re-derives query pieces / df / avgdl
    from the accumulated postings, so arrival order cannot matter."""
    import tempfile

    from yelp_streaming_etl_pipeline_spark.operators.text_analysis import (
        bm25_maintain_stream_bpe,
        bm25_topk_bpe,
    )

    docs = spark.createDataFrame(
        [
            (i, f"alpha{i % 5} beta{i % 3} common common gamma{i % 7}")
            for i in range(24)
        ],
        "doc_id long, text string",
    )
    batch = [tuple(r) for r in bm25_topk_bpe(docs, k=10).collect()]
    path = tempfile.mkdtemp(prefix="bm25m_bpe_")
    stream = [
        tuple(r)
        for r in bm25_maintain_stream_bpe(
            spark, docs, k=10, n_slices=3, export_path=path
        ).collect()
    ]
    assert stream == batch and len(batch) == 10


def test_bm25_cross_maintain_stream_bpe_equals_batch(spark):
    """Streaming cross-corpus BPE BM25: fixed vocab + fixed target
    query pieces, ranked docs arriving — the final epoch equals batch
    bm25_cross_topk_bpe over the full ranked corpus."""
    import tempfile

    from yelp_streaming_etl_pipeline_spark.operators.text_analysis import (
        bm25_cross_maintain_stream_bpe,
        bm25_cross_topk_bpe,
    )

    rows = [
        (i, f"alpha{i % 5} beta{i % 3} common common gamma{i % 7}")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    docs = df.filter("doc_id % 2 = 0")
    target = df.filter("doc_id % 2 = 1")
    batch = [
        tuple(r) for r in bm25_cross_topk_bpe(docs, target, k=8).collect()
    ]
    path = tempfile.mkdtemp(prefix="bm25xm_bpe_")
    stream = [
        tuple(r)
        for r in bm25_cross_maintain_stream_bpe(
            spark, docs, target, k=8, n_slices=3, export_path=path
        ).collect()
    ]
    assert stream == batch and len(batch) == 8
