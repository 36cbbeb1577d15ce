"""Distributed BPE training (operators/tokenizer.py)."""

from __future__ import annotations

from collections import Counter

from yelp_streaming_etl_pipeline_spark.operators import tokenizer as TK
from yelp_streaming_etl_pipeline_spark.operators.tokenizer import (
    bpe_train,
)


def _py_bpe(word_freq: dict[str, int], n_merges: int):
    """Sequential reference: classic BPE with the same pinned argmax
    tie order and greedy left-to-right application."""
    vocab = {w: list(w) for w in word_freq}
    merges = []
    for rank in range(n_merges):
        counts: Counter = Counter()
        for w, toks in vocab.items():
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] += word_freq[w]
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
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


def _run(spark, texts, n_merges=3):
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = bpe_train(docs, n_merges=n_merges).collect()
    return sorted(
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in rows
    )


def test_bpe_matches_sequential_reference(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest",
        "low newer low",
    ]
    wf: Counter = Counter()
    for t in texts:
        for w in t.split():
            wf[w] += 1
    got = _run(spark, texts, n_merges=4)
    want = sorted(_py_bpe(dict(wf), 4))
    assert got == want


def test_bpe_overlapping_run_is_greedy(spark):
    # 'aaaa' x3 + 'aaa' x2: merge 0 must be (a,a); greedy application
    # turns aaaa -> [aa][aa] and aaa -> [aa][a], so merge 1 counts
    # (aa,aa)=3 and (aa,a)=2 -> merge 1 is (aa,aa)
    texts = ["aaaa aaaa aaaa aaa aaa"]
    got = _run(spark, texts, n_merges=2)
    assert got[0][1:] == ("a", "a", 3 * 3 + 2 * 2)
    assert got[1][1:3] == ("aa", "aa")


def test_bpe_ignores_non_alpha_words(spark):
    got = _run(spark, ["ab ab 123 ab!x C3PO AB"], n_merges=1)
    # only "ab", "ab", and lowercased "ab" survive the ^[a-z]+$ gate
    assert got == [(0, "a", "b", 3)]


def test_bpe_token_counts_compress(spark):
    from yelp_streaming_etl_pipeline_spark.operators.tokenizer import (
        bpe_token_counts,
    )

    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "newest newest"), (3, "123 !!")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            bpe_token_counts(docs, n_merges=3).collect()}
    # doc 3 has no alpha words -> absent entirely
    assert set(rows) == {1, 2}
    assert rows[1]["n_words"] == 3 and rows[2]["n_words"] == 2
    # merges compress: token count strictly below character count,
    # and at least one token per word
    assert rows[1]["n_words"] <= rows[1]["n_bpe_tokens"] < len("lowlowlower")
    assert rows[2]["n_words"] <= rows[2]["n_bpe_tokens"] < len("newestnewest")


def test_bpe_short_circuits_when_pairs_run_dry(spark):
    # "ab ab c": one productive merge (a+b), then no adjacent pairs
    # remain — the loop must stop and KEEP the segmentation (the old
    # crossJoin against an empty argmax wiped the whole vocab)
    docs = spark.createDataFrame([(1, "ab ab c")], ["doc_id", "text"])
    merges, vocab = TK.bpe_learn(docs, n_merges=4)
    mrows = merges.collect()
    assert len(mrows) == 1
    assert (mrows[0]["left"], mrows[0]["right"]) == ("a", "b")
    segs = {r["w"]: list(r["toks"]) for r in vocab.collect()}
    assert segs == {"ab": ["ab"], "c": ["c"]}
    counts = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in TK.bpe_token_counts(docs, n_merges=4).collect()
    }
    assert counts == {1: (3, 3)}


def test_bpe_learn_releases_iteration_caches(spark):
    # persist hygiene: cached tables must not accumulate with the
    # merge count — superseded vocabs are unpersisted each iteration
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(8)],
        ["doc_id", "text"],
    )

    def run(n):
        m, v = TK.bpe_learn(docs, n_merges=n)
        m.collect()
        return len(spark.sparkContext._jsc.getPersistentRDDs())

    base = run(2)
    assert run(6) <= base + 1  # bounded, not O(n_merges)


def test_bpe_bytes_alphabet_hex_segmentation(spark):
    # byte-level: no ASCII gate, tokens are UTF-8 hex pairs — a
    # 2-byte é segments into two byte tokens
    docs = spark.createDataFrame(
        [(1, "héllo héllo UP")], ["doc_id", "text"]
    )
    merges, vocab = TK.bpe_learn(docs, n_merges=1, alphabet="bytes")
    segs = {r["w"]: list(r["toks"]) for r in vocab.collect()}
    assert "UP" in segs  # no lowercase-alpha gate
    m = merges.collect()[0]
    # most frequent adjacent pair comes from the doubled word
    assert m["pair_count"] == 2
    # hex-pair tokens only
    for toks in segs.values():
        for t in toks:
            assert len(t) % 2 == 0 and all(
                c in "0123456789ABCDEF" for c in t
            )


def test_bpe_bytes_artifact_roundtrip(spark, tmp_path):
    # export -> parquet -> re-read tokenize == in-memory tokenize
    docs = spark.createDataFrame(
        [(i, f"pack my box with five dozen jugs {i % 3}") for i in range(6)],
        ["doc_id", "text"],
    )
    direct = {
        (r["doc_id"], r["n_words"], r["n_bpe_tokens"])
        for r in TK.bpe_token_counts(docs, alphabet="bytes").collect()
    }
    via_artifact = {
        (r["doc_id"], r["n_words"], r["n_bpe_tokens"])
        for r in TK.bpe_token_counts(
            docs, alphabet="bytes", export_path=str(tmp_path / "bpe")
        ).collect()
    }
    assert direct == via_artifact
    # the merges artifact itself round-trips
    merges, vocab = TK.bpe_learn(docs, alphabet="bytes")
    mp, _ = TK.export_bpe(merges, vocab, str(tmp_path / "bpe2"))
    reread = spark.read.parquet(mp)
    assert {tuple(r) for r in reread.collect()} == {
        tuple(r) for r in merges.collect()
    }
