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


def test_wordpiece_word_stats_hand_fixture(spark):
    """Greedy longest-match against an EXPLICIT vocab, hand-computed:
    unable -> un|able (2 pieces, 10+20), banana -> b|a|n|a|n|a
    (6 pieces, all weight 1), quiz -> [UNK] (q unmatched), and a
    33-char word -> [UNK] via the length cap."""
    from pyspark.sql import functions as F

    from yelp_streaming_etl_pipeline_spark.operators import tokenizer as T

    vocab = spark.createDataFrame(
        [("un", 10), ("able", 20), ("ab", 5), ("a", 1), ("b", 1),
         ("l", 1), ("e", 1), ("n", 1)],
        "piece string, piece_w long",
    )
    words = spark.createDataFrame(
        [("unable", 1), ("banana", 1), ("quiz", 1), ("a" * 33, 1)],
        "w string, f long",
    )
    got = {
        r["w"]: r
        for r in T.wordpiece_word_stats(words, vocab).collect()
    }
    assert (got["unable"]["n_pieces"], got["unable"]["lm_score_q"],
            got["unable"]["is_unk"]) == (2, 30, False)
    assert (got["banana"]["n_pieces"], got["banana"]["lm_score_q"],
            got["banana"]["is_unk"]) == (6, 6, False)
    # any unmatched position -> the WHOLE word is one [UNK], score 0
    assert (got["quiz"]["n_pieces"], got["quiz"]["lm_score_q"],
            got["quiz"]["is_unk"]) == (1, 0, True)
    # words over WP_MAX_WORD chars are [UNK] outright (never scanned)
    assert got["a" * 33]["is_unk"] and got["a" * 33]["n_pieces"] == 1


def test_wordpiece_vocab_topk_order_and_weights(spark):
    """Vocab derivation: gram counts weighted by word frequency,
    pinned top-k order (count DESC, piece ASC), integer
    log2-frequency weights len(bin(cnt))."""
    from yelp_streaming_etl_pipeline_spark.operators import tokenizer as T

    words = spark.createDataFrame(
        [("aa", 1), ("ab", 1)], "w string, f long"
    )
    # gram totals: a=3, aa=1, ab=1, b=1; k=3 keeps a, aa, ab
    got = [tuple(r) for r in T.wordpiece_vocab(words, k=3).collect()]
    assert got[0] == ("a", 2)  # len(bin(3)) == 2
    assert sorted(got[1:]) == [("aa", 1), ("ab", 1)]


def test_wordpiece_doc_scores_end_to_end(spark):
    """Self-derived vocab over a tiny corpus: with k large enough to
    hold every gram, every word segments into its single longest
    piece (itself, if <= WP_MAXLEN chars) and nothing is UNK."""
    from yelp_streaming_etl_pipeline_spark.operators import tokenizer as T

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the the dog")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in T.wordpiece_doc_scores(docs, k=256).collect()
    }
    # every word is <= 4 chars and appears as its own gram -> each
    # word is exactly one piece, no UNKs
    assert (got[1]["n_words"], got[1]["n_pieces"], got[1]["n_unk_words"]) \
        == (3, 3, 0)
    assert (got[2]["n_words"], got[2]["n_pieces"], got[2]["n_unk_words"]) \
        == (3, 3, 0)
    # "the" appears 3x in the corpus -> weight len(bin(3)) = 2;
    # cat/sat/dog once -> weight 1; doc1 = 2+1+1, doc2 = 2+2+1
    assert got[1]["lm_score_q"] == 4
    assert got[2]["lm_score_q"] == 5


def test_unigram_viterbi_matches_bruteforce(spark):
    """The engine's 4-slot DP fold must equal a brute-force optimal
    segmentation (max score, tiebreak fewer pieces) computed in
    Python from the same vocab and dyadic weights — for EVERY word
    in a corpus crafted so multi-piece splits beat whole-word pieces."""
    from yelp_streaming_etl_pipeline_spark.operators import tokenizer as TK

    text = " ".join(["aabbb"] + ["aa"] * 60 + ["bbb"] * 60 + ["xy"] * 5)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    words = TK.word_freq_table(docs)
    vocab = TK.unigram_vocab(words)
    vrows = vocab.collect()
    q = {r["piece"]: r["q"] for r in vrows}
    T = sum(r["cnt"] for r in vrows)
    Q = len(bin(T)) - 2  # bitlen

    def brute(w):
        # dp over prefix lengths: (score, -pieces) lexicographic max
        best = {0: (0, 0)}
        for e in range(1, len(w) + 1):
            cands = []
            for l in range(1, min(4, e) + 1):
                piece = w[e - l:e]
                if piece in q and (e - l) in best:
                    s, p = best[e - l]
                    cands.append((s + q[piece] - Q, p - 1))
            if cands:
                best[e] = max(cands)
        s, p = best[len(w)]
        return s, -p

    got = {
        r["w"]: (r["lm_score_q"], r["n_pieces"])
        for r in TK.unigram_word_stats(words, vocab).collect()
    }
    for w in ["aabbb", "aa", "bbb", "xy"]:
        assert got[w] == brute(w), (w, got[w], brute(w))
    # the crafted word must actually exercise a multi-piece optimum
    assert got["aabbb"][1] >= 2


def test_unigram_lm_scores_doc_rollup(spark):
    """Doc scores are the sum of per-word stats over word
    OCCURRENCES (not distinct words)."""
    from yelp_streaming_etl_pipeline_spark.operators import tokenizer as TK

    docs = spark.createDataFrame(
        [(1, "aa aa bbb"), (2, "aa")], "doc_id long, text string"
    )
    words = TK.word_freq_table(docs)
    vocab = TK.unigram_vocab(words)
    stats = {
        r["w"]: r for r in TK.unigram_word_stats(words, vocab).collect()
    }
    out = {r["doc_id"]: r for r in TK.unigram_lm_scores(docs).collect()}
    assert out[1]["n_words"] == 3
    assert out[1]["n_pieces"] == (
        2 * stats["aa"]["n_pieces"] + stats["bbb"]["n_pieces"]
    )
    assert out[1]["lm_score_q"] == (
        2 * stats["aa"]["lm_score_q"] + stats["bbb"]["lm_score_q"]
    )
    assert out[2]["n_words"] == 1


def test_unigram_viterbi_pieces_match_bruteforce_paths(spark):
    """Path recovery must equal the brute-force Viterbi path (max
    score, fewer-pieces tiebreak, LONGEST-piece backtrace) piece by
    piece — multiset compare per distinct word."""
    from yelp_streaming_etl_pipeline_spark.operators import tokenizer as TK

    text = " ".join(["aabbb"] + ["aa"] * 60 + ["bbb"] * 60 + ["xy"] * 5)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    words = TK.word_freq_table(docs)
    vocab = TK.unigram_vocab(words)
    vrows = vocab.collect()
    q = {r["piece"]: r["q"] for r in vrows}
    T = sum(r["cnt"] for r in vrows)
    Q = len(bin(T)) - 2

    def brute_path(w):
        best = {0: (0, 0)}
        for e in range(1, len(w) + 1):
            cands = []
            for l in range(1, min(4, e) + 1):
                piece = w[e - l:e]
                if piece in q and (e - l) in best:
                    s, p = best[e - l]
                    cands.append((s + q[piece] - Q, p - 1))
            if cands:
                best[e] = max(cands)
        pieces = []
        e = len(w)
        while e > 0:
            lp = max(
                l
                for l in range(1, min(4, e) + 1)
                if w[e - l:e] in q
                and (e - l) in best
                and (
                    best[e - l][0] + q[w[e - l:e]] - Q,
                    best[e - l][1] - 1,
                )
                == best[e]
            )
            pieces.append(w[e - lp:e])
            e -= lp
        return sorted(pieces)

    got: dict = {}
    for r in TK.unigram_viterbi_pieces(words, vocab).collect():
        got.setdefault(r["w"], []).append(r["piece"])
    assert set(got) == {"aabbb", "aa", "bbb", "xy"}
    for w, pieces in got.items():
        assert sorted(pieces) == brute_path(w), (w, sorted(pieces))


def test_unigram_em_refine_invariants(spark):
    """Conservation + prune semantics: total Viterbi usage equals
    sum(f * n_pieces) over short words; single-char pieces are never
    pruned; multigrams are kept iff usage >= min_cnt; q_new is the
    dyadic bitlen of usage (0 when unused)."""
    from yelp_streaming_etl_pipeline_spark.operators import tokenizer as TK

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog ate the bone"),
            (3, "aa aabbb bbb aa"),
            (4, "xy xy quartz"),
        ],
        "doc_id long, text string",
    )
    ref = TK.unigram_em_refine(docs).collect()
    words = TK.word_freq_table(docs)
    vocab = TK.unigram_vocab(words)
    stats = TK.unigram_word_stats(words, vocab).collect()
    wf = {r["w"]: r["f"] for r in words.collect()}
    expect_total = sum(
        wf[r["w"]] * r["n_pieces"] for r in stats if not r["is_long"]
    )
    assert sum(r["vit_cnt"] for r in ref) == expect_total
    assert any(r["plen"] >= 2 and not r["kept"] for r in ref) or all(
        r["vit_cnt"] >= 1 for r in ref if r["plen"] >= 2
    )
    for r in ref:
        if r["plen"] == 1:
            assert r["kept"]
        else:
            assert r["kept"] == (r["vit_cnt"] >= TK.UV_EM_MIN_CNT)
        if r["vit_cnt"] > 0:
            assert r["q_new"] == len(bin(r["vit_cnt"])) - 2
        else:
            assert r["q_new"] == 0


def test_unigram_em_loop_matches_bruteforce_em(spark):
    """Every per-round inventory-delta row of the 3-round EM loop must
    equal a brute-force Python EM run from the same seed inventory:
    per round, Viterbi-segment each short word (max score, fewer-piece
    tiebreak, LONGEST-piece backtrace), accumulate usage weighted by
    word frequency, prune multigrams below min_cnt, re-quantize
    q = bitlen(usage), iterate."""
    from yelp_streaming_etl_pipeline_spark.operators import tokenizer as TK

    text = " ".join(["aabbb"] + ["aa"] * 60 + ["bbb"] * 60 + ["xy"] * 5)
    docs = spark.createDataFrame(
        [(1, text), (2, "the cat sat on the mat"), (3, "aabbb xy")],
        "doc_id long, text string",
    )
    words = TK.word_freq_table(docs)
    vocab0 = TK.unigram_vocab(words)
    wf = {r["w"]: r["f"] for r in words.collect()}
    inv = {r["piece"]: (r["q"], r["cnt"]) for r in vocab0.collect()}

    def viterbi_path(w, q, Q):
        best = {0: (0, 0)}
        for e in range(1, len(w) + 1):
            cands = []
            for l in range(1, min(4, e) + 1):
                piece = w[e - l:e]
                if piece in q and (e - l) in best:
                    s, p = best[e - l]
                    cands.append((s + q[piece] - Q, p - 1))
            if cands:
                best[e] = max(cands)
        pieces, e = [], len(w)
        while e > 0:
            lp = max(
                l
                for l in range(1, min(4, e) + 1)
                if w[e - l:e] in q
                and (e - l) in best
                and (
                    best[e - l][0] + q[w[e - l:e]] - Q,
                    best[e - l][1] - 1,
                )
                == best[e]
            )
            pieces.append(w[e - lp:e])
            e -= lp
        return pieces

    expected = []
    for r in range(1, 4):
        q = {p: qc[0] for p, qc in inv.items()}
        T = sum(qc[1] for qc in inv.values())
        Q = len(bin(max(T, 1))) - 2
        usage: dict = {}
        for w, f in wf.items():
            if len(w) > TK.WP_MAX_WORD:
                continue
            for piece in viterbi_path(w, q, Q):
                usage[piece] = usage.get(piece, 0) + f
        kept = {
            p: usage.get(p, 0)
            for p in inv
            if len(p) == 1 or usage.get(p, 0) >= TK.UV_EM_MIN_CNT
        }
        expected.append(
            (
                r,
                len(inv),
                sum(1 for p in inv if len(p) >= 2),
                len(kept),
                len(inv) - len(kept),
                sum(usage.get(p, 0) for p in inv),
                sum(
                    len(bin(u)) - 2 if u > 0 else 0
                    for u in kept.values()
                ),
            )
        )
        inv = {
            p: ((len(bin(u)) - 2 if u > 0 else 0), u)
            for p, u in kept.items()
        }
    got = sorted(tuple(r) for r in TK.unigram_em_loop(docs).collect())
    assert got == expected, (got, expected)
    # the fixture must actually exercise pruning in round 1
    assert expected[0][4] > 0


def test_unigram_em_schedule_matches_bruteforce(spark):
    """Every per-round delta row of the size-scheduled trainer must
    equal a brute-force Python run from the same seed inventory: per
    round, Viterbi usage exactly as the loop test, then keep the top
    n_target = max(target, ceil(n_multi * num/den)) multigrams by
    (usage DESC, piece ASC) — positive usage required — and all
    singles; re-quantize q = bitlen(usage). Uses an aggressive
    schedule (target 2, shrink 1/2) so the RANK cut itself prunes
    positive-usage pieces."""
    from yelp_streaming_etl_pipeline_spark.operators import tokenizer as TK

    text = " ".join(
        ["aabbb"] + ["aa"] * 60 + ["bbb"] * 60 + ["xy"] * 25 + ["cd"] * 20
    )
    docs = spark.createDataFrame(
        [(1, text), (2, "the cat sat on the mat"), (3, "aabbb xy cd")],
        "doc_id long, text string",
    )
    target, num, den, rounds = 2, 1, 2, 3
    words = TK.word_freq_table(docs)
    vocab0 = TK.unigram_vocab(words)
    wf = {r["w"]: r["f"] for r in words.collect()}
    inv = {r["piece"]: (r["q"], r["cnt"]) for r in vocab0.collect()}

    def viterbi_path(w, q, Q):
        best = {0: (0, 0)}
        for e in range(1, len(w) + 1):
            cands = []
            for l in range(1, min(4, e) + 1):
                piece = w[e - l:e]
                if piece in q and (e - l) in best:
                    s, p = best[e - l]
                    cands.append((s + q[piece] - Q, p - 1))
            if cands:
                best[e] = max(cands)
        pieces, e = [], len(w)
        while e > 0:
            lp = max(
                l
                for l in range(1, min(4, e) + 1)
                if w[e - l:e] in q
                and (e - l) in best
                and (
                    best[e - l][0] + q[w[e - l:e]] - Q,
                    best[e - l][1] - 1,
                )
                == best[e]
            )
            pieces.append(w[e - lp:e])
            e -= lp
        return pieces

    expected = []
    rank_cut_pruned_positive = False
    for r in range(1, rounds + 1):
        q = {p: qc[0] for p, qc in inv.items()}
        T = sum(qc[1] for qc in inv.values())
        Q = len(bin(max(T, 1))) - 2
        usage: dict = {}
        for w, f in wf.items():
            if len(w) > TK.WP_MAX_WORD:
                continue
            for piece in viterbi_path(w, q, Q):
                usage[piece] = usage.get(piece, 0) + f
        multis = sorted(
            (p for p in inv if len(p) >= 2),
            key=lambda p: (-usage.get(p, 0), p),
        )
        n_multi = len(multis)
        n_target = max(target, (num * n_multi + den - 1) // den)
        kept_multi = {
            p
            for i, p in enumerate(multis)
            if usage.get(p, 0) > 0 and i < n_target
        }
        if any(
            usage.get(p, 0) > 0
            for i, p in enumerate(multis)
            if i >= n_target
        ):
            rank_cut_pruned_positive = True
        kept = {
            p: usage.get(p, 0)
            for p in inv
            if len(p) == 1 or p in kept_multi
        }
        expected.append(
            (
                r,
                len(inv),
                n_multi,
                n_target,
                len(kept),
                len(inv) - len(kept),
                sum(usage.get(p, 0) for p in inv),
                sum(
                    len(bin(u)) - 2 if u > 0 else 0
                    for u in kept.values()
                ),
            )
        )
        inv = {
            p: ((len(bin(u)) - 2 if u > 0 else 0), u)
            for p, u in kept.items()
        }
    got = sorted(
        tuple(r)
        for r in TK.unigram_em_schedule(
            docs,
            rounds=rounds,
            target_multi=target,
            shrink_num=num,
            shrink_den=den,
        ).collect()
    )
    assert got == expected, (got, expected)
    assert rank_cut_pruned_positive  # the fixture exercises the cut


def test_unigram_em_schedule_scores_equivalence_anchor(spark):
    """With rounds=1 and an unreachable target the rank cut never
    binds, so the kept set is exactly 'usage > 0 or single char' —
    the scheduled scorer must equal unigram_em_scores at min_cnt=1
    row for row; an aggressive schedule (target 2, shrink 1/2, 3
    rounds) must concentrate the inventory and CHANGE scores."""
    from yelp_streaming_etl_pipeline_spark.operators import tokenizer as TK

    docs = spark.createDataFrame(
        [
            (1, " ".join(["aabbb"] + ["aa"] * 40 + ["bbb"] * 40)),
            (2, "the cat sat on the mat with a hat"),
            (3, "aabbb xy cd xy cd xy"),
        ],
        "doc_id long, text string",
    )
    anchor = sorted(
        tuple(r)
        for r in TK.unigram_em_schedule_scores(
            docs, rounds=1, target_multi=10**9
        ).collect()
    )
    em = sorted(
        tuple(r)
        for r in TK.unigram_em_scores(docs, min_cnt=1).collect()
    )
    assert anchor == em, (anchor, em)
    aggressive = sorted(
        tuple(r)
        for r in TK.unigram_em_schedule_scores(
            docs, rounds=3, target_multi=2, shrink_num=1, shrink_den=2
        ).collect()
    )
    assert {t[0] for t in aggressive} == {t[0] for t in em}
    assert aggressive != em  # the shrink actually moves the model


def test_unigram_schedule_export_roundtrip_parity(spark):
    """Train-once/ship parity for the scheduled unigram family: the
    per-doc scores under the parquet-round-tripped FINAL inventory
    (export_unigram write + re-read) must equal the in-memory
    inventory's scores row for row — the export artifact carries the
    complete model state (piece, q, cnt) the Viterbi segmenter
    needs, exactly as export_bpe does for the merge family."""
    import tempfile

    from yelp_streaming_etl_pipeline_spark.operators import tokenizer as TK

    docs = spark.createDataFrame(
        [
            (1, " ".join(["aabbb"] + ["aa"] * 40 + ["bbb"] * 40)),
            (2, "the cat sat on the mat with a hat"),
            (3, "aabbb xy cd xy cd xy"),
        ],
        "doc_id long, text string",
    )
    mem = sorted(
        tuple(r) for r in TK.unigram_em_schedule_scores(docs).collect()
    )
    path = tempfile.mkdtemp(prefix="uni_export_")
    shipped = sorted(
        tuple(r)
        for r in TK.unigram_em_schedule_scores(
            docs, export_path=path
        ).collect()
    )
    assert shipped == mem and mem
    # the artifact parquet is readable standalone and inventory-shaped
    art = spark.read.parquet(f"{path}/pieces")
    assert set(art.columns) == {"piece", "q", "cnt"}
    assert art.count() > 0


def test_unigram_em_scores_matches_bruteforce_round2(spark):
    """Round-2 segmentation must be the brute-force Viterbi optimum
    under the REFINED weights (kept pieces, q_new, Q2 = bitlen of
    total Viterbi usage)."""
    from yelp_streaming_etl_pipeline_spark.operators import tokenizer as TK

    text = " ".join(["aabbb"] + ["aa"] * 60 + ["bbb"] * 60 + ["xy"] * 5)
    docs = spark.createDataFrame(
        [(1, "aabbb"), (2, text)], "doc_id long, text string"
    )
    ref = TK.unigram_em_refine(docs).collect()
    q2 = {r["piece"]: r["q_new"] for r in ref if r["kept"]}
    T2 = sum(r["vit_cnt"] for r in ref if r["kept"])
    Q2 = len(bin(T2)) - 2 if T2 > 0 else 1

    def brute(w):
        best = {0: (0, 0)}
        for e in range(1, len(w) + 1):
            cands = []
            for l in range(1, min(4, e) + 1):
                piece = w[e - l:e]
                if piece in q2 and (e - l) in best:
                    s, p = best[e - l]
                    cands.append((s + q2[piece] - Q2, p - 1))
            if cands:
                best[e] = max(cands)
        s, p = best[len(w)]
        return s, -p

    got = {
        r["doc_id"]: r for r in TK.unigram_em_scores(docs).collect()
    }
    # doc 1 is the single word "aabbb": its rollup IS the word's
    # round-2 Viterbi optimum
    s, p = brute("aabbb")
    assert (got[1]["lm_score_q"], got[1]["n_pieces"]) == (s, p)
    # doc 2 = sum over word occurrences
    per_word = {w: brute(w) for w in ["aabbb", "aa", "bbb", "xy"]}
    counts = {"aabbb": 1, "aa": 60, "bbb": 60, "xy": 5}
    assert got[2]["lm_score_q"] == sum(
        per_word[w][0] * c for w, c in counts.items()
    )
    assert got[2]["n_pieces"] == sum(
        per_word[w][1] * c for w, c in counts.items()
    )
