"""Semantics tests for the corpus-quality family (Gopher/C4 rules,
repetition profiling, chunking) and the Bloom-filter sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from yelp_streaming_etl_pipeline_spark.operators import (
    corpus_quality as CQ,
    sketches as SK,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _row(df, doc_id):
    return {
        r["doc_id"]: r for r in df.collect()
    }[doc_id]


GOOD = (
    "the quick brown fox jumps over that lazy dog and keeps running "
    "with great energy through the quiet evening fields"
)


class TestGopherQuality:
    def test_clean_document_passes(self, spark):
        r = _row(CQ.gopher_quality(_docs(spark, [(1, GOOD)])), 1)
        assert r["passes_gopher"]
        assert r["word_count"] == 20
        assert r["required_word_hits"] >= 2  # the, that, and, with
        assert r["alpha_word_frac"] == 1.0

    def test_word_count_floor(self, spark):
        r = _row(CQ.gopher_quality(_docs(spark, [(1, "too short")])), 1)
        assert r["word_count"] == 2
        assert not r["passes_gopher"]

    def test_bullet_and_ellipsis_lines(self, spark):
        text = "- first bullet\n- second bullet\nreal sentence here...\n"
        r = _row(CQ.gopher_quality(_docs(spark, [(1, text)])), 1)
        assert abs(r["bullet_line_frac"] - 2 / 3) < 1e-3
        assert abs(r["ellipsis_line_frac"] - 1 / 3) < 1e-3

    def test_symbol_ratio_counts_hash_and_ellipsis(self, spark):
        text = "the tag # and # again plus trailing dots ... done"
        r = _row(CQ.gopher_quality(_docs(spark, [(1, text)])), 1)
        # 2 '#' + 1 '...' over 11 words
        assert abs(r["symbol_word_ratio"] - 3 / 11) < 1e-3
        assert not r["passes_gopher"]

    def test_alpha_word_frac_flags_numeric_soup(self, spark):
        text = "1 2 3 4 5 6 7 8 9 10 11 12 the end"
        r = _row(CQ.gopher_quality(_docs(spark, [(1, text)])), 1)
        assert r["alpha_word_frac"] < CQ.GOPHER_MIN_ALPHA_WORD_FRAC
        assert not r["passes_gopher"]

    def test_empty_and_null_text(self, spark):
        out = CQ.gopher_quality(
            spark.createDataFrame(
                [(1, ""), (2, None)], "doc_id long, text string"
            )
        )
        for r in out.collect():
            assert r["word_count"] == 0
            assert not r["passes_gopher"]

    def test_mean_word_len_exact(self, spark):
        r = _row(CQ.gopher_quality(_docs(spark, [(1, "aa bbbb cc")])), 1)
        assert abs(r["mean_word_len"] - 8 / 3) < 1e-3


class TestRepetitionProfile:
    def test_no_repetition(self, spark):
        r = _row(
            CQ.repetition_profile(
                _docs(spark, [(1, "alpha beta gamma delta epsilon")])
            ),
            1,
        )
        assert r["dup_word_frac"] == 0.0
        assert r["dup5gram_char_frac"] == 0.0
        # unique 2-grams: top one covers its own chars only
        assert 0 < r["top2gram_char_frac"] < 0.5

    def test_duplicate_lines(self, spark):
        text = "same line\nsame line\nother line"
        r = _row(CQ.repetition_profile(_docs(spark, [(1, text)])), 1)
        # 2 of 3 lines are duplicates of each other
        assert abs(r["dup_line_frac"] - 1 / 3) < 1e-3  # 3 lines, 2 distinct
        assert abs(r["dup_line_char_frac"] - 18 / 28) < 1e-3

    def test_repeated_phrase_dominates_top_ngram(self, spark):
        text = "spam ham " * 10 + "tail word"
        r = _row(CQ.repetition_profile(_docs(spark, [(1, text.strip())])), 1)
        # "spam ham"/"ham spam" repeated -> top 2-gram covers a large
        # fraction; 5-grams inside the repeated run are duplicated too
        assert r["top2gram_char_frac"] > 0.5
        assert r["dup5gram_char_frac"] > 1.0  # count-weighted, overlaps
        assert r["dup_word_frac"] > 0.8

    def test_short_doc_has_no_grams(self, spark):
        r = _row(CQ.repetition_profile(_docs(spark, [(1, "one two")])), 1)
        assert r["top3gram_char_frac"] == 0.0
        assert r["dup5gram_char_frac"] == 0.0
        assert r["top2gram_char_frac"] > 0


class TestChunkDocuments:
    def test_single_chunk_when_short(self, spark):
        out = CQ.chunk_documents(
            _docs(spark, [(1, " ".join(f"w{i}" for i in range(10)))])
        ).collect()
        assert len(out) == 1
        assert out[0]["chunk_idx"] == 0
        assert out[0]["n_tokens"] == 10

    def test_overlap_and_coverage(self, spark):
        words = [f"w{i}" for i in range(100)]
        out = {
            r["chunk_idx"]: r
            for r in CQ.chunk_documents(
                _docs(spark, [(1, " ".join(words))])
            ).collect()
        }
        step = CQ.CHUNK_TOKENS - CQ.CHUNK_OVERLAP
        # starts advance by step; chunks cover every word
        covered = set()
        for idx, r in out.items():
            assert r["start_word"] == 1 + idx * step
            toks = r["chunk_text"].split(" ")
            assert len(toks) == r["n_tokens"]
            assert toks == words[r["start_word"] - 1 :][: r["n_tokens"]]
            covered.update(range(r["start_word"], r["start_word"] + r["n_tokens"]))
        assert covered == set(range(1, 101))
        # consecutive chunks overlap by exactly CHUNK_OVERLAP (when full)
        full = [r for r in out.values() if r["n_tokens"] == CQ.CHUNK_TOKENS]
        assert len(full) >= 2

    def test_no_pure_overlap_tail_chunk(self, spark):
        # wc = CHUNK_TOKENS + 1: second chunk must add new words
        n = CQ.CHUNK_TOKENS + 1
        out = CQ.chunk_documents(
            _docs(spark, [(1, " ".join(f"w{i}" for i in range(n)))])
        ).collect()
        assert len(out) == 2
        last = max(out, key=lambda r: r["chunk_idx"])
        assert last["start_word"] + last["n_tokens"] - 1 == n

    def test_empty_doc_emits_nothing(self, spark):
        assert (
            CQ.chunk_documents(
                spark.createDataFrame(
                    [(1, ""), (2, None)], "doc_id long, text string"
                )
            ).count()
            == 0
        )


class TestBloomFilter:
    def test_no_false_negatives_and_bounded_fp(self, spark):
        keys = spark.range(0, 400).select(
            "id", F.col("id").cast("string").alias("k")
        )
        members = keys.filter(F.col("id") % 2 == 0).select("k")
        regs = SK.bloom_registers(members, F.col("k"))
        assert regs.count() <= SK.BLOOM_WORDS
        probed = SK.bloom_might_contain(keys, F.col("k"), regs)
        fn = probed.filter(
            (F.col("id") % 2 == 0) & ~F.col("might_contain")
        ).count()
        assert fn == 0
        # 200 keys * 4 bits in 4096 bits -> fp well under 20%
        fp = probed.filter(
            (F.col("id") % 2 == 1) & F.col("might_contain")
        ).count()
        assert fp < 40

    def test_registers_merge_by_bit_or(self, spark):
        a = spark.range(0, 100).select(F.col("id").cast("string").alias("k"))
        b = spark.range(100, 200).select(
            F.col("id").cast("string").alias("k")
        )
        merged = (
            SK.bloom_registers(a, F.col("k"))
            .unionByName(SK.bloom_registers(b, F.col("k")))
            .groupBy("word")
            .agg(F.bit_or("bits").alias("bits"))
        )
        direct = SK.bloom_registers(a.unionByName(b), F.col("k"))
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )


class TestPlanShapes:
    """Physical-plan audits: the 100 TB contracts of the new family."""

    def test_gopher_quality_is_pure_map(self, spark):
        from yelp_streaming_etl_pipeline_spark.plans import audit as A

        df = CQ.gopher_quality(
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        )
        assert A.shuffle_exchanges(df) == 0
        assert not A.has_python_udf(df)
        # column pruning: only doc_id + text reach the scan
        assert set(A.read_schema_columns(df)) == {"doc_id", "text"}

    def test_chunk_documents_is_pure_map(self, spark):
        from yelp_streaming_etl_pipeline_spark.plans import audit as A

        df = CQ.chunk_documents(
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        )
        assert A.shuffle_exchanges(df) == 0
        assert set(A.read_schema_columns(df)) == {"doc_id", "text"}

    def test_repetition_profile_bounded_shuffles(self, spark):
        from yelp_streaming_etl_pipeline_spark.plans import audit as A

        df = CQ.repetition_profile(
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        )
        # gram count agg + (doc,n) window/agg + (doc) pivot + join:
        # every exchange is keyed by doc_id (+n/gram) — bounded, and
        # never a global or all-pairs key
        assert A.key_shuffle_exchanges(df) <= 5
        assert not A.has_python_udf(df)

    def test_bloom_probe_is_broadcast_no_probe_shuffle(self, spark):
        from yelp_streaming_etl_pipeline_spark.plans import audit as A

        cust = spark.read.parquet(
            "/root/testdata/sf0.001/customer.parquet"
        )
        regs = SK.bloom_registers(
            cust.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("c_custkey").cast("string"),
        )
        probed = SK.bloom_might_contain(
            cust, F.col("c_custkey").cast("string"), regs
        )
        plan = A.physical_plan(probed)
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
        # the register build is the ONLY keyed shuffle; the probe side
        # itself is a pure map over the scan
        assert A.key_shuffle_exchanges(probed) <= 1


class TestQualityClassifier:
    def test_score_bounds_and_label_sign(self, spark):
        df = CQ.quality_classifier(_docs(spark, [(1, GOOD)]))
        r = _row(df, 1)
        assert -1.0 <= r["qc_score"] <= 1.0
        assert r["qc_label"] == (r["qc_score"] > 0)
        # 20 words -> 20 unigrams + 19 bigrams
        assert r["n_grams"] == 39

    def test_empty_doc_scores_zero(self, spark):
        for text in (None, "", "   "):
            r = _row(CQ.quality_classifier(_docs(spark, [(1, text)])), 1)
            assert r["n_grams"] == 0
            assert r["qc_score"] == 0.0
            assert not r["qc_label"]

    def test_deterministic_across_runs(self, spark):
        df = _docs(spark, [(i, GOOD + f" tail {i}") for i in range(20)])
        a = sorted(map(tuple, CQ.quality_classifier(df).collect()))
        b = sorted(map(tuple, CQ.quality_classifier(df).collect()))
        assert a == b


class TestBoilerplateLines:
    def _corpus(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_high_df_lines_dropped_order_kept(self, spark):
        footer = "copyright footer"
        rows = [
            (i, f"unique content {i}\n{footer}\nmore content {i}")
            for i in range(20)
        ]
        out = {
            r["doc_id"]: r
            for r in CQ.drop_boilerplate_lines(
                self._corpus(spark, rows), max_df_pct=5
            ).collect()
        }
        for i in range(20):
            r = out[i]
            # footer (df=100%) gone; the two content lines kept IN ORDER
            assert r["clean_text"] == f"unique content {i}\nmore content {i}"
            assert r["n_kept"] == 2 and r["n_dropped"] == 1

    def test_all_boilerplate_doc_survives_empty(self, spark):
        rows = [(i, "same line everywhere") for i in range(10)]
        out = CQ.drop_boilerplate_lines(
            self._corpus(spark, rows), max_df_pct=50
        ).collect()
        assert len(out) == 10
        for r in out:
            assert r["clean_text"] == ""
            assert r["n_kept"] == 0 and r["n_dropped"] == 1

    def test_threshold_is_strict_inequality(self, spark):
        # a line in exactly max_df_pct% of docs is NOT boilerplate
        rows = [(i, ("edge line" if i < 5 else f"solo {i}")) for i in range(10)]
        out = {
            r["doc_id"]: r
            for r in CQ.drop_boilerplate_lines(
                self._corpus(spark, rows), max_df_pct=50
            ).collect()
        }
        assert out[0]["clean_text"] == "edge line"  # df = 50% == pct -> kept
        rows2 = [(i, ("edge line" if i < 6 else f"solo {i}")) for i in range(10)]
        out2 = {
            r["doc_id"]: r
            for r in CQ.drop_boilerplate_lines(
                self._corpus(spark, rows2), max_df_pct=50
            ).collect()
        }
        assert out2[0]["clean_text"] == ""  # df = 60% > 50 -> dropped


def test_bigram_lm_scores_hand_fixture(spark):
    """Known tiny model: ref bigrams (a,b)x3, (b,a)x1, (b,c)x1 ->
    cu(a)=3, cu(b)=2, TB=5, q_oov=-3; dyadic weights and the
    millibit division verified by hand; sub-2-word docs unscored."""
    from yelp_streaming_etl_pipeline_spark.operators.corpus_quality import (
        bigram_lm_scores,
    )

    ref = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b")], "doc_id long, text string"
    )
    scored = spark.createDataFrame(
        [(10, "a b a"), (11, "a z b"), (12, "hello"), (13, "c a")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r for r in bigram_lm_scores(ref, scored).collect()
    }
    assert set(got) == {10, 11, 13}  # doc 12 has < 2 words
    # (a,b): q = bitlen(3)-bitlen(3) = 0; (b,a): bitlen(1)-bitlen(2) = -1
    assert (
        got[10]["n_bigrams"], got[10]["n_oov"], got[10]["lm_q_sum"],
        got[10]["mbits_per_bigram"],
    ) == (2, 0, -1, 500)
    # both bigrams OOV at -3 each
    assert (
        got[11]["n_bigrams"], got[11]["n_oov"], got[11]["lm_q_sum"],
        got[11]["mbits_per_bigram"],
    ) == (2, 2, -6, 3000)
    assert (
        got[13]["n_bigrams"], got[13]["n_oov"], got[13]["lm_q_sum"],
    ) == (1, 1, -3)


def test_bigram_lm_scores_reference_likeness_orders(spark):
    """A document made of reference phrases must score fewer
    millibits/bigram than shuffled-vocabulary noise."""
    from yelp_streaming_etl_pipeline_spark.operators.corpus_quality import (
        bigram_lm_scores,
    )

    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(8)],
        "doc_id long, text string",
    )
    scored = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps"),
            (101, "dog the over brown quick zebra fox lazy"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["mbits_per_bigram"]
        for r in bigram_lm_scores(ref, scored).collect()
    }
    assert got[100] < got[101]


def test_bigram_lm_stream_equals_batch(spark):
    """Maintenance over a 3-slice replay of the reference must equal
    the batch scorer at the final epoch (weights/OOV floor re-derive
    as corpus totals move)."""
    from yelp_streaming_etl_pipeline_spark.operators.corpus_quality import (
        bigram_lm_maintain_stream,
        bigram_lm_scores,
    )

    ref = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown cat naps under the warm sun"),
            (3, "a slow green turtle walks past the quick fox"),
        ],
        "doc_id long, text string",
    )
    scored = spark.createDataFrame(
        [(10, "the quick brown fox"), (11, "zeta xi upsilon tau")],
        "doc_id long, text string",
    )
    batch = sorted(map(tuple, bigram_lm_scores(ref, scored).collect()))
    stream = sorted(
        map(
            tuple,
            bigram_lm_maintain_stream(
                spark, ref, scored, n_slices=3
            ).collect(),
        )
    )
    assert stream == batch
    assert len(batch) == 2


def test_kn_bigram_scores_matches_python_reference(spark):
    """The engine's KN scores must equal a direct Python
    reimplementation of the declared model (D = 3/4 absolute
    discount, continuation interpolation, full backoff to Pcont for
    unseen w1, exact floor-log2 with 16 scale bits) over a fixture
    exercising every branch: seen pair, unseen pair under a seen w1
    (with and without a seen continuation), and unseen w1."""
    import re as _re

    from yelp_streaming_etl_pipeline_spark.operators.corpus_quality import (
        kn_bigram_scores,
    )

    ref_rows = [(1, "a b a b c b"), (2, "a b d")]
    scored_rows = [
        (10, "a b a"),     # seen pairs + seen pair (b,a)? -> branches
        (11, "a c"),       # unseen pair, seen w1, seen continuation c
        (12, "a z"),       # unseen pair, seen w1, unseen continuation
        (13, "z b"),       # unseen w1, seen continuation b
        (14, "z q"),       # unseen w1, unseen continuation
    ]

    def words(t):
        return [w for w in _re.split(r"\s+", t.strip().lower()) if w]

    bigs: dict = {}
    for _, t in ref_rows:
        ws = words(t)
        for a, b in zip(ws, ws[1:]):
            bigs[(a, b)] = bigs.get((a, b), 0) + 1
    cu: dict = {}
    n1l: dict = {}
    n1r: dict = {}
    for (a, b), c in bigs.items():
        cu[a] = cu.get(a, 0) + c
        n1l[a] = n1l.get(a, 0) + 1
        n1r[b] = n1r.get(b, 0) + 1
    T = max(len(bigs), 1)

    def q(w1, w2):
        if w1 in cu:
            c = bigs.get((w1, w2), 0)
            num = max(4 * c - 3, 0) * T + 3 * n1l[w1] * n1r.get(w2, 0)
            den = 4 * cu[w1] * T
        else:
            num = n1r.get(w2, 0)
            den = T
        return len(bin(max((num << 16) // den, 1))) - 2 - 17

    expected = {}
    for d, t in scored_rows:
        ws = words(t)
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            continue
        qs = [q(a, b) for a, b in pairs]
        oov = sum(1 for a, b in pairs if (a, b) not in bigs)
        ksum = sum(qs)
        expected[d] = (
            len(pairs), oov, ksum, ((-ksum) * 1000) // len(pairs)
        )

    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    scored = spark.createDataFrame(
        scored_rows, "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_bigrams"], r["n_oov"], r["kn_q_sum"],
            r["mbits_per_bigram"],
        )
        for r in kn_bigram_scores(ref, scored).collect()
    }
    assert got == expected, (got, expected)
    # discounting: the seen-pair doc scores fewer mbits than the
    # fully-OOV one, and the seen-continuation backoff beats the
    # unseen-continuation saturation
    assert got[10][3] < got[14][3]
    assert got[13][2] > got[14][2]


def test_kn_bigram_stream_equals_batch(spark):
    """KN maintenance over a 3-slice replay equals the batch scorer
    at the final epoch — discount mass, continuation fanins/fanouts
    and the type count all re-derive as the model grows."""
    from yelp_streaming_etl_pipeline_spark.operators.corpus_quality import (
        kn_bigram_maintain_stream,
        kn_bigram_scores,
    )

    ref = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown cat naps under the warm sun"),
            (3, "a slow green turtle walks past the quick fox"),
        ],
        "doc_id long, text string",
    )
    scored = spark.createDataFrame(
        [(10, "the quick brown fox"), (11, "zeta xi upsilon tau")],
        "doc_id long, text string",
    )
    batch = sorted(map(tuple, kn_bigram_scores(ref, scored).collect()))
    stream = sorted(
        map(
            tuple,
            kn_bigram_maintain_stream(
                spark, ref, scored, n_slices=3
            ).collect(),
        )
    )
    assert stream == batch
    assert len(batch) == 2


def test_score_roc_table_hand_fixture(spark):
    """Hand-checked confusion counts: 4 docs in 4 bins (step 8), flag
    BAD iff score >= thr; the per-threshold counts, single-ratio f1,
    and the NULL precision at the empty top threshold all match."""
    from yelp_streaming_etl_pipeline_spark.operators.corpus_quality import (
        score_roc_table,
    )

    df = spark.createDataFrame(
        [(5, False), (9, False), (17, True), (25, True)],
        "s long, y boolean",
    )
    got = {
        r["thr_score"]: r
        for r in score_roc_table(df, "s", "y").collect()
    }
    assert set(got) == {8, 16, 24, 32}
    assert (got[8]["tp"], got[8]["fp"], got[8]["fn"], got[8]["tn"]) == (
        2, 1, 0, 1,
    )
    assert got[8]["precision"] == round(2 / 3, 6)
    assert got[8]["recall"] == 1.0
    assert got[8]["f1"] == 0.8
    assert (got[16]["tp"], got[16]["fp"]) == (2, 0)
    assert got[16]["f1"] == 1.0
    assert (got[24]["tp"], got[24]["fn"]) == (1, 1)
    assert got[24]["f1"] == round(2 / 3, 6)
    assert got[32]["tp"] == 0 and got[32]["precision"] is None
    assert got[32]["recall"] == 0.0


def test_score_roc_table_clamps_to_last_bin(spark):
    """Scores past the bin range clamp into the final bin instead of
    overflowing the bounded table."""
    from yelp_streaming_etl_pipeline_spark.operators.corpus_quality import (
        ROC_BINS, ROC_STEP, score_roc_table,
    )

    df = spark.createDataFrame(
        [(10, False), (10 ** 9, True)], "s long, y boolean"
    )
    rows = score_roc_table(df, "s", "y").collect()
    assert len(rows) == 2
    assert max(r["thr_score"] for r in rows) == ROC_BINS * ROC_STEP


def test_quality_cut_mix_shift_hand_fixture(spark):
    """Per-group survival counts by hand: group A scores 5/9/17,
    group B scores 25/25 (step 8 -> bins 0,1,2 and 3,3); cumulative
    keep counts and fractions per threshold, per group."""
    from yelp_streaming_etl_pipeline_spark.operators.corpus_quality import (
        quality_cut_mix_shift,
    )

    df = spark.createDataFrame(
        [("A", 5), ("A", 9), ("A", 17), ("B", 25), ("B", 25)],
        "src string, s long",
    )
    got = {
        (r["src"], r["thr_score"]): (r["n_docs"], r["n_kept"], r["keep_frac"])
        for r in quality_cut_mix_shift(df, "s", "src").collect()
    }
    assert got[("A", 8)] == (3, 1, round(1 / 3, 6))
    assert got[("A", 16)] == (3, 2, round(2 / 3, 6))
    assert got[("A", 24)] == (3, 3, 1.0)
    assert got[("B", 32)] == (2, 2, 1.0)
    assert set(got) == {("A", 8), ("A", 16), ("A", 24), ("B", 32)}


def test_quality_quota_sample_hand_fixture(spark):
    """Threshold, allocation, and draw by hand: 10 docs, scores
    0..9 in group A (6 docs) and B (4 docs). Bins of 8 -> bin 0 holds
    scores 0..7 (8 docs), cum 8 >= 10/2 -> thr = 8. Survivors:
    scores < 8 = docs 0..7 (A: 0-5 = 6 docs, B: 6,7 = 2 docs).
    Budget 4 -> largest remainder over (6, 2): base (3, 1), floors
    sum to budget -> k = (3, 1); the drawn units are each group's
    md5-bottom-k of its survivors."""
    import hashlib

    from yelp_streaming_etl_pipeline_spark.operators.corpus_quality import (
        quality_quota_sample,
    )

    rows = [(i, i, "A" if i < 6 else "B") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, s long, src string")
    out = quality_quota_sample(df, "s", "src", "doc_id", budget=4).collect()
    assert all(r["thr_score"] == 8 for r in out)
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r["unit"])
    assert {g: r[0]["k_g"] for g, r in {
        g: [x for x in out if x["g"] == g] for g in by_g
    }.items()} == {"A": 3, "B": 1}
    assert len(by_g["A"]) == 3 and len(by_g["B"]) == 1

    def md5(u):
        return hashlib.md5(str(u).encode()).hexdigest()

    surv = {"A": [0, 1, 2, 3, 4, 5], "B": [6, 7]}
    for g, k in (("A", 3), ("B", 1)):
        want = sorted(surv[g], key=lambda u: (md5(u), u))[:k]
        assert sorted(by_g[g]) == sorted(want), (g, by_g[g], want)


def test_quality_quota_sample_total_budget_and_post_cut_mix(spark):
    """The sample is exactly min(budget, survivors) rows total, quotas
    follow the POST-cut mixture (a group whose docs all score above
    the cut gets quota 0), and no sampled unit scores above the cut."""
    from yelp_streaming_etl_pipeline_spark.operators.corpus_quality import (
        quality_quota_sample,
    )

    rows = (
        [(i, 1, "good") for i in range(8)]
        + [(100 + i, 9000, "junk") for i in range(8)]
    )
    df = spark.createDataFrame(rows, "doc_id long, s long, src string")
    out = quality_quota_sample(df, "s", "src", "doc_id", budget=6).collect()
    assert len(out) == 6
    assert {r["g"] for r in out} == {"good"}
    assert all(r["k_g"] == 6 for r in out)
    assert all(r["unit"] < 100 for r in out)
