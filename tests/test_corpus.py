"""Corpus-assembly operators: token-budget packing, decontamination,
end-to-end training-corpus build."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from yelp_streaming_etl_pipeline_spark.operators import corpus as C

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_token_budget_pack_matches_global_window_model(spark):
    docs = _docs(spark)
    got = {
        r["doc_id"]: (r["tokens"], r["cum_tokens"], r["shard_id"])
        for r in C.token_budget_pack(docs, shard_budget=5_000).collect()
    }

    # brute-force model: global order by (md5(id), id), running sum
    toks = {
        r["doc_id"]: r["t"]
        for r in docs.select(
            "doc_id",
            C.bpe_token_count(F.col("text")).cast("long").alias("t"),
        ).collect()
    }
    order = sorted(
        toks, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )
    cum = 0
    for doc_id in order:
        t = toks[doc_id]
        cum += t
        assert got[doc_id] == (t, cum, (cum - t) // 5_000), doc_id
    assert len(got) == len(toks)


def test_token_budget_pack_shards_near_budget(spark):
    budget = 5_000
    packed = C.token_budget_pack(_docs(spark), shard_budget=budget)
    sizes = {
        r["shard_id"]: r["s"]
        for r in packed.groupBy("shard_id")
        .agg(F.sum("tokens").alias("s"))
        .collect()
    }
    max_doc = packed.agg(F.max("tokens")).collect()[0][0]
    last = max(sizes)
    for sid, s in sizes.items():
        if sid != last:
            # a shard spans [sid*B, (sid+1)*B) of the token stream plus
            # at most one straddling document
            assert budget <= s + max_doc
            assert s <= budget + max_doc


def test_decontaminate_flags_exact_and_partial_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "totally different words with no overlap at all here"),
            (3, "prefix junk alpha beta gamma delta epsilon suffix junk"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["contaminated"], r["n_hits"])
        for r in C.decontaminate(docs, bench, n=5).collect()
    }
    assert got[1] == (True, 1)  # shares the 5-gram
    assert got[2] == (False, 0)
    assert got[3] == (True, 1)  # contains it mid-document
    assert len(got) == 3


def test_decontaminate_self_overlap_on_fixture(spark):
    docs = _docs(spark)
    bench = docs.filter(F.col("doc_id") % 101 == 0)
    got = C.decontaminate(docs, bench)
    # every benchmark doc long enough to have >= 1 shingle of its own
    # must flag itself
    bench_flagged = got.join(
        bench.select("doc_id"), "doc_id"
    ).filter("NOT contaminated")
    assert bench_flagged.count() == 0
    # and the corpus is not all-contaminated
    assert got.filter("NOT contaminated").count() > 0


def test_training_corpus_end_to_end_invariants(spark):
    docs = _docs(spark)
    bench = docs.filter(F.col("doc_id") % 101 == 0)
    out = C.training_corpus(docs, bench, shard_budget=5_000).cache()
    n = out.count()
    assert n > 0
    # no contaminated doc survived
    contaminated = {
        r["doc_id"]
        for r in C.decontaminate(docs, bench).filter("contaminated").collect()
    }
    assert not contaminated & {r["doc_id"] for r in out.collect()}
    # no duplicate normalized fingerprints among survivors
    fps = (
        docs.join(out.select("doc_id"), "doc_id")
        .select(C.doc_fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .count()
        .filter("count > 1")
        .count()
    )
    assert fps == 0
    # shard ids are dense from 0
    sids = sorted(r["shard_id"] for r in out.select("shard_id").distinct().collect())
    assert sids[0] == 0 and sids == list(range(len(sids)))
    out.unpersist()


def test_corpus_upsert_delta_semantics(spark):
    existing = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        ["doc_id", "text"],
    )
    incoming = spark.createDataFrame(
        [
            (10, "ALPHA   beta GAMMA"),  # normalized dup of doc 1
            (11, "eta theta iota"),      # genuinely new
            (12, "eta  THETA iota"),     # in-batch dup of 11 (11 wins)
            (13, "kappa lambda mu"),     # new
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"] for r in C.corpus_upsert(existing, incoming).collect()
    }
    assert got == {11, 13}


def test_streaming_ingest_upsert_dedups_across_batches(spark, tmp_path):
    """Two micro-batches with overlapping content: the corpus ends with
    one row per distinct fingerprint, first seen wins, and a replayed
    batch adds nothing (at-least-once append is harmless)."""
    corpus_dir = str(tmp_path / "corpus")
    src = str(tmp_path / "src")
    import os

    os.makedirs(src)

    def write_batch(name, rows):
        spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(
            1
        ).write.mode("overwrite").parquet(f"{src}/{name}")

    b1 = [(1, "alpha beta gamma"), (2, "delta epsilon zeta")]
    b2 = [
        (20, "alpha BETA gamma"),   # dup of 1 across batches
        (21, "nu xi omicron"),      # new
    ]

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(f"{src}/*")

    write_batch("b1", b1)
    q = (
        C.ingest_stream_upsert(
            stream, corpus_dir, str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    write_batch("b2", b2)
    q = (
        C.ingest_stream_upsert(
            stream, corpus_dir, str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    corpus = spark.read.parquet(corpus_dir)
    ids = {r["doc_id"] for r in corpus.collect()}
    assert ids == {1, 2, 21}  # 20 deduped against 1; first seen won
    fps = corpus.groupBy("fingerprint").count().filter("count > 1").count()
    assert fps == 0

    # replay the same batch content as new files -> no growth
    write_batch("b1_replay", b1)
    q = (
        C.ingest_stream_upsert(
            stream, corpus_dir, str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.read.parquet(corpus_dir).count() == 3


def test_dsir_importance_ranks_target_like_docs_higher(spark):
    """DSIR hand fixture: raw docs sharing the target's vocabulary
    must out-score off-domain docs; dsir_topk selects exactly them."""
    from pyspark.sql import functions as F

    from yelp_streaming_etl_pipeline_spark.operators import corpus as CP

    target = spark.createDataFrame(
        [(i, "the dog runs fast and the dog barks loud") for i in range(1, 6)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (101, "the dog barks loud near the park"),
            (102, "the cat sleeps all day on the mat"),
            (103, "dog runs fast dog barks dog dog"),
            (104, "quantum flux capacitors reverse polarity now"),
        ],
        "doc_id long, text string",
    )
    scores = {
        r["doc_id"]: r["dsir_score"]
        for r in CP.dsir_importance(raw, target).collect()
    }
    assert set(scores) == {101, 102, 103, 104}
    assert min(scores[101], scores[103]) > max(scores[102], scores[104])
    top = [r["doc_id"] for r in CP.dsir_topk(raw, target, k=2).collect()]
    assert sorted(top) == [101, 103]


def test_dsir_importance_deterministic_and_integer(spark):
    """Scores are exact integers, stable across recomputation."""
    from yelp_streaming_etl_pipeline_spark.operators import corpus as CP

    docs = spark.createDataFrame(
        [(i, f"token{i % 5} filler text number {i}") for i in range(20)],
        "doc_id long, text string",
    )
    raw = docs.filter("doc_id % 2 = 0")
    tgt = docs.filter("doc_id % 2 = 1")
    a = sorted(map(tuple, CP.dsir_importance(raw, tgt).collect()))
    b = sorted(map(tuple, CP.dsir_importance(raw, tgt).collect()))
    assert a == b and len(a) == 10
    assert all(isinstance(r[2], int) for r in a)


def test_dsir_quota_sample_matches_python_composition(spark):
    """The full chain — shift by the corpus min, keep-high threshold
    over the binned table, largest-remainder allocation over post-cut
    per-source counts, md5 bottom-k draw — recomputed in Python from
    the ENGINE's own dsir_importance scores must reproduce the
    operator's row set exactly."""
    import hashlib

    from yelp_streaming_etl_pipeline_spark.operators import corpus as CP

    rows = [
        (
            i,
            " ".join(
                f"tok{(i * 7 + j) % 9}" for j in range(6 + i % 5)
            ),
            "A" if i % 3 else "B",
        )
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    raw = docs.filter("doc_id % 2 = 0")
    tgt = docs.filter("doc_id % 2 = 1")
    budget, step, n_bins = 6, 8, 1024
    got = sorted(
        tuple(r)
        for r in CP.dsir_quota_sample(raw, tgt, budget=budget).collect()
    )

    scores = {
        r["doc_id"]: r["dsir_score"]
        for r in CP.dsir_importance(raw, tgt).collect()
    }
    grp = {i: g for i, _, g in rows if i % 2 == 0}
    mn = min(scores.values())
    shifted = {d: s - mn for d, s in scores.items()}
    bins: dict = {}
    for s in shifted.values():
        b = min(n_bins - 1, s // step)
        bins[b] = bins.get(b, 0) + 1
    total = sum(bins.values())
    cum, thr_shift = 0, None
    for b in sorted(bins, reverse=True):
        cum += bins[b]
        if 2 * cum >= total:
            thr_shift = b * step
            break
    surv: dict = {}
    for d, s in shifted.items():
        if s >= thr_shift:
            surv.setdefault(grp[d], []).append(d)
    wtot = sum(len(v) for v in surv.values())
    base = {g: budget * len(v) // wtot for g, v in surv.items()}
    rem = {g: (budget * len(v)) % wtot for g, v in surv.items()}
    extra = budget - sum(base.values())
    for g in sorted(surv, key=lambda g: (-rem[g], g))[:extra]:
        base[g] += 1
    expected = []
    for g, units in surv.items():
        pick = sorted(
            units,
            key=lambda u: (hashlib.md5(str(u).encode()).hexdigest(), u),
        )[: base[g]]
        expected.extend((g, u, thr_shift + mn, base[g]) for u in pick)
    assert got == sorted(expected), (got, sorted(expected))
    assert len(got) == budget  # the fixture fills the whole budget
    assert len({r[0] for r in got}) == 2  # both sources sampled


def test_dsir_budget_pack_matches_naive_prefix_sum(spark):
    """The bin-decomposed prefix sum must be bit-identical to the
    naive (dsir_score DESC, doc_id) global order: recompute
    cum_tokens and the kept verdict in Python from the operator's own
    (score, tokens) columns and require exact equality; the fixture
    budget must split the corpus (some kept, some cut)."""
    from yelp_streaming_etl_pipeline_spark.operators import corpus as CP

    rows = [
        (
            i,
            " ".join(
                f"tok{(i * 11 + j) % 13}" for j in range(5 + (i * 3) % 9)
            ),
        )
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    raw = docs.filter("doc_id % 2 = 0")
    tgt = docs.filter("doc_id % 2 = 1")
    budget = 90
    got = {
        r["doc_id"]: r
        for r in CP.dsir_budget_pack(
            raw, tgt, token_budget=budget
        ).collect()
    }
    order = sorted(
        got.values(), key=lambda r: (-r["dsir_score"], r["doc_id"])
    )
    cum = 0
    for r in order:
        start = cum
        cum += r["tokens"]
        assert r["cum_tokens"] == cum, (r, cum)
        assert r["kept"] == (start < budget), r
    kept = sum(1 for r in got.values() if r["kept"])
    assert 0 < kept < len(got)


def test_dsir_maintain_stream_equals_batch(spark):
    """Streaming DSIR maintenance: the final epoch's scores equal
    batch dsir_importance over all arrived raw docs — the per-bucket
    weights and the corpus-size constant are re-derived per epoch
    (they move with raw totals), so arrival order cannot matter, and
    the early epochs' scores are genuinely revised (a doc scored in
    epoch 1 re-scores when epoch 3's grams shift c_r)."""
    from yelp_streaming_etl_pipeline_spark.operators import corpus as CP

    rows = [
        (
            i,
            " ".join(
                f"tok{(i * 7 + j) % 9}" for j in range(6 + i % 5)
            ),
        )
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    raw = docs.filter("doc_id % 2 = 0")
    tgt = docs.filter("doc_id % 2 = 1")
    batch = sorted(
        tuple(r) for r in CP.dsir_importance(raw, tgt).collect()
    )
    stream = sorted(
        tuple(r)
        for r in CP.dsir_maintain_stream(
            spark, raw, tgt, n_slices=3
        ).collect()
    )
    assert stream == batch and len(batch) == 20


def test_dsir_mixture_pack_stream_equals_batch(spark):
    """Streaming mixture-pack maintenance equals batch
    dsir_mixture_pack at the final epoch: token counts and source
    labels fix at arrival while source budgets, packing order and
    kept verdicts re-derive per epoch."""
    from yelp_streaming_etl_pipeline_spark.operators import corpus as CP

    rows = [
        (
            i,
            " ".join(
                f"tok{(i * 7 + j) % 11}" for j in range(4 + (i * 5) % 9)
            ),
            ["A", "B", "C"][i % 3],
        )
        for i in range(48)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    raw = docs.filter("doc_id % 2 = 0")
    tgt = docs.filter("doc_id % 2 = 1")
    batch = sorted(
        tuple(r)
        for r in CP.dsir_mixture_pack(raw, tgt, token_budget=60).collect()
    )
    stream = sorted(
        tuple(r)
        for r in CP.dsir_mixture_pack_maintain_stream(
            spark, raw, tgt, token_budget=60, n_slices=3
        ).collect()
    )
    assert stream == batch and len(batch) == 24


def test_dsir_mixture_pack_matches_python_composition(spark):
    """The full mixture composition — largest-remainder token-budget
    allocation over per-source token mass, then the per-source
    bin-decomposed prefix sum — recomputed in Python from the
    ENGINE's own (score, tokens) columns must match exactly: the
    per-source cum_tokens follows (dsir_score DESC, doc_id) order,
    budgets sum to the total, and kept == (start < budget_g)."""
    from yelp_streaming_etl_pipeline_spark.operators import corpus as CP

    rows = [
        (
            i,
            " ".join(
                f"tok{(i * 7 + j) % 11}" for j in range(4 + (i * 5) % 9)
            ),
            ["A", "B", "C"][i % 3],
        )
        for i in range(60)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    raw = docs.filter("doc_id % 2 = 0")
    tgt = docs.filter("doc_id % 2 = 1")
    budget = 80
    got = {
        r["doc_id"]: r
        for r in CP.dsir_mixture_pack(
            raw, tgt, token_budget=budget
        ).collect()
    }
    # allocation: largest remainder over per-source token totals
    toks_by_g: dict = {}
    for r in got.values():
        toks_by_g[r["g"]] = toks_by_g.get(r["g"], 0) + r["tokens"]
    wtot = sum(toks_by_g.values())
    base = {g: budget * w // wtot for g, w in toks_by_g.items()}
    rem = {g: (budget * w) % wtot for g, w in toks_by_g.items()}
    extra = budget - sum(base.values())
    for g in sorted(toks_by_g, key=lambda g: (-rem[g], g))[:extra]:
        base[g] += 1
    assert sum(base.values()) == budget
    # per-source importance-first prefix sum + kept rule
    kept_total = 0
    for g in toks_by_g:
        members = sorted(
            (r for r in got.values() if r["g"] == g),
            key=lambda r: (-r["dsir_score"], r["doc_id"]),
        )
        cum = 0
        for r in members:
            start = cum
            cum += r["tokens"]
            assert r["cum_tokens"] == cum, (r, cum)
            assert r["budget_g"] == base[g], (r, base)
            assert r["kept"] == (start < base[g]), r
            kept_total += r["kept"]
    assert 0 < kept_total < len(got)
    assert len(toks_by_g) == 3  # all three sources represented
