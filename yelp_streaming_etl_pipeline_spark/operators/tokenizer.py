"""Distributed BPE tokenizer training (byte-pair-encoding merges).

The canonical LLM-pipeline operator the reference lacks entirely:
learn the top-N merge rules from a corpus. The classic algorithm
iterates (count adjacent pairs -> pick argmax -> merge greedily
left-to-right); here each iteration is a handful of DataFrame stages
over the DISTINCT-WORD frequency table — the standard trick that
makes BPE tractable at corpus scale, because pair statistics only
depend on (word, frequency), and the word table is orders of
magnitude smaller than the corpus.

Per merge iteration:
1. adjacent-pair counts: one index explode over the token arrays +
   one hash aggregate weighted by word frequency;
2. argmax pair with a pinned total tie order
   (count DESC, left ASC, right ASC) — a 1-row broadcast;
3. greedy merge application WITHOUT sequential folding: a matching
   position is VALID (merges) iff it is an even offset within its
   run of consecutive matching positions — for left != right runs
   are length 1 (every match valid); for left == right (e.g. "aaaa"
   with merge a+a) the even-offset rule IS the greedy left-to-right
   semantics. Runs come from one gaps-and-islands pass (row_number
   over match positions), so the whole application is windows +
   aggregates — engine-exact, no UDF, no recursion.

Words are restricted to lowercase ASCII (``^[a-z]+$``): character
splitting of multi-byte text differs subtly between engines, and the
demo's declared semantics is alphabetic BPE (real deployments
byte-encode first, which sidesteps the issue the same way).

100 TB shape: the corpus is touched ONCE (word-frequency aggregate);
every iteration runs over the distinct-word table (bounded by
vocabulary size, not corpus size). n_merges is a fixed constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BPE_MERGES = 4


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, f): lowercase ASCII-alpha word frequencies — the one
    corpus-wide aggregate."""
    words = docs.select(
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("w")
    )
    return (
        words.filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count("*").alias("f"))
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over token arrays, weighted by f."""
    n = F.size(F.col("toks"))
    idx = F.explode(F.sequence(F.lit(1), n - 1)).alias("i")
    pairs = vocab.filter(n >= 2).select("f", "toks", idx)
    return (
        pairs.select(
            F.element_at("toks", F.col("i")).alias("left"),
            F.element_at("toks", F.col("i") + 1).alias("right"),
            "f",
        )
        .groupBy("left", "right")
        .agg(F.sum("f").alias("pair_count"))
    )


def _apply_merge(vocab: DataFrame, best: DataFrame) -> DataFrame:
    """Greedily merge the broadcast (left, right) pair in every token
    array via the even-offset-in-run rule (see module docstring)."""
    pos = vocab.select(
        "w", "f", F.posexplode("toks").alias("i", "tok")
    ).crossJoin(F.broadcast(best.select("left", "right")))
    by_w = Window.partitionBy("w").orderBy("i")
    pos = pos.withColumn("nxt", F.lead("tok").over(by_w)).withColumn(
        "match",
        (F.col("tok") == F.col("left")) & (F.col("nxt") == F.col("right")),
    )
    match_rn = F.row_number().over(
        Window.partitionBy("w", "match").orderBy("i")
    )
    pos = pos.withColumn(
        "island", F.when(F.col("match"), F.col("i") - match_rn)
    )
    island_start = F.min("i").over(Window.partitionBy("w", "island"))
    pos = pos.withColumn(
        "valid",
        F.col("match") & ((F.col("i") - island_start) % 2 == 0),
    )
    pos = pos.withColumn(
        "consumed", F.coalesce(F.lag("valid").over(by_w), F.lit(False))
    )
    emitted = pos.filter(~F.col("consumed")).select(
        "w",
        "f",
        "i",
        F.when(
            F.col("valid"), F.concat(F.col("tok"), F.col("nxt"))
        ).otherwise(F.col("tok")).alias("tok"),
    )
    return emitted.groupBy("w", "f").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "tok"))),
            lambda s: s.getField("tok"),
        ).alias("toks")
    )


def bpe_learn(
    docs: DataFrame, text_col: str = "text", n_merges: int = BPE_MERGES
) -> tuple[DataFrame, DataFrame]:
    """Learn the top ``n_merges`` BPE merge rules. Returns
    (merges, final_vocab): merges = (merge_rank, left, right,
    pair_count) in learning order; final_vocab = (w, f, toks) with
    every word segmented under the learned rules — the table a
    tokenize pass joins against."""
    vocab = word_freq_table(docs, text_col).select(
        "w", "f", F.split("w", "").alias("toks")
    )
    merges: DataFrame | None = None
    for rank in range(n_merges):
        vocab = vocab.persist()
        best = (
            _pair_counts(vocab)
            .orderBy(
                F.desc("pair_count"), F.asc("left"), F.asc("right")
            )
            .limit(1)
            .withColumn("merge_rank", F.lit(rank))
            .persist()
        )
        merges = best if merges is None else merges.unionAll(best)
        vocab = _apply_merge(vocab, best)
    assert merges is not None
    return (
        merges.select("merge_rank", "left", "right", "pair_count"),
        vocab,
    )


def bpe_train(
    docs: DataFrame, text_col: str = "text", n_merges: int = BPE_MERGES
) -> DataFrame:
    """Learn the top ``n_merges`` BPE merge rules. Returns
    (merge_rank, left, right, pair_count) — one row per learned rule,
    in learning order."""
    return bpe_learn(docs, text_col, n_merges)[0]


def bpe_token_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = BPE_MERGES,
) -> DataFrame:
    """Tokenize the corpus under the learned merges: per document,
    the alpha-word count and total BPE token count. The apply pass is
    one explode + one broadcast-shaped join against the segmented
    word table (vocabulary-sized) + one hash aggregate — the corpus
    is never re-segmented row by row."""
    _, vocab = bpe_learn(docs, text_col, n_merges)
    sizes = vocab.select("w", F.size("toks").alias("nt"))
    doc_words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("w"),
    ).filter(F.col("w").rlike("^[a-z]+$"))
    return (
        doc_words.join(sizes, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("nt").alias("n_bpe_tokens"),
        )
    )
