"""Training-corpus assembly operators (SURVEY.md §7 extension family —
the reference stops at review cleaning; these are the operations an
LLM data pipeline runs downstream of it at 100 TB).

- ``token_budget_pack``: deterministic pseudo-random global order +
  exact prefix sum of token counts + shard assignment by token budget.
  The prefix sum is computed the scale-safe way: per-bucket windows
  plus a broadcast table of bucket offsets, never a single-partition
  global window.
- ``decontaminate``: flag corpus documents sharing any word n-gram
  with a benchmark/eval set (the contamination check run before
  training). Benchmark side is grams-distinct then broadcast; the
  corpus side streams through a map-side join — no corpus shuffle.
- ``training_corpus``: the end-to-end assembly — language filter,
  quality filter, exact dedup, decontamination, budget packing — as
  ONE composed lazy plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.lang_trigrams import with_trigram_lang_id
from .dedup import word_shingles
from .text_analysis import bpe_token_count, doc_fingerprint, text_quality_score

PACK_BUCKETS = 256  # bucket fan-out for the distributed prefix sum
DECON_NGRAM = 5  # word n-gram width for the contamination check


def _sort_key(id_col: Column) -> Column:
    """Deterministic pseudo-random global order: md5 of the id. Gives
    the shuffled document order training wants, reproducibly."""
    return F.md5(id_col.cast("string"))


def token_budget_pack(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_budget: int = 50_000,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign documents to token-budget shards: order the corpus by a
    deterministic hash, prefix-sum the per-document token counts, and
    give each document the shard its starting offset falls in
    (``floor(cum_before / shard_budget)``) — every shard carries
    ~shard_budget tokens.

    The 100 TB shape: a naive ``sum().over(Window.orderBy(...))`` is a
    SINGLE-PARTITION window — one task sorts the world. Instead the
    hash order is decomposed by its own first byte into
    ``PACK_BUCKETS`` ranges: each bucket prefix-sums locally (ordinary
    partitioned window), a PACK_BUCKETS-row aggregate of bucket totals
    is prefix-summed on one (metadata-sized) partition, and the bucket
    base offsets broadcast back. Ordering by (bucket, sort_key, id)
    equals ordering by (sort_key, id) because the bucket is a prefix
    of the sort key — so the result is bit-identical to the global
    window at any parallelism.
    """
    sk = _sort_key(F.col(id_col))
    base = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        sk.alias("_sk"),
        bpe_token_count(F.col(text_col)).cast("long").alias("tokens"),
    ).withColumn(
        "_bucket",
        F.conv(F.substring("_sk", 1, 2), 16, 10).cast("int"),
    )
    local_w = (
        Window.partitionBy("_bucket")
        .orderBy("_sk", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("_local_cum", F.sum("tokens").over(local_w))

    bucket_w = (
        Window.orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        base.groupBy("_bucket")
        .agg(F.sum("tokens").alias("_btok"))
        .withColumn("_base", F.sum("_btok").over(bucket_w) - F.col("_btok"))
        .select("_bucket", "_base")
    )

    cum = F.col("_base") + F.col("_local_cum")
    return (
        local.join(F.broadcast(offsets), "_bucket")
        .select(
            F.col(id_col),
            F.col("tokens"),
            cum.alias("cum_tokens"),
            F.floor((cum - F.col("tokens")) / F.lit(shard_budget))
            .cast("long")
            .alias("shard_id"),
            *[F.col(c) for c in carry_cols],
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DECON_NGRAM,
) -> DataFrame:
    """Benchmark-overlap check: a document is contaminated when it
    shares at least one word ``n``-gram with any benchmark document.
    Returns docs' ids + ``n_hits`` (distinct overlapping grams) +
    ``contaminated``.

    Scale shape: the benchmark side (an eval set — thousands of rows,
    not billions) collapses to DISTINCT grams and broadcasts; the
    corpus side explodes its grams into a map-side broadcast join, so
    the corpus is never shuffled by gram. The only corpus-keyed
    shuffle is the per-doc hit count."""
    bench_grams = (
        benchmark.select(
            F.explode(word_shingles(F.col(text_col), n)).alias("gram")
        )
        .distinct()
    )
    hits = (
        docs.select(
            F.col(id_col),
            F.explode(word_shingles(F.col(text_col), n)).alias("gram"),
        )
        .join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("n_hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("int").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def corpus_upsert(
    existing: DataFrame,
    incoming: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Delta for an incremental corpus append: the incoming documents
    that are neither exact duplicates (normalized-text fingerprint) of
    the existing corpus nor of each other (min-id survivor within the
    batch). Returns (id, text, fingerprint) of the accepted delta —
    what a pipeline appends, with first-seen-wins semantics across
    batches.

    Scale shape: one shuffle of the (small) incoming batch on its
    fingerprint; the existing side reduces to DISTINCT fingerprints
    before the anti join — at 100 TB that projection is the only thing
    read from the corpus (column pruning keeps payload bytes on disk),
    and a bloom-filter or bucketed layout on fingerprint turns the
    anti join into a pruned probe."""
    inc = incoming.select(
        F.col(id_col),
        F.col(text_col),
        doc_fingerprint(F.col(text_col)).alias("fingerprint"),
    )
    survivor = F.min(F.col(id_col)).over(Window.partitionBy("fingerprint"))
    fresh = inc.withColumn("_keep", F.col(id_col) == survivor).filter("_keep")
    seen = existing.select(
        doc_fingerprint(F.col(text_col)).alias("fingerprint")
    ).distinct()
    return fresh.join(seen, "fingerprint", "left_anti").select(
        id_col, text_col, "fingerprint"
    )


def ingest_stream_upsert(
    docs_stream: DataFrame,
    corpus_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Streaming incremental ingestion: each micro-batch is deduped
    against the corpus-so-far (corpus_upsert) and appended. State is
    the corpus itself — re-read per batch as DISTINCT fingerprints —
    so a restart resumes exactly from what was durably appended
    (at-least-once append + first-seen-wins makes replays harmless:
    a replayed batch's docs are already fingerprint-dups). Returns
    the unstarted DataStreamWriter."""
    spark = docs_stream.sparkSession

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        import os

        if os.path.isdir(corpus_dir) and any(
            f.endswith(".parquet") for f in os.listdir(corpus_dir)
        ):
            existing = spark.read.parquet(corpus_dir).select(
                F.col(id_col), F.col(text_col)
            )
        else:
            existing = spark.createDataFrame([], batch_df.schema).select(
                F.col(id_col), F.col(text_col)
            )
        delta = corpus_upsert(existing, batch_df, text_col, id_col)
        delta.write.mode("append").parquet(corpus_dir)

    return docs_stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )


def training_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    language: str = "en",
    min_lang_confidence: float = 0.5,
    min_quality: float = 0.5,
    shard_budget: int = 50_000,
) -> DataFrame:
    """End-to-end corpus build, one lazy plan: language gate (trigram
    classifier) -> quality gate -> exact dedup (normalized-text
    fingerprint, min-id survivor) -> decontamination -> token-budget
    shard packing. Returns (shard_id, doc_id, tokens, cum_tokens,
    quality_score)."""
    # cheap gate FIRST: quality is a handful of regexp counts; the
    # classifier (explode + join) then only scores survivors. The
    # filters are conjunctive, so ordering cannot change the result.
    quality_pass = docs.select(
        F.col(id_col),
        F.col(text_col),
        text_quality_score(F.col(text_col)).alias("quality_score"),
        doc_fingerprint(F.col(text_col)).alias("_fp"),
    ).filter(F.col("quality_score") >= min_quality)
    staged = with_trigram_lang_id(quality_pass, text_col, id_col).filter(
        (F.col("language") == language)
        & (F.col("language_confidence") >= min_lang_confidence)
    )

    # exact dedup: min-id survivor per normalized-text fingerprint
    survivor = F.min(F.col(id_col)).over(Window.partitionBy("_fp"))
    # persist: the surviving set feeds FOUR plan branches below
    # (decontamination grams + anti join + packing + the final join) —
    # without it each branch re-runs the classifier and gates
    unique = (
        staged.withColumn("_keep", F.col(id_col) == survivor)
        .filter("_keep")
        .persist()
    )

    clean = (
        unique.join(
            decontaminate(unique, benchmark, text_col, id_col).filter(
                "contaminated"
            ).select(id_col),
            id_col,
            "left_anti",
        )
    )

    return token_budget_pack(
        clean, text_col, id_col, shard_budget, carry_cols=("quality_score",)
    ).select("shard_id", id_col, "tokens", "cum_tokens", "quality_score")
