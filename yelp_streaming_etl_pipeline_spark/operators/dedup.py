"""Deduplication operator family (north-star extension, SURVEY.md §7
Phase 4 / BASELINE.json LLM-data-pipeline ops).

The reference's only dedup is the streaming exact-key check
(/root/reference/streaming/faust_app.py:112-125, key = review_id:date).
A training-data pipeline needs the full family; each operator here is
designed for the 100 TB shape:

- exact_dedup         one hash-partition shuffle on the content hash;
                      map-side hash is cheap, survivors picked by
                      min-id (deterministic).
- minhash_lsh_pairs   shingle -> k salted-MinHash signatures -> banded
                      LSH keys -> candidate pairs via equi-join on the
                      band key (shuffle ~ n_docs * n_bands rows, NEVER
                      O(n^2)) -> exact Jaccard verification on the
                      candidates only.
- simhash_signatures  64-bit SimHash from token-hash bit sums — a pure
                      per-row map; near-dup = low Hamming distance.
- ngram_jaccard_pairs exact word-n-gram Jaccard within a blocking key
                      (source) — quadratic INSIDE the block only.
- embedding near-dup  see similarity.py (cosine >= tau within label
                      blocks).

Determinism notes (oracle parity): all hashing is md5-based (identical
in Spark and DuckDB); MinHash uses the lexicographic minimum of salted
md5 hex digests — a valid permutation family over a 128-bit space that
both engines order identically (lowercase-hex ASCII).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import stable_round

# MinHash/LSH parameters: 12 signatures in 4 bands of 3.
MINHASH_K = 12
LSH_BANDS = 4
LSH_ROWS_PER_BAND = 3
SHINGLE_N = 3  # word 3-grams


def content_hash(c: Column) -> Column:
    """Normalized content hash: md5 of lowercased, whitespace-collapsed
    text."""
    return F.md5(F.regexp_replace(F.lower(F.trim(F.coalesce(c, F.lit("")))), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup via content-hash groupBy: one row per distinct
    content, survivor = min id, with the duplicate count.

    100 TB shape: single shuffle keyed by the 128-bit hash; partial
    (map-side) min/count makes the shuffle carry one row per distinct
    hash per task.
    """
    return (
        df.select(
            content_hash(F.col(text_col)).alias("content_hash"),
            F.col(id_col).alias("_id"),
        )
        .groupBy("content_hash")
        .agg(
            F.min("_id").alias("survivor_id"),
            F.count("*").alias("n_copies"),
        )
    )


def word_shingles(c: Column, n: int = SHINGLE_N) -> Column:
    """Distinct word n-gram shingles as array<string>. Documents with
    fewer than n words get a single shingle = whole trimmed text."""
    words = F.split(F.trim(F.lower(c)), r"\s+")
    nw = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(1), nw - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.when(nw >= n, F.array_distinct(grams)).otherwise(
        F.array(F.trim(F.lower(c)))
    )


def minhash_signature(shingles: Column, k: int = MINHASH_K) -> Column:
    """array<string> of k MinHash signatures: for salt i, the
    lexicographically smallest md5(i ':' shingle)."""

    def salted(salt: str):
        # single-arg lambda: a 2-arg lambda would receive the array
        # INDEX as its second argument and shadow the salt
        return lambda s: F.md5(F.concat(F.lit(salt), s))

    return F.array(
        *[
            F.array_min(F.transform(shingles, salted(f"{i}:")))
            for i in range(k)
        ]
    )


def lsh_band_keys(sig: Column) -> Column:
    """array<string> of band keys: md5 of the concatenated signature
    rows in each band."""
    keys = []
    for b in range(LSH_BANDS):
        parts = [
            F.element_at(sig, b * LSH_ROWS_PER_BAND + r + 1)
            for r in range(LSH_ROWS_PER_BAND)
        ]
        keys.append(F.md5(F.concat_ws("|", F.lit(str(b)), *parts)))
    return F.array(*keys)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH + exact-Jaccard
    verification of the candidates.

    Scale shape: the expensive self-join is on the band key — each doc
    contributes LSH_BANDS rows, and only docs agreeing on an entire
    band collide, so the join output is ~(candidate pairs), not n^2.
    The exact Jaccard check then touches candidates only.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.col(text_col)).alias("shingles"),
    ).withColumn("sig", minhash_signature(F.col("shingles")))
    banded = base.select(
        "doc_id", "shingles", F.explode(lsh_band_keys(F.col("sig"))).alias("band_key")
    )
    left = banded.alias("a")
    right = banded.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    jac = inter.cast("double") / union.cast("double")
    return (
        cand.withColumn("jaccard", stable_round(jac, 6))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_signature(token_hashes: Column, bits: int = 64) -> Column:
    """64-bit SimHash as a bit-string column, from an array of token
    md5-hex digests (compute once per token, reuse for all 64 bits).

    Per token, the first 16 hex digits supply 64 deterministic bits;
    bit j contributes +1/-1 to accumulator j; the signature bit is 1
    iff the sum is positive. Pure per-row map (no shuffle) — the
    canonical petabyte-safe fingerprint.
    """
    hexmap = "0123456789abcdef"

    def bit_adder(di: int, sh: int):
        # per-token bit: ((hex digit value) >> shift) & 1 -> ±1
        def add(acc, h):
            return acc + (
                F.floor(
                    (F.instr(F.lit(hexmap), F.substring(h, di, 1)) - 1)
                    / F.lit(2**sh)
                )
                % 2
            ).cast("int") * 2 - 1

        return add

    bit_cols = []
    for j in range(bits):
        contrib = F.aggregate(
            token_hashes, F.lit(0), bit_adder(j // 4 + 1, 3 - (j % 4))
        )
        bit_cols.append(F.when(contrib > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bit_cols)


def token_md5s(c: Column) -> Column:
    """Distinct-token md5 digests for a text column."""
    tokens = F.array_distinct(
        F.split(F.trim(F.lower(F.coalesce(c, F.lit("")))), r"\s+")
    )
    return F.transform(tokens, lambda t: F.md5(t))


def simhash_table(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        simhash_signature(token_md5s(F.col(text_col))).alias("simhash"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str,
    n: int = 2,
    threshold: float = 0.3,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity between documents sharing a
    blocking key. Quadratic only within the block — the blocking key is
    the scale lever (at 100 TB: block on URL host, language, cluster id
    from LSH, ...)."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(block_col).alias("block"),
        word_shingles(F.col(text_col), n).alias("grams"),
    )
    a, b = base.alias("a"), base.alias("b")
    pairs = a.join(
        b,
        (F.col("a.block") == F.col("b.block"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = F.size(F.array_union(F.col("a.grams"), F.col("b.grams")))
    jac = inter.cast("double") / union.cast("double")
    return (
        pairs.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.block").alias("block"),
            stable_round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def with_synthetic_near_dups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Test-harness helper: union deterministic exact copies
    (doc_id % 31 == 0 -> +1_000_000) and near copies with a token
    appended (doc_id % 17 == 0 -> +2_000_000), so dedup operators have
    planted positives. Mirrored in oracles.sql_near_dup_corpus()."""
    exact = (
        df.filter(F.col(id_col) % 31 == 0)
        .withColumn(id_col, F.col(id_col) + F.lit(1_000_000))
    )
    near = (
        df.filter(F.col(id_col) % 17 == 0)
        .withColumn(id_col, F.col(id_col) + F.lit(2_000_000))
        .withColumn(text_col, F.concat(F.col(text_col), F.lit(" zq extra near dup token")))
    )
    return df.unionByName(exact).unionByName(near)
