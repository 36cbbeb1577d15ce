"""PII detection and redaction for LLM training-data pipelines.

Large-scale corpus preparation must strip personally-identifying
strings (emails, phone numbers, IP addresses, government IDs, card
numbers) before training. This module provides:

- ``pii_corpus`` — a deterministic PII-bearing corpus derived from the
  ``documents`` fixture (the fixture text is synthetic word salad with
  no natural PII, so realistic tokens are injected on a fixed per-
  ``doc_id`` schedule; the EXACT same derivation is declared in
  ``SQL_PII_CORPUS`` for the DuckDB oracle — both sides compute it
  independently).
- ``pii_profile`` — per-document match counts per category + flags.
- ``pii_redact`` — category-token replacement (``<EMAIL>`` etc.),
  applied in a fixed category order so overlapping matches resolve
  deterministically.

Scale shape: both operators are pure per-row maps — one
whole-stage-codegen projection over the scan, zero shuffles; 100 TB
cost = scan bandwidth. The regexes are evaluated JVM-side (no Python
UDF anywhere).

Regex dialect: every pattern below restricts itself to the syntax
subset where Java regex (Spark) and RE2 (DuckDB) agree — character
classes, bounded repetition, alternation, ASCII ``\\b`` word
boundaries; no lookaround, no backreferences.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---- category order is semantic: redaction applies top-to-bottom, so
# more-specific digit shapes (card 4-4-4-4, ssn 3-2-4) are consumed
# before the looser phone 3-3-4 can see their digits.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("card", r"\b\d{4}-\d{4}-\d{4}-\d{4}\b", "<CARD>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_corpus(docs: DataFrame) -> DataFrame:
    """Deterministic PII injection schedule over ``documents``.

    Mirrors SQL_PII_CORPUS exactly — any edit here must be mirrored
    there. Each congruence class appends one realistic token, so a
    document can carry 0..6 PII items and every category count varies
    across the corpus.
    """
    d = F.col("doc_id")

    def when_mod(m: int, col: Column) -> Column:
        return F.when(d % m == 0, col).otherwise(F.lit(""))

    text = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        when_mod(
            3, F.concat(F.lit(" contact user"), d, F.lit("@example.com"))
        ),
        when_mod(
            4,
            F.concat(
                F.lit(" call 555-"),
                (F.lit(100) + d % 900).cast("string"),
                F.lit("-"),
                (F.lit(1000) + d % 9000).cast("string"),
            ),
        ),
        when_mod(
            5,
            F.concat(
                F.lit(" from 192.168."),
                (d % 256).cast("string"),
                F.lit("."),
                ((d * 7) % 256).cast("string"),
            ),
        ),
        when_mod(
            7,
            F.concat(
                F.lit(" ssn "),
                (F.lit(100) + d % 900).cast("string"),
                F.lit("-"),
                (F.lit(10) + d % 90).cast("string"),
                F.lit("-"),
                (F.lit(1000) + d % 9000).cast("string"),
            ),
        ),
        when_mod(11, F.concat(F.lit(" see https://example.com/u/"), d)),
        when_mod(
            13,
            F.concat(
                F.lit(" card 4111-1111-1111-"),
                (F.lit(1000) + d % 9000).cast("string"),
            ),
        ),
    )
    return docs.select("doc_id", text.alias("text"))


# DuckDB CTE producing the identical corpus (documents view is
# pre-registered by the driver). Keep in lockstep with pii_corpus().
SQL_PII_CORPUS = """
SELECT doc_id,
  COALESCE(text, '')
  || CASE WHEN doc_id % 3 = 0
       THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
       ELSE '' END
  || CASE WHEN doc_id % 4 = 0
       THEN ' call 555-' || CAST(100 + doc_id % 900 AS VARCHAR)
            || '-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
       ELSE '' END
  || CASE WHEN doc_id % 5 = 0
       THEN ' from 192.168.' || CAST(doc_id % 256 AS VARCHAR)
            || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
       ELSE '' END
  || CASE WHEN doc_id % 7 = 0
       THEN ' ssn ' || CAST(100 + doc_id % 900 AS VARCHAR)
            || '-' || CAST(10 + doc_id % 90 AS VARCHAR)
            || '-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
       ELSE '' END
  || CASE WHEN doc_id % 11 = 0
       THEN ' see https://example.com/u/' || CAST(doc_id AS VARCHAR)
       ELSE '' END
  || CASE WHEN doc_id % 13 = 0
       THEN ' card 4111-1111-1111-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
       ELSE '' END
  AS text
FROM documents
"""


def pii_profile(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII category counts.

    Counts run against the ORIGINAL text for every category (profile
    is diagnostic; redaction order only matters when rewriting). One
    codegen'd projection, no shuffle.
    """
    c = F.col(text_col)
    counts = [
        F.regexp_count(c, F.lit(pat)) for _, pat, _ in PII_PATTERNS
    ]
    total = counts[0]
    for term in counts[1:]:
        total = total + term
    return corpus.select(
        "doc_id",
        *[
            cnt.alias(f"n_{name}")
            for cnt, (name, _, _) in zip(counts, PII_PATTERNS)
        ],
        total.alias("n_pii"),
        (total > 0).alias("has_pii"),
    )


def pii_redact(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace every PII match with its category token, in the fixed
    PII_PATTERNS order. Idempotent (tokens contain no digits or '@').
    """
    c: Column = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return corpus.select("doc_id", c.alias(text_col))
