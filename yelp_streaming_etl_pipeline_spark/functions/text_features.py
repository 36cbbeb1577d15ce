"""Text-feature expressions (SURVEY.md §2.3 T1-T7).

Reference behavior: ``calculate_text_features``
(/root/reference/streaming/quality_engine.py:177-221) computes these
row-at-a-time in Python. Here each feature is a native ``Column``
expression: no UDFs, fully codegen'd, and each has a matching ANSI-SQL
oracle form (see __spark_entry__.oracle_sql).

Semantics preserved exactly:
- word_count: Python ``len(text.split())`` == count of whitespace-run
  separated tokens; empty/whitespace-only -> 0.
- sentence_count: ``max(1, #('.') + #('!') + #('?'))``.
- avg_word_length: mean over whitespace tokens of the token length
  after stripping leading/trailing ``.,!?;:`` chars; rounded to 2dp;
  0.0 when no words.
- caps_ratio: uppercase chars / non-space chars (space only, not all
  whitespace — matches the reference's ``replace(' ','')``), 2dp.
- punct_ratio: chars in ``.,!?;:'"()-`` / char_count, 2dp.
- digit_ratio: digits / char_count, 2dp.
All ratios guard division-by-zero to 0.0.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .rounding import stable_round

# Characters Python's str.strip('.,!?;:') removes from token edges
_EDGE_PUNCT = "[.,!?;:]"
# Punctuation class for punct_ratio — .,!?;:'"()- (reference set)
PUNCT_CLASS = "[.,!?;:'\"()\\-]"


def ws_trim(c: Column) -> Column:
    """Strip leading/trailing WHITESPACE (the semantics of Python's
    str.strip / str.split in the reference). Spark's trim() strips
    only the space character, so tab/newline-edged text would
    otherwise grow phantom empty tokens at split boundaries."""
    return F.regexp_replace(
        F.regexp_replace(F.coalesce(c, F.lit("")), r"^\s+", ""), r"\s+$", ""
    )


def word_count(c: Column) -> Column:
    t = ws_trim(c)
    return (
        F.when(c.isNull() | (F.length(t) == 0), F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
        .cast("int")
    )


def char_count(c: Column) -> Column:
    return F.coalesce(F.length(c), F.lit(0)).cast("int")


def sentence_count(c: Column) -> Column:
    n = F.regexp_count(F.coalesce(c, F.lit("")), F.lit(r"[.!?]"))
    return F.greatest(F.lit(1), n).cast("int")


def _stripped_word_lengths(c: Column) -> Column:
    """array<int> of per-token lengths after edge-punct strip."""
    words = F.split(ws_trim(c), r"\s+")
    stripped = F.transform(
        words,
        lambda w: F.length(
            F.regexp_replace(
                F.regexp_replace(w, f"^{_EDGE_PUNCT}+", ""),
                f"{_EDGE_PUNCT}+$",
                "",
            )
        ),
    )
    return stripped


def avg_word_length(c: Column) -> Column:
    lens = _stripped_word_lengths(c)
    total = F.aggregate(lens, F.lit(0), lambda acc, x: acc + x)
    n = F.size(lens)
    return (
        F.when(c.isNull() | (F.length(ws_trim(c)) == 0), F.lit(0.0))
        .otherwise(stable_round(total.cast("double") / n, 2))
        .cast("double")
    )


def caps_ratio(c: Column) -> Column:
    nonspace = F.length(F.regexp_replace(F.coalesce(c, F.lit("")), " ", ""))
    caps = F.regexp_count(F.coalesce(c, F.lit("")), F.lit("[A-Z]"))
    return (
        F.when(nonspace == 0, F.lit(0.0))
        .otherwise(stable_round(caps.cast("double") / nonspace, 2))
        .cast("double")
    )


def punct_ratio(c: Column) -> Column:
    n = F.length(c)
    punct = F.regexp_count(F.coalesce(c, F.lit("")), F.lit(PUNCT_CLASS))
    return (
        F.when(c.isNull() | (n == 0), F.lit(0.0))
        .otherwise(stable_round(punct.cast("double") / n, 2))
        .cast("double")
    )


def digit_ratio(c: Column) -> Column:
    n = F.length(c)
    digits = F.regexp_count(F.coalesce(c, F.lit("")), F.lit("[0-9]"))
    return (
        F.when(c.isNull() | (n == 0), F.lit(0.0))
        .otherwise(stable_round(digits.cast("double") / n, 2))
        .cast("double")
    )


def alpha_ratio(c: Column) -> Column:
    """Alphabetic-char ratio (used by the invalid_format guard F8,
    reference models.py:71-83). Not rounded — used as a predicate."""
    n = F.length(c)
    alpha = F.regexp_count(F.coalesce(c, F.lit("")), F.lit("[A-Za-z]"))
    return F.when(c.isNull() | (n == 0), F.lit(0.0)).otherwise(
        alpha.cast("double") / n
    )


def all_text_features(c: Column) -> dict[str, Column]:
    """The full T1-T7 feature block keyed by output column name."""
    return {
        "word_count": word_count(c),
        "char_count": char_count(c),
        "sentence_count": sentence_count(c),
        "avg_word_length": avg_word_length(c),
        "caps_ratio": caps_ratio(c),
        "punct_ratio": punct_ratio(c),
        "digit_ratio": digit_ratio(c),
    }
