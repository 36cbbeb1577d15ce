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
