"""Property-based tests (hypothesis): the Spark expression library vs
an independent pure-Python model of the DECLARED semantics (SURVEY.md
§2.3), over randomized ASCII corpora.

Alphabet is printable ASCII + \\t\\n: the declared tokenizer semantics
are Java/RE2 ``\\s``, which diverges from Python ``str.split`` on
exotic unicode whitespace — the engine's cross-engine ground truth is
the DuckDB oracle, and these properties pin the Python-model agreement
on the common alphabet.
"""

from __future__ import annotations

import math
import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from yelp_streaming_etl_pipeline_spark.functions import text_features as TF
from yelp_streaming_etl_pipeline_spark.operators import dedup as DD

ASCII_TEXT = st.text(
    alphabet=st.characters(
        min_codepoint=32, max_codepoint=126
    ) | st.sampled_from("\t\n"),
    max_size=200,
)


def stable_round_py(x: float, d: int) -> float:
    p = 10.0**d
    return math.floor(x * p + 0.5) / p


def py_words(s: str) -> list[str]:
    t = s.strip()
    return re.split(r"\s+", t) if t else []


def py_features(s: str) -> dict:
    words = py_words(s)
    n = len(s)
    nonspace = len(s.replace(" ", ""))
    stripped = [re.sub(r"^[.,!?;:]+|[.,!?;:]+$", "", w) for w in words]
    return {
        "word_count": len(words),
        "char_count": n,
        "sentence_count": max(1, len(re.findall(r"[.!?]", s))),
        "avg_word_length": (
            stable_round_py(sum(len(w) for w in stripped) / len(words), 2)
            if words
            else 0.0
        ),
        "caps_ratio": (
            stable_round_py(len(re.findall(r"[A-Z]", s)) / nonspace, 2)
            if nonspace
            else 0.0
        ),
        "digit_ratio": (
            stable_round_py(len(re.findall(r"[0-9]", s)) / n, 2) if n else 0.0
        ),
    }


@settings(max_examples=10, deadline=None)
@given(st.lists(ASCII_TEXT, min_size=1, max_size=40))
def test_text_features_match_python_model(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    c = F.col("t")
    rows = df.select(
        "i",
        TF.word_count(c).alias("word_count"),
        TF.char_count(c).alias("char_count"),
        TF.sentence_count(c).alias("sentence_count"),
        TF.avg_word_length(c).alias("avg_word_length"),
        TF.caps_ratio(c).alias("caps_ratio"),
        TF.digit_ratio(c).alias("digit_ratio"),
    ).collect()
    for r in rows:
        expected = py_features(texts[r["i"]])
        for k, v in expected.items():
            got = r[k]
            assert got == v, (k, texts[r["i"]], got, v)


@settings(max_examples=6, deadline=None)
@given(st.lists(ASCII_TEXT.filter(lambda s: s.strip()), min_size=2, max_size=12))
def test_simhash_is_token_set_invariant(spark, texts):
    """The signature depends only on the DISTINCT token set: permuting
    or repeating words must not change it."""
    def permuted(s: str) -> str:
        w = py_words(s.lower())
        return " ".join(list(reversed(w)) + w[:1])  # reorder + repeat

    base = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    perm = spark.createDataFrame(
        [(i, permuted(t)) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    sig_a = {
        r["doc_id"]: r["simhash"]
        for r in DD.simhash_table(base, "text", "doc_id").collect()
    }
    sig_b = {
        r["doc_id"]: r["simhash"]
        for r in DD.simhash_table(perm, "text", "doc_id").collect()
    }
    for i, t in enumerate(texts):
        # case-insensitive tokenization: compare against the lowered base
        if set(py_words(t.lower())) == set(py_words(permuted(t))):
            assert sig_a[i] == sig_b[i], t


@settings(max_examples=8, deadline=None)
@given(
    st.lists(ASCII_TEXT, min_size=1, max_size=40),
    st.integers(min_value=1, max_value=500),
)
def test_token_budget_pack_matches_python_model(spark, texts, budget):
    """Distributed prefix-sum packing == the sequential model: order by
    (md5(id), id), running token sum, shard = floor(start / budget)."""
    import hashlib

    from yelp_streaming_etl_pipeline_spark.operators.corpus import (
        token_budget_pack,
    )
    from yelp_streaming_etl_pipeline_spark.operators.text_analysis import (
        TOKEN_REGEX,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(7)
    got = {
        r["doc_id"]: (r["tokens"], r["cum_tokens"], r["shard_id"])
        for r in token_budget_pack(df, shard_budget=budget).collect()
    }

    tok_re = re.compile(TOKEN_REGEX)
    toks = {i: len(tok_re.findall(t or "")) for i, t in rows}
    order = sorted(
        toks, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )
    cum = 0
    for i in order:
        cum += toks[i]
        assert got[i] == (toks[i], cum, (cum - toks[i]) // budget), i
    assert len(got) == len(rows)
