"""Semantics tests for PII detection/redaction (operators/pii.py)."""

from __future__ import annotations

from yelp_streaming_etl_pipeline_spark.operators import pii as PII


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _row(df, doc_id):
    return {r["doc_id"]: r for r in df.collect()}[doc_id]


SAMPLE = (
    "reach me at jane.doe+spam@mail.example.org or 555-123-4567, "
    "server 10.0.254.3, card 4111-1111-1111-9999, ssn 123-45-6789, "
    "docs at https://internal.example.com/a?b=c#frag end"
)


class TestProfile:
    def test_counts_every_category(self, spark):
        r = _row(PII.pii_profile(_docs(spark, [(1, SAMPLE)])), 1)
        assert r["n_email"] == 1
        assert r["n_phone"] == 1
        assert r["n_ipv4"] == 1
        assert r["n_card"] == 1
        assert r["n_ssn"] == 1
        assert r["n_url"] == 1
        assert r["n_pii"] == 6
        assert r["has_pii"]

    def test_clean_text_all_zero(self, spark):
        r = _row(
            PII.pii_profile(_docs(spark, [(1, "nothing private here")])), 1
        )
        assert r["n_pii"] == 0
        assert not r["has_pii"]

    def test_card_not_double_counted_as_phone(self, spark):
        # 4-4-4-4 digit groups must not match the 3-3-4 phone shape
        r = _row(
            PII.pii_profile(_docs(spark, [(1, "pay 4111-2222-3333-4444")])),
            1,
        )
        assert r["n_card"] == 1
        assert r["n_phone"] == 0
        assert r["n_ssn"] == 0


class TestRedact:
    def test_tokens_replace_matches(self, spark):
        t = _row(PII.pii_redact(_docs(spark, [(1, SAMPLE)])), 1)["text"]
        for token in ("<EMAIL>", "<PHONE>", "<IP>", "<CARD>", "<SSN>", "<URL>"):
            assert token in t, t
        # nothing PII-shaped survives
        r = _row(PII.pii_profile(_docs(spark, [(1, t)])), 1)
        assert r["n_pii"] == 0

    def test_idempotent(self, spark):
        once = PII.pii_redact(_docs(spark, [(1, SAMPLE)]))
        twice = PII.pii_redact(once)
        assert _row(once, 1)["text"] == _row(twice, 1)["text"]

    def test_non_pii_text_untouched(self, spark):
        src = "plain text with numbers 12 34 and words"
        assert _row(PII.pii_redact(_docs(spark, [(1, src)])), 1)["text"] == src


class TestSynthCorpus:
    def test_injection_schedule(self, spark):
        docs = _docs(spark, [(i, f"base {i}") for i in range(60)])
        prof = {
            r["doc_id"]: r for r in PII.pii_profile(PII.pii_corpus(docs)).collect()
        }
        for i in range(60):
            assert prof[i]["n_email"] == (1 if i % 3 == 0 else 0)
            assert prof[i]["n_phone"] == (1 if i % 4 == 0 else 0)
            assert prof[i]["n_ssn"] == (1 if i % 7 == 0 else 0)
            assert prof[i]["n_card"] == (1 if i % 13 == 0 else 0)
        # url count: %11 link AND %3 email domain are distinct patterns;
        # the email regex must not also count as url
        assert prof[33]["n_url"] == 1  # 33 % 11 == 0 and % 3 == 0
        assert prof[33]["n_email"] == 1
