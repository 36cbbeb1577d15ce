"""The validation gauntlet: validate -> repair -> score -> route.

Reference behavior: ``QualityEngine.clean_review``
(/root/reference/streaming/quality_engine.py:223-358) is a
short-circuiting guard chain evaluated row-at-a-time; each guard
rejects (emit issue, drop), repairs (truncate), or flags (emit issue,
keep). Routing in faust_app.py:131-170 sends accepted rows to
``cleaned_reviews`` and every issue to ``quality_issues``.

Spark-first redesign: ONE declarative pass computes every predicate as
a column; the reference's short-circuit *semantics* (first fatal issue
wins, flags before the fatal stage still emitted) are encoded as a
prioritized ``when`` chain over stage numbers — no imperative control
flow, so Catalyst fuses the whole gauntlet plus feature/score
computation into a single whole-stage-codegen projection over the scan.
At 100 TB this is a pure map stage: no shuffle, embarrassingly
parallel, limited only by scan bandwidth.

Guard order (quality_engine.py:226-358):
  1 missing text      -> reject  missing_value        sev 10
  2 missing rating    -> reject  missing_value        sev 10
      (rating == 0 conflates with missing — preserved quirk, §8.5)
  3 unsupported lang  -> reject  unsupported_language sev 8
  4 low confidence    -> FLAG    wrong_language       sev 6
  5 spam (>=2 pat.)   -> reject  spam_detected        sev 9
  6 too short (<10)   -> reject  too_short            sev 7
  7 too long (>5000)  -> REPAIR (truncate) + FLAG too_long sev 5
  8 rating out of 1-5 -> reject  out_of_range         sev 10
  9 alpha ratio <0.4  -> reject  invalid_format       sev 10
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import quality as Q
from ..functions import text_features as TF


def _issue(
    review_id: Column,
    issue_type: str,
    field_name: str,
    og_value: Column,
    expected_range: str,
    severity: int,
    now: Column,
) -> Column:
    return F.struct(
        review_id.alias("review_id"),
        F.lit(issue_type).alias("issue_type"),
        F.lit(field_name).alias("field_name"),
        og_value.cast("string").alias("og_value"),
        F.lit(expected_range).alias("expected_range"),
        F.lit(severity).cast("int").alias("severity"),
        now.alias("detected_at"),
        F.lit("validation").alias("detection_range"),
    )


def validate_reviews(df: DataFrame, now: Column) -> DataFrame:
    """Annotate a raw-review DataFrame with gauntlet verdicts.

    Input must carry ``language`` and ``language_confidence`` columns
    (attach via functions.language.with_lang_id, the langdetect UDF, or
    a trusted source column). Adds:

    - ``text_clean``     text after the too-long repair (truncation)
    - ``fatal_stage``    int stage number of the first fatal guard, or
                         null if accepted
    - ``is_accepted``    fatal_stage is null
    - ``issues``         array<struct> of every emitted issue (flags at
                         stages before the fatal stage + the fatal one)
    """
    text = F.col("text")
    rating = F.col("rating")
    rid = F.col("review_id")
    tlen = F.coalesce(F.length(text), F.lit(0))

    p1 = text.isNull() | (F.length(text) == 0)
    p2 = rating.isNull() | (rating == 0.0)
    p3 = ~F.col("language").isin(Q.SUPPORTED_LANGUAGES)
    p4 = F.col("language_confidence") < Q.LANG_CONFIDENCE_THRESHOLD
    spam_hits = Q.spam_pattern_hits(text)
    p5 = spam_hits >= 2
    p6 = tlen < Q.TEXT_MIN_LEN
    p7 = tlen > Q.TEXT_MAX_LEN
    p8 = ~((rating >= 1.0) & (rating <= 5.0))
    text_clean = F.when(p7, F.substring(text, 1, Q.TEXT_MAX_LEN)).otherwise(text)
    # whitespace-strip (reference validates the .strip()ped text,
    # models.py:71-83) — Spark trim() strips spaces only
    tc_ws = TF.ws_trim(text_clean)
    p9 = (F.length(tc_ws) == 0) | (TF.alpha_ratio(tc_ws) < 0.4)

    fatal_stage = (
        F.when(p1, F.lit(1))
        .when(p2, F.lit(2))
        .when(p3, F.lit(3))
        .when(p5, F.lit(5))
        .when(p6, F.lit(6))
        .when(p8, F.lit(8))
        .when(p9, F.lit(9))
        .otherwise(F.lit(None).cast("int"))
    )

    fatal_issue = (
        F.when(
            p1,
            _issue(rid, "missing_value", "text", F.lit(None), "non-empty", 10, now),
        )
        .when(
            p2,
            _issue(rid, "missing_value", "rating", rating, "1-5", 10, now),
        )
        .when(
            p3,
            _issue(
                rid,
                "unsupported_language",
                "text",
                F.col("language"),
                "en",
                8,
                now,
            ),
        )
        .when(
            p5,
            _issue(rid, "spam_detected", "text", spam_hits, "<2 patterns", 9, now),
        )
        .when(
            p6,
            _issue(rid, "too_short", "text", tlen, ">=10 chars", 7, now),
        )
        .when(
            p8,
            _issue(rid, "out_of_range", "rating", rating, "1-5", 10, now),
        )
        .when(
            p9,
            _issue(
                rid,
                "invalid_format",
                "text",
                F.lit(None),
                "alpha_ratio>=0.4",
                10,
                now,
            ),
        )
        .otherwise(F.lit(None))
    )

    # Non-fatal flags are emitted only if their stage is reached, i.e.
    # no earlier fatal stage fired (reference short-circuit semantics).
    # fs references the materialized fatal_stage COLUMN (see the
    # withColumn chain below) so the when-chain tree is declared once.
    fs = F.col("fatal_stage")
    wrong_lang_flag = F.when(
        p4 & (fs.isNull() | (fs > 4)),
        _issue(
            rid,
            "wrong_language",
            "text",
            F.col("language_confidence"),
            ">=0.8 confidence",
            6,
            now,
        ),
    ).otherwise(F.lit(None))
    too_long_flag = F.when(
        p7 & (fs.isNull() | (fs > 7)),
        _issue(rid, "too_long", "text", tlen, "<=5000 chars", 5, now),
    ).otherwise(F.lit(None))

    issues = F.filter(
        F.array(wrong_lang_flag, too_long_flag, fatal_issue),
        lambda x: x.isNotNull(),
    )

    return (
        df.withColumn("text_clean", text_clean)
        .withColumn("fatal_stage", fatal_stage)
        .withColumn("is_accepted", F.col("fatal_stage").isNull())
        .withColumn("issues", issues)
    )


def score_reviews(df: DataFrame, now: Column) -> DataFrame:
    """Add text features + quality scores computed on ``text_clean``
    (post-repair text, matching the reference which scores the cleaned
    review)."""
    tc = F.col("text_clean")
    feats = TF.all_text_features(tc)
    out = df
    for name, col in feats.items():
        out = out.withColumn(name, col)
    completeness = Q.completeness_score(
        F.col("review_id"),
        F.col("business_id"),
        F.col("user_id"),
        tc,
        F.col("rating"),
        F.col("date"),
        F.col("useful"),
        F.col("funny"),
        F.col("cool"),
    )
    validity = Q.validity_score(tc, F.col("rating"))
    freshness = Q.freshness_score(F.col("date"), now)
    spam = Q.spam_score(tc, original_text=F.col("text"))
    dq = Q.data_quality_score(completeness, validity, freshness, spam)
    # component scores stay internal subtrees of dq — materializing
    # them as extra columns doubles the expression tree (codegen
    # compile is the dominant fixed cost of this stage)
    return (
        out.withColumn("data_quality_score", dq)
        # reference the COLUMN, not the dq expression tree: keeps the
        # analyzed plan half the size (the optimizer inlines either
        # way, but analysis/compile cost tracks the authored tree)
        .withColumn("is_anomaly", Q.is_anomaly(F.col("data_quality_score")))
        .withColumn("is_spam", F.lit(False))
    )


def select_cleaned(scored: DataFrame, now: Column) -> DataFrame:
    """Project a scored gauntlet DataFrame (accepted rows) onto the
    CLEANED_REVIEW warehouse shape (init_db.sql:1-31 +
    postgres_sink.py:119-134 renames: useful -> useful_count etc.)."""
    return scored.select(
        "review_id",
        "business_id",
        "user_id",
        "rating",
        F.col("text_clean").alias("text"),
        "date",
        F.col("useful").alias("useful_count"),
        F.col("funny").alias("funny_count"),
        F.col("cool").alias("cool_count"),
        "word_count",
        "char_count",
        "sentence_count",
        "avg_word_length",
        "language",
        "language_confidence",
        "data_quality_score",
        "is_spam",
        "is_anomaly",
        "source",
        "ingestion_timestamp",
        now.alias("processing_timestamp"),
    )


def clean_reviews(
    df: DataFrame, now: Column
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Full gauntlet: returns (accepted, rejected, issues) — the
    reference's routing (faust_app.py:131-170) as three projections of
    ONE validated pass."""
    validated = validate_reviews(df, now)
    accepted = select_cleaned(
        score_reviews(validated.filter(F.col("is_accepted")), now), now
    )
    rejected = validated.filter(~F.col("is_accepted"))
    issues = validated.select(F.explode("issues").alias("i")).select("i.*")
    return accepted, rejected, issues
