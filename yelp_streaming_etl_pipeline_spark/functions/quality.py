"""Quality-score expressions (SURVEY.md §2.3 Q1-Q7, F4 spam detection).

Reference behavior: ``QualityEngine`` scoring stack
(/root/reference/streaming/quality_engine.py:29-147) computed per-row
in Python. Re-expressed as native Column arithmetic so Catalyst folds
it into one whole-stage-codegen'd projection.

Replicate-or-fix ledger applied (SURVEY.md §8):
- Freshness (Q3): the reference's decay branch is dead code
  (quality_engine.py:100-101 returns 0.0 for everything younger than
  5 years). We implement the evident intent: 1.0 decaying to 0.5 at
  30 days, then to 0.0 at 5 years; future dates -> 0.0.
- Spam all-caps check (Q4): dead in the reference (text lowercased at
  quality_engine.py:117 before isupper at :134). Fixed to intent:
  checked against the ORIGINAL text.
- Consistency weight (Q5): reference defines weight 0.20 but never
  computes the component (models.py:188) — max achievable score is
  0.80. We replicate the 4-component sum because the downstream
  is_anomaly < 0.5 threshold is calibrated against it.

"now" is parameterized (never ``current_timestamp()``) so results are
deterministic and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .rounding import stable_round
from .patterns import (
    REPEAT4_RUN,
    SPAM_PATTERNS,
    SPAM_PUNCT_CLASS,
)

# Quality weights, /root/reference/streaming/models.py:185-191
W_COMPLETENESS = 0.25
W_VALIDITY = 0.25
W_FRESHNESS = 0.10
W_SPAM = 0.20
# (consistency 0.20 declared but never computed — see module docstring)

TEXT_MIN_LEN = 10
TEXT_MAX_LEN = 5000
FRESH_FULL_HOURS = 720.0  # 30 days
FRESH_MAX_HOURS = 43800.0  # 5 years
ANOMALY_THRESHOLD = 0.5
LANG_CONFIDENCE_THRESHOLD = 0.8
SUPPORTED_LANGUAGES = ["en"]  # models.py:183


def spam_pattern_hits(text: Column) -> Column:
    """Number of the 5 spam patterns matching the lowercased text
    (F4, quality_engine.py:163-175)."""
    lc = F.lower(F.coalesce(text, F.lit("")))
    hit_terms = [
        F.when(lc.rlike(p), F.lit(1)).otherwise(F.lit(0)) for p in SPAM_PATTERNS
    ]
    total = hit_terms[0]
    for t in hit_terms[1:]:
        total = total + t
    return total


def is_spam_detected(text: Column) -> Column:
    """>=2 pattern hits -> spam (quality_engine.py:268-278)."""
    return spam_pattern_hits(text) >= 2


def completeness_score(
    review_id: Column,
    business_id: Column,
    user_id: Column,
    text: Column,
    rating: Column,
    date: Column,
    useful: Column,
    funny: Column,
    cool: Column,
) -> Column:
    """(present required / 6)*0.8 + (present optional / 3)*0.2
    (Q1, quality_engine.py:43-58)."""
    req = [review_id, business_id, user_id, text, rating, date]
    opt = [useful, funny, cool]
    req_present = sum_cols([c.isNotNull().cast("double") for c in req])
    opt_present = sum_cols([c.isNotNull().cast("double") for c in opt])
    return (req_present / F.lit(6.0)) * F.lit(0.8) + (
        opt_present / F.lit(3.0)
    ) * F.lit(0.2)


def sum_cols(cols: list[Column]) -> Column:
    total = cols[0]
    for c in cols[1:]:
        total = total + c
    return total


def validity_score(text: Column, rating: Column) -> Column:
    """Mean of text-length score and rating-range score
    (Q2, quality_engine.py:60-86)."""
    n = F.coalesce(F.length(text), F.lit(0))
    text_score = (
        F.when((n >= TEXT_MIN_LEN) & (n <= TEXT_MAX_LEN), F.lit(1.0))
        .when(n < TEXT_MIN_LEN, n.cast("double") / F.lit(float(TEXT_MIN_LEN)))
        .otherwise(F.lit(float(TEXT_MAX_LEN)) / n.cast("double"))
    )
    rating_score = (
        F.when(rating.isNull(), F.lit(0.0))
        .when((rating >= 1.0) & (rating <= 5.0), F.lit(1.0))
        .otherwise(F.lit(0.0))
    )
    return (text_score + rating_score) / F.lit(2.0)


def freshness_score(date: Column, now: Column) -> Column:
    """Piecewise decay on review age (Q3, fixed-to-intent — see module
    docstring). 1.0 -> 0.5 over the first 30 days, 0.5 -> 0.0 out to
    5 years, 0.0 for future dates and anything older."""
    age_h = (
        F.unix_timestamp(now) - F.unix_timestamp(date)
    ).cast("double") / F.lit(3600.0)
    return (
        F.when(date.isNull(), F.lit(0.0))
        .when(age_h < 0.0, F.lit(0.0))
        .when(
            age_h <= FRESH_FULL_HOURS,
            F.lit(1.0) - (age_h / F.lit(FRESH_FULL_HOURS)) * F.lit(0.5),
        )
        .when(
            age_h <= FRESH_MAX_HOURS,
            F.lit(0.5)
            * (
                F.lit(1.0)
                - (age_h - F.lit(FRESH_FULL_HOURS))
                / F.lit(FRESH_MAX_HOURS - FRESH_FULL_HOURS)
            ),
        )
        .otherwise(F.lit(0.0))
    )


def spam_score(text: Column, original_text: Column | None = None) -> Column:
    """Start at 1.0, subtract penalties, clamp to [0,1]
    (Q4, quality_engine.py:113-147). ``original_text`` is the
    pre-lowercase text used for the all-caps check (fixed-to-intent)."""
    if original_text is None:
        original_text = text
    lc = F.lower(F.coalesce(text, F.lit("")))
    n = F.coalesce(F.length(text), F.lit(0))
    hits = spam_pattern_hits(text).cast("double")

    punct = F.regexp_count(lc, F.lit(SPAM_PUNCT_CLASS))
    punct_pen = F.when(
        (n > 0) & (punct.cast("double") / n > 0.3), F.lit(0.3)
    ).otherwise(F.lit(0.0))

    orig = F.coalesce(original_text, F.lit(""))
    has_lower = F.regexp_count(orig, F.lit("[a-z]")) > 0
    has_upper = F.regexp_count(orig, F.lit("[A-Z]")) > 0
    caps_pen = F.when(
        (~has_lower) & has_upper & (n > 10), F.lit(0.4)
    ).otherwise(F.lit(0.0))

    runs = F.regexp_count(lc, F.lit(REPEAT4_RUN))
    runs_pen = F.when(runs > 2, F.lit(0.2)).otherwise(F.lit(0.0))

    digits = F.regexp_count(lc, F.lit("[0-9]"))
    digit_pen = F.when(
        (n > 0) & (digits.cast("double") / n > 0.3), F.lit(0.3)
    ).otherwise(F.lit(0.0))

    raw = (
        F.lit(1.0)
        - F.lit(0.3) * hits
        - punct_pen
        - caps_pen
        - runs_pen
        - digit_pen
    )
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), raw))


def data_quality_score(
    completeness: Column, validity: Column, freshness: Column, spam: Column
) -> Column:
    """Weighted 4-component sum, rounded to 2dp (Q5,
    quality_engine.py:29-41; weights models.py:185-191)."""
    return stable_round(
        F.lit(W_COMPLETENESS) * completeness
        + F.lit(W_VALIDITY) * validity
        + F.lit(W_FRESHNESS) * freshness
        + F.lit(W_SPAM) * spam,
        2,
    )


def is_anomaly(dq_score: Column) -> Column:
    """Q6: data_quality_score < 0.5 (quality_engine.py:343)."""
    return dq_score < ANOMALY_THRESHOLD
