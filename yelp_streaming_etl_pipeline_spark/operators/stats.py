"""Windowed statistics aggregates (SURVEY.md §2.5 A1-A5).

Reference behavior: ``aggregate_stats``
(/root/reference/streaming/faust_app.py:173-189) keeps a per-hour
running dict {total, accepted, rejected, total_quality_score} in a
RocksDB table keyed by the hour-truncated event time; the full
``ReviewStats`` model (models.py:101-127) declares a much richer
aggregate (rating histogram, avgs, spam/wrong-language counts, optional
per-business grouping) that no reference code computes — we implement
the full declared aggregate (A3) as the flagship.

Fixed-to-intent (§8.4): the reference's ``rejected`` counter is never
incremented (the agent only consumes accepted rows); we aggregate from
the PRE-split stream so total/valid/rejected are all real.

Scale notes: a single hash-aggregate shuffle keyed by
(hour, business_id); Catalyst does map-side partial aggregation, so at
100 TB the shuffle carries only one partial row per (key, task) — this
is the canonical scalable shape. No windows-over-rows, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import exact_avg, exact_sum, stable_round


def hourly_stats(events: DataFrame) -> DataFrame:
    """A1+A2 analog over the generic events table: per event-hour
    totals, sum/avg of value (reference keys stats by hour-truncated
    event time, faust_app.py:177)."""
    return (
        events.groupBy(F.date_trunc("hour", F.col("ts")).alias("window_start"))
        .agg(
            F.count("*").alias("total"),
            exact_sum(F.col("value"), 2).alias("total_value"),
            exact_avg(F.col("value"), 6).alias("avg_value"),
        )
        .orderBy("window_start")
    )


def full_review_stats(
    staged: DataFrame, by_business: bool = True
) -> DataFrame:
    """A3: the full declared ReviewStats aggregate over the gauntlet's
    annotated output (validate_reviews + data_quality_score for
    accepted rows).

    Expects columns: date, business_id, rating, is_accepted,
    fatal_stage, issues (array), data_quality_score (null on rejected),
    word_count, sentence_count.
    """
    keys = [F.date_trunc("hour", F.col("date")).alias("window_start")]
    if by_business:
        keys.append(F.col("business_id"))

    acc = F.col("is_accepted")
    r = F.col("rating")

    def rating_count(v: int):
        return F.sum(
            F.when(acc & (r >= float(v)) & (r < float(v + 1)), 1).otherwise(0)
        ).alias(f"rating_{v}_count")

    has_wrong_lang = F.exists(
        F.col("issues"), lambda i: i["issue_type"] == "wrong_language"
    )

    out = (
        staged.groupBy(*keys)
        .agg(
            F.count("*").alias("total_reviews"),
            F.sum(acc.cast("long")).alias("valid_reviews"),
            F.sum((~acc).cast("long")).alias("rejected_reviews"),
            exact_avg(F.when(acc, F.col("data_quality_score")), 6).alias(
                "avg_quality_score"
            ),
            F.sum(
                F.when(F.col("fatal_stage") == 5, F.lit(1)).otherwise(F.lit(0))
            ).alias("spam_count"),
            F.sum(F.when(has_wrong_lang, F.lit(1)).otherwise(F.lit(0))).alias(
                "wrong_language_count"
            ),
            rating_count(1),
            rating_count(2),
            rating_count(3),
            rating_count(4),
            rating_count(5),
            exact_avg(F.when(acc, r), 6).alias("avg_rating"),
            exact_avg(F.when(acc, F.col("word_count")), 6).alias(
                "avg_word_count"
            ),
            exact_avg(F.when(acc, F.col("sentence_count")), 6).alias(
                "avg_sentence_count"
            ),
        )
        .withColumn(
            "window_end", F.col("window_start") + F.expr("INTERVAL 1 HOUR")
        )
    )
    cols = ["window_start", "window_end"]
    if by_business:
        cols.append("business_id")
    cols += [
        "total_reviews",
        "valid_reviews",
        "rejected_reviews",
        "avg_quality_score",
        "spam_count",
        "wrong_language_count",
        "rating_1_count",
        "rating_2_count",
        "rating_3_count",
        "rating_4_count",
        "rating_5_count",
        "avg_rating",
        "avg_word_count",
        "avg_sentence_count",
    ]
    return out.select(*cols)


def issue_type_counts(issues: DataFrame) -> DataFrame:
    """A4: frequency per issue type, desc
    (test_quality.py:43-54)."""
    return (
        issues.groupBy("issue_type")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.col("issue_type"))
    )


def acceptance_summary(staged: DataFrame) -> DataFrame:
    """A5: processed/accepted/rejected totals + acceptance rate
    (test_quality.py:46-49)."""
    return staged.agg(
        F.count("*").alias("processed"),
        F.sum(F.col("is_accepted").cast("long")).alias("accepted"),
        F.sum((~F.col("is_accepted")).cast("long")).alias("rejected"),
        # long sum of the 0/1 flags is exact; the single final division
        # is a fixed double op — order-independent by construction
        stable_round(
            F.sum(F.col("is_accepted").cast("long")).cast("double")
            / F.count("*")
            * 100.0,
            6,
        ).alias("acceptance_rate_pct"),
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def distinct_daily_users(events: DataFrame) -> DataFrame:
    """Distinct aggregation (absent from the reference): exact per-day
    distinct users. At scale countDistinct is a two-stage expand-agg;
    swap in approx_count_distinct (HLL) when exactness is negotiable."""
    return (
        events.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("distinct_users"),
        )
    )


def event_type_pivot(events: DataFrame) -> DataFrame:
    """PIVOT: per-day event counts, one column per event type. The
    value list is pinned so the output schema is static (required for
    a deterministic plan and for the oracle's CASE-sum twin)."""
    p = (
        events.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .count()
    )
    return p.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES],
    )


def value_percentiles(events: DataFrame) -> DataFrame:
    """Exact percentiles per event type (Spark `percentile` and DuckDB
    `quantile_cont` share the linear-interpolation definition —
    verified bit-identical)."""
    return events.groupBy("event_type").agg(
        stable_round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        stable_round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
    )


def props_extract_stats(events: DataFrame) -> DataFrame:
    """Semi-structured processing: pull a typed field out of the JSON
    props column (get_json_object stays JVM-side) and aggregate it.
    At scale prefer from_json with an explicit schema once the props
    shape stabilizes — same plan, fewer per-row parses for multi-field
    extraction."""
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            # exact long sum / count — not F.avg, whose double-typed sum
            # buffer is partial-agg-order dependent even for long input
            stable_round(
                F.sum("k").cast("double") / F.count(F.col("k")), 6
            ).alias("avg_k"),
        )
    )


def returning_users(events: DataFrame) -> DataFrame:
    """Set operation (INTERSECT): users active on both even and odd
    days of month — scale-independent split, one shuffle per distinct +
    the intersect's own."""
    even = (
        events.filter(F.dayofmonth("ts") % 2 == 0)
        .select("user_id")
        .distinct()
    )
    odd = (
        events.filter(F.dayofmonth("ts") % 2 == 1)
        .select("user_id")
        .distinct()
    )
    return even.intersect(odd)


def lapsed_users(events: DataFrame) -> DataFrame:
    """Set operation (EXCEPT): users active on even days of month but
    never on odd days — the anti twin of returning_users, same
    scale-independent split."""
    even = (
        events.filter(F.dayofmonth("ts") % 2 == 0)
        .select("user_id")
        .distinct()
    )
    odd = (
        events.filter(F.dayofmonth("ts") % 2 == 1)
        .select("user_id")
        .distinct()
    )
    return even.exceptAll(odd)


def sliding_hourly_stats(events: DataFrame) -> DataFrame:
    """Sliding-window aggregation: 1-hour windows advancing every 15
    minutes — each event lands in exactly 4 windows. Spark's window()
    does the fan-out BEFORE the shuffle (map-side explode), so the agg
    is still one exchange keyed by window start; output scales with
    |windows|, 4x the tumbling count, independent of input size."""
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            exact_sum(F.col("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )
