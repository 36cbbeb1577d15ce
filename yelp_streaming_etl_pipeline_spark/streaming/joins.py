"""Stream-stream interval join (extension — the reference has no
stream joins at all, SURVEY.md §2.6).

The canonical attribution shape: purchases join the clicks that
preceded them within an attribution window, both sides unbounded
streams. Watermarks on BOTH sides + the interval condition let Spark
bound the join state: a click older than (watermark - window) can
never match a future purchase and is evicted.

Scale shape: one shuffle per side keyed by user_id; state per live
(user, window) only — the interval predicate is what keeps this from
being an unbounded cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIBUTION_WINDOW = "30 minutes"
JOIN_WATERMARK = "1 hour"


def attribute_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = ATTRIBUTION_WINDOW,
    watermark: str = JOIN_WATERMARK,
) -> DataFrame:
    """clicks(user_id, click_ts, click_id) x purchases(user_id,
    purchase_ts, purchase_id, amount) -> every (purchase, prior click
    within the window) pair."""
    c = clicks.withWatermark("click_ts", watermark).alias("c")
    p = purchases.withWatermark("purchase_ts", watermark).alias("p")
    return p.join(
        c,
        F.expr(
            f"""
            c.user_id = p.user_id AND
            c.click_ts <= p.purchase_ts AND
            c.click_ts >= p.purchase_ts - INTERVAL {window}
            """
        ),
    ).select(
        F.col("p.user_id").alias("user_id"),
        F.col("p.purchase_id").alias("purchase_id"),
        F.col("p.purchase_ts").alias("purchase_ts"),
        F.col("p.amount").alias("amount"),
        F.col("c.click_id").alias("click_id"),
        F.col("c.click_ts").alias("click_ts"),
    )


def attribute_purchases_semi(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = ATTRIBUTION_WINDOW,
    watermark: str = JOIN_WATERMARK,
) -> DataFrame:
    """LEFT SEMI variant: each purchase that has ANY prior click in
    the window emits exactly once — match-existence filtering without
    the per-click fan-out of the inner join (the shape attribution
    GATES use, where downstream only needs "was attributed", not the
    click list). Same state story as the inner join: both sides keep
    watermark-bounded interval state; a purchase emits in the batch
    its first matching click is visible."""
    c = clicks.withWatermark("click_ts", watermark).alias("c")
    p = purchases.withWatermark("purchase_ts", watermark).alias("p")
    return p.join(
        c,
        F.expr(
            f"""
            c.user_id = p.user_id AND
            c.click_ts <= p.purchase_ts AND
            c.click_ts >= p.purchase_ts - INTERVAL {window}
            """
        ),
        "left_semi",
    ).select(
        F.col("p.user_id").alias("user_id"),
        F.col("p.purchase_id").alias("purchase_id"),
        F.col("p.purchase_ts").alias("purchase_ts"),
        F.col("p.amount").alias("amount"),
    )


def attribute_purchases_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = ATTRIBUTION_WINDOW,
    watermark: str = JOIN_WATERMARK,
) -> DataFrame:
    """LEFT OUTER variant: every purchase emits — joined rows as they
    match in-batch, and a null-click row once the watermark proves no
    matching click can still arrive.

    Null-emission semantics (what the oracle twin mirrors): a
    purchase's state is evicted — and its null row emitted, in the
    final no-data micro-batch (`noDataMicroBatches` on by default) —
    when its event time falls below the GLOBAL watermark, which is
    the min over both inputs of (max observed event time, floored to
    milliseconds by Spark's event-time stats) minus the delay. A
    purchase younger than that stays in state unemitted at stream
    end: correct streaming behavior, deliberately preserved rather
    than flushed.

    Scale shape identical to the inner variant: one shuffle per side
    keyed by user_id, state bounded by the watermark horizon."""
    c = clicks.withWatermark("click_ts", watermark).alias("c")
    p = purchases.withWatermark("purchase_ts", watermark).alias("p")
    return p.join(
        c,
        F.expr(
            f"""
            c.user_id = p.user_id AND
            c.click_ts <= p.purchase_ts AND
            c.click_ts >= p.purchase_ts - INTERVAL {window}
            """
        ),
        "leftOuter",
    ).select(
        F.col("p.user_id").alias("user_id"),
        F.col("p.purchase_id").alias("purchase_id"),
        F.col("p.purchase_ts").alias("purchase_ts"),
        F.col("p.amount").alias("amount"),
        F.col("c.click_id").alias("click_id"),
        F.col("c.click_ts").alias("click_ts"),
    )


def attribute_purchases_full_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = ATTRIBUTION_WINDOW,
    watermark: str = JOIN_WATERMARK,
) -> DataFrame:
    """FULL OUTER variant — completes the stream-stream join matrix
    (inner / left outer / full outer): matches emit in-batch;
    unmatched PURCHASES emit a null-click row once the global
    watermark passes their event time (same bound as the left-outer
    variant); unmatched CLICKS emit a null-purchase row once the
    watermark proves no future purchase can attribute to them — a
    click at T only matches purchases in [T, T + window], and future
    events arrive at >= watermark, so the click side's state
    watermark is (global watermark - window). Both bounds are
    strict-less-than eviction on ms-floored event-time stats,
    mirrored exactly by the oracle twin.

    Scale shape unchanged: one shuffle per side on user_id; each
    side's state bounded by its own watermark horizon (clicks keep
    an extra `window` of history — that is the price of proving
    their non-attribution)."""
    c = clicks.withWatermark("click_ts", watermark).alias("c")
    p = purchases.withWatermark("purchase_ts", watermark).alias("p")
    return p.join(
        c,
        F.expr(
            f"""
            c.user_id = p.user_id AND
            c.click_ts <= p.purchase_ts AND
            c.click_ts >= p.purchase_ts - INTERVAL {window}
            """
        ),
        "fullOuter",
    ).select(
        F.coalesce(F.col("p.user_id"), F.col("c.user_id")).alias(
            "user_id"
        ),
        F.col("p.purchase_id").alias("purchase_id"),
        F.col("p.purchase_ts").alias("purchase_ts"),
        F.col("p.amount").alias("amount"),
        F.col("c.click_id").alias("click_id"),
        F.col("c.click_ts").alias("click_ts"),
    )
