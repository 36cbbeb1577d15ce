"""Time-series operators over the events stream: statistical outlier
detection and per-key exponential smoothing.

Extends the reference's single-threshold ``is_anomaly`` flag
(quality_engine.py:343 — ``score < 0.5``) to the statistical form a
metrics pipeline needs: z-scores against per-group moments, and an
EWMA drift signal per key.

ENGINE-EXACT MOMENTS — the variance trap. ``stddev()`` on doubles is
partial-aggregation-order dependent, so z-scores near the flag
boundary would flap between runs and engines. Both moments here are
exact integer aggregates of the scale-3-quantized value:

- sum via the hi/lo two-long split (functions/rounding.py) —
  order-independent, overflow-safe to ~9e12 rows per group;
- sum of squares via decimal(38,0) (q^2 <= 1e18/row at |value| <=
  1e6; the decimal sum is per-row-slower but this aggregate produces
  ONE row per group — not a hot path);

then mean/variance/z are derived in doubles with the SAME operation
order on both engines, so the |z| > 3 cut is bit-deterministic.

EWMA is a sequential recurrence (r = a*x + (1-a)*r), not a windowed
sum — floats make the fold order part of the semantics. The order is
pinned totally: per key, events sorted by (ts, event_id), seed =
first value, folded left in doubles with a = 0.125 (an exact binary
fraction). Spark folds a sorted collected array; DuckDB folds
``list(... ORDER BY ...)`` — identical IEEE op sequence, identical
result. 100 TB shape: one shuffle on the key, state = one key's
events (the same bound any per-key sequential pass needs); the
streaming twin of this shape is transformWithState.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import _B, _hi_lo, quantize, stable_round

ZSCORE_QS = 3  # 1e-3 value resolution
ZSCORE_CUT = 3.0
EWMA_ALPHA = 0.125  # exact binary fraction (1/8)


def zscore_anomalies(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    cut: float = ZSCORE_CUT,
) -> DataFrame:
    """Rows whose value deviates > ``cut`` standard deviations from
    their group's mean. Returns (event_id, group, value, zscore)."""
    v = F.col(value_col)
    q = quantize(v, ZSCORE_QS)
    hi, lo = _hi_lo(v, ZSCORE_QS)
    q2 = q.cast("decimal(19,0)") * q.cast("decimal(19,0)")
    stats = (
        events.groupBy(F.col(group_col).alias("g"))
        .agg(
            F.count("*").alias("n"),
            F.sum(hi).alias("s_hi"),
            F.sum(lo).alias("s_lo"),
            F.sum(q2).alias("s_q2"),
        )
        .select(
            "g",
            "n",
            (
                (
                    F.col("s_hi").cast("decimal(38,0)") * F.lit(_B)
                    + F.col("s_lo").cast("decimal(38,0)")
                ).cast("double")
                / F.col("n")
            ).alias("mean_q"),
            (F.col("s_q2").cast("double") / F.col("n")).alias("m2_q"),
        )
        # variance FIRST, positivity filter BEFORE sqrt: the exact
        # integer moments still cast to double before the subtraction,
        # so a near-constant group can yield a tiny NEGATIVE variance.
        # sqrt of that is NaN in Spark (and NaN > 0 under Spark's NaN
        # ordering, so NaN z-scores would leak through a std_q filter)
        # and an ERROR in DuckDB — filtering on var_q > 0 keeps both
        # engines on defined arithmetic.
        .select(
            "g",
            "mean_q",
            (F.col("m2_q") - F.col("mean_q") * F.col("mean_q")).alias(
                "var_q"
            ),
        )
        .filter(F.col("var_q") > 0)
        .select("g", "mean_q", F.sqrt(F.col("var_q")).alias("std_q"))
    )
    z = (q.cast("double") - F.col("mean_q")) / F.col("std_q")
    return (
        events.join(
            F.broadcast(stats), events[group_col] == stats["g"]
        )
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > cut)
        .select(
            "event_id",
            F.col(group_col),
            v.alias("value"),
            # stable_round's floor(x*m+0.5)/m is deterministic for
            # negative inputs too (rounds halves toward +inf) — the
            # oracle applies the identical formula
            stable_round(F.col("z"), 6).alias("zscore"),
        )
    )


def ewma_by_key(
    df: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    value_col: str = "value",
    alpha: float = EWMA_ALPHA,
) -> DataFrame:
    """Per-key EWMA with a totally pinned fold order. Returns
    (key, n_events, ewma)."""
    t1, t2 = order_cols
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(t1).alias("o1"),
                F.col(t2).alias("o2"),
                F.col(value_col).alias("x"),
            )
        )
    )
    a = F.lit(float(alpha))
    b = F.lit(float(1.0 - alpha))
    grouped = df.groupBy(F.col(key_col).alias("key")).agg(
        arr.alias("evs"), F.count("*").alias("n_events")
    )
    vals = F.transform(F.col("evs"), lambda s: s.getField("x"))
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.lit(0), F.size(vals) - 1)),
        F.element_at(vals, 1).cast("double"),
        lambda acc, x: a * x + b * acc,
    )
    return grouped.select(
        "key", "n_events", stable_round(ewma, 6).alias("ewma")
    )
