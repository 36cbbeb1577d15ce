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

from pyspark.sql import DataFrame, Window
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
    max_events_per_key: int | None = None,
) -> DataFrame:
    """Per-key EWMA with a totally pinned fold order. Returns
    (key, n_events, ewma).

    CONTRACT — bounded key cardinality only: the pinned-order fold
    materializes ALL of a key's events into one in-memory array, so a
    key with ~1e8 events OOMs an executor. For unbounded / hot keys
    use :func:`ewma_by_key_segmented` (sqrt-bounded state, one extra
    shuffle, last-ulp FP divergence possible) or the streaming fold
    ``streaming/stateful.py::ewma_stream`` (2 scalars of state per
    key, bit-identical to this fold). ``max_events_per_key`` turns
    the contract into an ENFORCED guard: any key exceeding it raises
    instead of silently risking the executor."""
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
    if max_events_per_key is not None:
        grouped = grouped.filter(
            F.assert_true(
                F.col("n_events") <= F.lit(max_events_per_key),
                F.concat(
                    F.lit(
                        "ewma_by_key: key exceeds max_events_per_key="
                        f"{max_events_per_key} (hot key would "
                        "materialize unbounded state); use "
                        "ewma_by_key_segmented or ewma_stream. Got "
                    ),
                    F.col("n_events").cast("string"),
                ),
            ).isNull()
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


EWMA_SEGMENT_SIZE = 4096


def ewma_by_key_segmented(
    df: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    value_col: str = "value",
    alpha: float = EWMA_ALPHA,
    segment_size: int = EWMA_SEGMENT_SIZE,
) -> DataFrame:
    """Hot-key-safe per-key EWMA via ASSOCIATIVE SEGMENT COMPOSITION.

    EWMA is a linear recurrence, so every event is an affine
    transform of the running value: the seed event (rank 1) is
    ``r -> x_1`` i.e. the pair ``(A, B) = (0, x_1)``; every later
    event is ``r -> (1-a)*r + a*x`` i.e. ``((1-a), a*x)``. Affine
    pairs compose associatively —
    ``(A2, B2) ∘ (A1, B1) = (A2*A1, A2*B1 + B2)`` — so the fold
    splits into bounded segments:

    1. one shuffle+SORT per key assigns each event its pinned rank
       (row_number over (ts, event_id) — sorts SPILL, unlike a
       collect_list, so this pass is hot-key safe);
    2. per (key, segment of ``segment_size`` ranks): fold the ordered
       pair array — state ≤ segment_size structs;
    3. per key: fold the ordered SEGMENT pairs — state ≤
       ceil(n/segment_size) structs. The final B is the EWMA (A is
       zeroed by the seed's (0, x_1)).

    Per-task state is max(segment_size, n_key/segment_size): with the
    default 4096, a 10^8-event hot key folds 4096-element arrays and
    a 24k-element segment array — versus 10^8 structs in one array
    for the direct fold. Cost: two extra shuffles.

    ENGINE-EXACT, but NOT bit-identical to :func:`ewma_by_key`: the
    composition reassociates IEEE arithmetic, so results can differ
    from the direct fold in the last ulp (equal after the 6-decimal
    round in practice). The DuckDB twin (oracles) replays the IDENTICAL
    segmented op sequence — per-element pair build, in-order
    list_reduce compose at both levels — so cross-engine comparison is
    exact. Returns (key, n_events, ewma)."""
    t1, t2 = order_cols
    a = float(alpha)
    b = 1.0 - a
    w = Window.partitionBy(key_col).orderBy(t1, t2)
    x = F.col(value_col).cast("double")
    ev = df.select(
        F.col(key_col).alias("key"),
        F.row_number().over(w).alias("rn"),
        F.when(F.row_number().over(w) == 1, F.lit(0.0))
        .otherwise(F.lit(b))
        .alias("pa"),
        F.when(F.row_number().over(w) == 1, x)
        .otherwise(F.lit(a) * x)
        .alias("pb"),
    ).select(
        "key",
        "rn",
        ((F.col("rn") - 1) / segment_size).cast("long").alias("seg"),
        "pa",
        "pb",
    )

    def compose_fold(pairs_sorted):
        first = F.element_at(pairs_sorted, 1)
        rest = F.slice(
            pairs_sorted,
            2,
            F.greatest(F.lit(0), F.size(pairs_sorted) - 1),
        )
        return F.aggregate(
            rest,
            F.struct(
                first.getField("pa").alias("pa"),
                first.getField("pb").alias("pb"),
            ),
            lambda acc, p: F.struct(
                (p.getField("pa") * acc.getField("pa")).alias("pa"),
                (
                    p.getField("pa") * acc.getField("pb")
                    + p.getField("pb")
                ).alias("pb"),
            ),
        )

    seg_pairs = (
        ev.groupBy("key", "seg")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("rn", "pa", "pb"))
            ).alias("ps"),
            F.count("*").alias("n"),
        )
        .select(
            "key",
            "seg",
            "n",
            compose_fold(F.col("ps")).alias("sp"),
        )
    )
    return (
        seg_pairs.groupBy("key")
        .agg(
            F.sum("n").alias("n_events"),
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("seg").alias("rn"),
                        F.col("sp.pa").alias("pa"),
                        F.col("sp.pb").alias("pb"),
                    )
                )
            ).alias("sps"),
        )
        .select(
            "key",
            "n_events",
            stable_round(
                compose_fold(F.col("sps")).getField("pb"), 6
            ).alias("ewma"),
        )
    )


RESAMPLE_MINUTES = 60


def resample_ffill(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    every_minutes: int = RESAMPLE_MINUTES,
) -> DataFrame:
    """Per-key fixed-interval resampling with forward fill — the
    gap-fill staple every metrics/feature pipeline needs between raw
    events and models that assume a regular grid.

    Semantics (all deterministic, no float arithmetic introduced):
    - slot = ts floored to the interval (pure map, epoch integer
      division on non-negative micros — Spark div == DuckDB //);
    - per (key, slot) the LAST observation wins, totally ordered by
      (ts, tiebreak) so both engines pick the same row;
    - the grid spans each key's OWN [min_slot, max_slot] (a sparse
      key never drags a global range; grid rows come from exploding
      one sequence per key — |keys| input rows, not |events|);
    - gaps take the previous slot's value via last(ignorenulls) over
      (key, slot) — the same keyed shuffle the grid join just used,
      so the window adds no new exchange; leading gaps cannot exist
      (the grid starts at an observed slot).

    Returns (key, slot, value, n_obs, is_gap) — n_obs = observations
    folded into the slot, is_gap marks synthesized rows.

    Scale shape: one keyed shuffle for the slot aggregate, one for
    the per-key span, then grid join + window reuse the key
    partitioning. State per key is its slot count, not its event
    count."""
    step_us = every_minutes * 60 * 1_000_000
    slot = F.expr(
        f"timestamp_micros((unix_micros({ts_col}) div {step_us})"
        f" * {step_us})"
    )
    per_slot = (
        df.select(
            F.col(key_col).alias("key"),
            slot.alias("slot"),
            F.col(ts_col).alias("_ts"),
            F.col(tiebreak_col).alias("_tb"),
            F.col(value_col).alias("_v"),
        )
        .groupBy("key", "slot")
        .agg(
            F.max_by(
                F.col("_v"), F.struct(F.col("_ts"), F.col("_tb"))
            ).alias("v_last"),
            F.count("*").alias("n_obs"),
        )
    )
    spans = per_slot.groupBy("key").agg(
        F.min("slot").alias("lo"), F.max("slot").alias("hi")
    )
    grid = spans.select(
        "key",
        F.explode(
            F.expr(f"sequence(lo, hi, interval {every_minutes} minutes)")
        ).alias("slot"),
    )
    w = Window.partitionBy("key").orderBy("slot").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        grid.join(per_slot, ["key", "slot"], "left")
        .select(
            "key",
            "slot",
            F.last("v_last", ignorenulls=True).over(w).alias("value"),
            F.coalesce(F.col("n_obs"), F.lit(0).cast("long")).alias(
                "n_obs"
            ),
            F.col("n_obs").isNull().alias("is_gap"),
        )
    )


CUSUM_QS = 3         # 1e-3 value resolution, as zscore uses
CUSUM_SLACK_Q = 500  # slack k = 0.5 value units, quantized
CUSUM_H_Q = 5000     # alarm threshold h = 5.0 value units, quantized


def cusum_changepoints(
    df: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, str] = ("ts", "event_id"),
    value_col: str = "value",
    slack_q: int = CUSUM_SLACK_Q,
    h_q: int = CUSUM_H_Q,
    max_events_per_key: int | None = None,
) -> DataFrame:
    """Page's two-sided CUSUM changepoint detector per key — the
    sequential drift alarm zscore (a point detector) cannot give:
    small persistent shifts accumulate until either side crosses
    ``h_q``, which fires an alarm and resets that side (the standard
    restart form).

    Exact-integer end to end: values quantized at 1e-3, the key mean
    is the floor integer division sum_q div n (non-negative inputs,
    so Spark div == DuckDB //), and every fold step is integer
    max/add — no float enters the recurrence, so alarm counts are
    bit-deterministic across engines and partitionings.

    Fold order pinned like ewma_by_key: per key sorted by
    (ts, event_id). DECLARED SEED SEMANTICS: the first observation
    initializes zero state and contributes no step (DuckDB's
    list_reduce uses the first element as the seed; Spark mirrors by
    folding from the second element with a zero-state seed —
    identical step sequence on both engines).

    Same bounded-key contract as ewma_by_key (the fold materializes
    one key's events); use ``max_events_per_key`` to enforce.

    Returns (key, n_events, n_alarms, max_cusum_pos, max_cusum_neg)
    with the CUSUM maxima in quantized units (BIGINT)."""
    t1, t2 = order_cols
    q = quantize(F.col(value_col), CUSUM_QS)
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(t1).alias("o1"),
                F.col(t2).alias("o2"),
                q.alias("q"),
            )
        )
    )
    grouped = df.groupBy(F.col(key_col).alias("key")).agg(
        arr.alias("evs"),
        F.count("*").alias("n_events"),
        F.sum(q).alias("_sum_q"),
    )
    if max_events_per_key is not None:
        grouped = grouped.filter(
            F.assert_true(
                F.col("n_events") <= F.lit(max_events_per_key)
            ).isNull()
        )
    grouped = grouped.withColumn(
        "_mu", F.expr("_sum_q div n_events")
    )
    vals = F.transform(F.col("evs"), lambda s: s.getField("q"))
    zero = F.lit(0).cast("long")
    seed = F.struct(
        zero.alias("cp"),
        zero.alias("cn"),
        zero.alias("al"),
        zero.alias("mcp"),
        zero.alias("mcn"),
    )
    mu = F.col("_mu")
    sk = F.lit(int(slack_q)).cast("long")
    h = F.lit(int(h_q)).cast("long")

    def step(acc, x):
        cp_raw = F.greatest(zero, acc.getField("cp") + (x - mu - sk))
        cn_raw = F.greatest(zero, acc.getField("cn") + (mu - x - sk))
        alarm_p = (cp_raw >= h).cast("long")
        alarm_n = (cn_raw >= h).cast("long")
        return F.struct(
            F.when(cp_raw >= h, zero).otherwise(cp_raw).alias("cp"),
            F.when(cn_raw >= h, zero).otherwise(cn_raw).alias("cn"),
            (acc.getField("al") + alarm_p + alarm_n).alias("al"),
            F.greatest(acc.getField("mcp"), cp_raw).alias("mcp"),
            F.greatest(acc.getField("mcn"), cn_raw).alias("mcn"),
        )

    fold = F.aggregate(
        F.slice(vals, 2, F.greatest(F.lit(0), F.size(vals) - 1)),
        seed,
        step,
    )
    return grouped.select(
        "key",
        "n_events",
        fold.getField("al").alias("n_alarms"),
        fold.getField("mcp").alias("max_cusum_pos"),
        fold.getField("mcn").alias("max_cusum_neg"),
    )
