"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

The reference has no custom state beyond its dedup/stats tables
(/root/reference/streaming/faust_app.py:77-91); this is the north-star
streaming extension — the operator family Spark's built-ins cannot
express (``session_window`` aggregates but cannot carry arbitrary
per-session state or emit on custom conditions).

Semantics (mirrors the batch operators/relational.py:sessionize_events):
events for a user belong to one session while consecutive gaps are
<= GAP; a longer gap closes the session. Closed sessions are emitted:

- in-batch / cross-batch: when a later event arrives whose gap from the
  open session's last event exceeds GAP, the old session is emitted and
  a new one opened (arbitrary-lateness handling is the watermark's job);
- by event-time timeout: a user silent past ``last_event + GAP`` once
  the watermark passes that point is flushed via ``state.hasTimedOut``
  — no arrival needed (this is what a windowed agg cannot do with
  custom per-session payloads).

Scale shape: ONE shuffle keyed by user_id; state is one small tuple per
open session per user, sharded across executors by the group key and
RocksDB-backed (session.py). Per-key batch data is tiny (a user's
events in one micro-batch), so the pandas concat is bounded.
"""

from __future__ import annotations

from typing import Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_GAP_SECONDS = 30 * 60  # matches the batch operator's 30-min gap
SESSION_WATERMARK = "10 minutes"

def session_output_schema(user_id_type) -> StructType:
    """Output schema, with user_id typed like the grouping column of
    the input stream (string test data, bigint fixture data)."""
    return StructType(
        [
            StructField("user_id", user_id_type),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", LongType()),
            StructField("session_value", DoubleType()),
        ]
    )

# open-session state: bounds in epoch-microseconds + running aggregates
SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("value", DoubleType()),
    ]
)


def _session_fn(
    key: Tuple[str], pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    user = key[0]
    closed: list[tuple] = []

    def gap_exceeded(last_us: int, t_us: int) -> bool:
        # whole-second truncation, matching the batch operator's
        # unix_timestamp(ts) - unix_timestamp(prev) > gap (and the
        # DuckDB oracle's date_diff('second', ...))
        return (t_us // 1_000_000) - (last_us // 1_000_000) > SESSION_GAP_SECONDS

    def to_frame(rows: list[tuple]) -> pd.DataFrame:
        return pd.DataFrame(
            [
                {
                    "user_id": user,
                    "session_start": pd.Timestamp(s, unit="us"),
                    "session_end": pd.Timestamp(e, unit="us"),
                    "n_events": n,
                    "session_value": v,
                }
                for (s, e, n, v) in rows
            ]
        )

    if state.hasTimedOut:
        if state.exists:
            closed.append(tuple(state.get))
            state.remove()
        if closed:
            yield to_frame(closed)
        return

    events = pd.concat(list(pdfs))
    events = events.sort_values("ts")
    ts_us = (events["ts"].astype("int64") // 1000).tolist()
    vals = events["value"].astype("float64").tolist()

    open_session = state.exists
    if open_session:
        start, last, n, value = state.get

    for t, v in zip(ts_us, vals):
        if not open_session:
            start, last, n, value = t, t, 1, v
            open_session = True
        elif gap_exceeded(last, t):
            closed.append((start, last, n, value))
            start, last, n, value = t, t, 1, v
        else:
            last, n, value = t, n + 1, value + v

    state.update((start, last, n, value))
    state.setTimeoutTimestamp(last // 1000 + SESSION_GAP_SECONDS * 1000)
    if closed:
        yield to_frame(closed)


DEDUP_TTL_SECONDS = 2 * 3600  # faust_app.py:77-80 (2-h state TTL)
DEDUP_WATERMARK = "2 hours"

DEDUP_OUTPUT = StructType(
    [
        StructField("review_id", StringType()),
        StructField("date", TimestampType()),
        StructField("business_id", StringType()),
        StructField("source", StringType()),
        StructField("is_duplicate", StringType()),  # 'first' | 'duplicate'
    ]
)

DEDUP_STATE = StructType([StructField("seen", LongType())])


def _dedup_fn(
    key: Tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    if state.hasTimedOut:
        # TTL expiry: drop the seen-marker; a re-arrival after this
        # point is treated as new — the reference's 2-h RocksDB TTL
        # semantics (faust_app.py:80)
        state.remove()
        return

    rows = pd.concat(list(pdfs)).sort_values(["source", "ingestion_timestamp"])
    seen = state.exists
    flags = []
    for _ in range(len(rows)):
        flags.append("duplicate" if seen else "first")
        seen = True
    state.update((1,))
    # expire the marker TTL past this key's event time
    key_date_ms = int(pd.Timestamp(key[1]).value // 1_000_000)
    state.setTimeoutTimestamp(key_date_ms + DEDUP_TTL_SECONDS * 1000)
    out = rows[["review_id", "date", "business_id", "source"]].copy()
    out["is_duplicate"] = flags
    yield out


def dedup_reviews_stream(reviews: DataFrame) -> DataFrame:
    """W1 streaming twin WITH duplicate-issue emission (the built-in
    ``dropDuplicatesWithinWatermark`` drops silently; the reference
    emits a ``duplicate`` issue per dropped record,
    faust_app.py:115-124). Key = (review_id, date); the 2-h event-time
    timeout bounds state exactly like the reference's RocksDB TTL.

    Returns every input row tagged 'first'/'duplicate'; route 'first'
    into the gauntlet and 'duplicate' into the issues sink."""
    return (
        reviews.withWatermark("date", DEDUP_WATERMARK)
        .groupBy("review_id", "date")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=DEDUP_OUTPUT,
            stateStructType=DEDUP_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def transform_with_state_available() -> bool:
    """transformWithStateInPandas needs google.protobuf for its state
    protocol; absent in this image (no installs per the environment
    contract), so the tws variant is gated, like the langdetect UDF."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def dedup_reviews_stream_tws(reviews: DataFrame) -> DataFrame:
    """dedup_reviews_stream on the transformWithState API (Spark 4's
    successor to applyInPandasWithState): typed ValueState for the
    seen-marker + an event-time TIMER for the 2-h TTL instead of the
    single implicit timeout. Same semantics, same output schema —
    kept alongside the classic implementation to cover both stateful
    APIs. Requires google.protobuf at runtime (see
    transform_with_state_available)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _DedupProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.seen = handle.getValueState("seen", "seen LONG")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            data = pd.concat(list(rows)).sort_values(
                ["source", "ingestion_timestamp"]
            )
            seen = self.seen.exists()
            flags = []
            for _ in range(len(data)):
                flags.append("duplicate" if seen else "first")
                seen = True
            self.seen.update((1,))
            key_date_ms = int(pd.Timestamp(key[1]).value // 1_000_000)
            self.handle.registerTimer(
                key_date_ms + DEDUP_TTL_SECONDS * 1000
            )
            out = data[
                ["review_id", "date", "business_id", "source"]
            ].copy()
            out["is_duplicate"] = flags
            yield out

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            self.seen.clear()
            return iter(())

        def close(self) -> None:
            pass

    return (
        reviews.withWatermark("date", DEDUP_WATERMARK)
        .groupBy("review_id", "date")
        .transformWithStateInPandas(
            statefulProcessor=_DedupProcessor(),
            outputStructType=DEDUP_OUTPUT,
            outputMode="append",
            timeMode="eventTime",
        )
    )


EWMA_ALPHA = 0.125  # exact binary fraction — matches the batch operator

# running fold: acc = EWMA of everything seen, n = events folded
# (n = 0 marks the unseeded state; the first value ever seeds acc)
EWMA_STATE = StructType(
    [StructField("acc", DoubleType()), StructField("n", LongType())]
)


def ewma_output_schema(key_type) -> StructType:
    return StructType(
        [
            StructField("key", key_type),
            StructField("n_events", LongType()),
            StructField("ewma", DoubleType()),
        ]
    )


def _ewma_fn(
    key: Tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    import math

    import pandas as pd

    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    vals = rows["value"].astype("float64").tolist()
    if state.exists:
        acc, n = state.get
    else:
        acc, n = 0.0, 0
    for x in vals:
        # same IEEE op sequence as the batch fold (timeseries.py) and
        # the DuckDB list_reduce: a*x + b*acc in doubles
        acc = x if n == 0 else EWMA_ALPHA * x + (1.0 - EWMA_ALPHA) * acc
        n += 1
    state.update((acc, n))
    if vals:
        # emit the running value, rounded like the batch operator
        # (stable_round: floor(x*1e6+0.5)/1e6); state keeps the
        # UNROUNDED acc so later batches continue the exact fold
        yield pd.DataFrame(
            [
                {
                    "key": key[0],
                    "n_events": n,
                    "ewma": math.floor(acc * 1e6 + 0.5) / 1e6,
                }
            ]
        )


def ewma_stream(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Streaming twin of operators/timeseries.py:ewma_by_key — the
    bounded-state sequential fold. The batch operator collects one
    key's FULL history into an array (exact, but a hot key with 1e9
    events is an executor OOM); here state is two scalars per key
    forever, so the hot-key ceiling disappears — the trade is that the
    fold order is arrival order across micro-batches (each batch is
    sorted by (ts, event_id) before folding). With per-key-ordered
    delivery — keyed Kafka partitions (the reference keys by
    business_id, producer.py:114) or key-partitioned staging files —
    the stream fold reproduces the batch fold bit-for-bit; the oracle
    gate runs it that way.

    Emits the running (key, n_events, ewma) per key per batch in
    UPDATE mode; a real sink upserts, so the latest row per key is
    the table."""
    return events.groupBy(key_col).applyInPandasWithState(
        _ewma_fn,
        outputStructType=ewma_output_schema(
            events.schema[key_col].dataType
        ),
        stateStructType=EWMA_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events(user_id, ts, value, ...) stream -> closed-session stream.

    Requires an event-time watermark for the timeout clock; emits in
    append mode (sessions are final when emitted)."""
    return (
        events.withWatermark("ts", SESSION_WATERMARK)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=session_output_schema(
                events.schema["user_id"].dataType
            ),
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
