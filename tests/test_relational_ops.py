"""Behavior tests for the as-of join and binned range join on
planted frames where the expected matches are computable by hand."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from yelp_streaming_etl_pipeline_spark.operators import relational as REL


def _ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(100, 1, _ts(10)), (101, 1, _ts(20)), (102, 2, _ts(5))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(7, 1, _ts(10)), (8, 1, _ts(15)), (9, 2, _ts(6))],
        "event_id long, user_id long, ts timestamp",
    )
    out = REL.asof_join(
        left, right.select("user_id", "ts", "event_id"), "user_id",
        right_cols=("event_id",),
    ).collect()
    got = {r["event_id"]: (r["prior_event_id"], r["prior_ts"]) for r in out}
    # equal ts is inclusive: purchase at :10 sees the click at :10
    assert got[100] == (7, _ts(10))
    # latest of several earlier clicks wins
    assert got[101] == (8, _ts(15))
    # user 2's only click is after their purchase -> no match
    assert got[102] == (None, None)


def test_asof_join_right_tie_break(spark):
    # two clicks at the identical (user, ts): the max event_id wins,
    # deterministically, without any pre-dedup of the right side
    left = spark.createDataFrame(
        [(1, 1, _ts(20))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(5, 1, _ts(10)), (9, 1, _ts(10)), (7, 1, _ts(10))],
        "event_id long, user_id long, ts timestamp",
    )
    out = REL.asof_join(
        left, right.select("user_id", "ts", "event_id"), "user_id",
        right_cols=("event_id",),
    ).collect()
    assert out[0]["prior_event_id"] == 9


def test_asof_join_no_cross_key_leak(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(30))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(2, 9, _ts(10))], "event_id long, user_id long, ts timestamp"
    )
    out = REL.asof_join(
        left, right.select("user_id", "ts", "event_id"), "user_id",
        right_cols=("event_id",),
    ).collect()
    assert out[0]["prior_event_id"] is None


def test_interval_pairs_window_bounds(spark):
    clicks = spark.createDataFrame(
        [(1, 1, _ts(0)), (2, 1, _ts(9))],
        "event_id long, user_id long, ts timestamp",
    )
    purchases = spark.createDataFrame(
        [
            (10, 1, _ts(0)),        # gap 0: excluded (strictly after)
            (11, 1, _ts(4, 59)),    # 299s after click 1: included
            (12, 1, _ts(5)),        # exactly 300s: included (<=)
            (13, 1, _ts(5, 1)),     # 301s: excluded
            (14, 1, _ts(13)),       # 240s after click 2 (crosses bucket)
            (15, 2, _ts(1)),        # other user: excluded
        ],
        "event_id long, user_id long, ts timestamp",
    )
    out = REL.interval_pairs(clicks, purchases, "user_id", 300).collect()
    pairs = {(r["l_event_id"], r["r_event_id"]): r["gap_us"] for r in out}
    assert set(pairs) == {(1, 11), (1, 12), (2, 14)}
    assert pairs[(1, 12)] == 300_000_000
    # no duplicate pairs from the two-bucket probe
    assert len(out) == len(pairs)


def test_interval_pairs_no_dupes_same_bucket(spark):
    # left and right in the SAME bucket: the b+1 probe must not
    # produce a second copy of the pair
    clicks = spark.createDataFrame(
        [(1, 1, _ts(0, 10))], "event_id long, user_id long, ts timestamp"
    )
    purchases = spark.createDataFrame(
        [(2, 1, _ts(0, 20))], "event_id long, user_id long, ts timestamp"
    )
    out = REL.interval_pairs(clicks, purchases, "user_id", 300).collect()
    assert len(out) == 1 and out[0]["gap_us"] == 10_000_000
