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


class TestFunnelAndCohorts:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        )

    def test_funnel_strict_order(self, spark):
        from datetime import datetime as dt

        from yelp_streaming_etl_pipeline_spark.operators.relational import (
            event_funnel,
        )

        t = lambda h: dt(2024, 1, 1, h)
        rows = [
            # user 1 completes the funnel in order
            (1, t(1), 1, "view"), (2, t(2), 1, "click"), (3, t(3), 1, "purchase"),
            # user 2 purchases BEFORE clicking: reaches step 2 only
            (4, t(1), 2, "view"), (5, t(3), 2, "click"), (6, t(2), 2, "purchase"),
            # user 3 never views: reaches nothing
            (7, t(1), 3, "click"), (8, t(2), 3, "purchase"),
        ]
        out = {r["step"]: r for r in event_funnel(self._events(spark, rows)).collect()}
        assert out[1]["n_users"] == 2  # users 1 and 2 viewed
        assert out[2]["n_users"] == 2  # both clicked after viewing
        assert out[3]["n_users"] == 1  # only user 1 purchased after click
        assert out[3]["event_type"] == "purchase"

    def test_cohorts_offsets(self, spark):
        from datetime import datetime as dt

        from yelp_streaming_etl_pipeline_spark.operators.relational import (
            user_cohorts,
        )

        rows = [
            # user 1 first seen week of Jan 1 (Mon), active again 2 weeks on
            (1, dt(2024, 1, 2), 1, "view"),
            (2, dt(2024, 1, 16), 1, "view"),
            # user 2 same cohort, active only that week (twice — distinct)
            (3, dt(2024, 1, 3), 2, "view"),
            (4, dt(2024, 1, 4), 2, "click"),
        ]
        out = {
            (str(r["cohort_week"]), r["week_offset"]): r["n_active"]
            for r in user_cohorts(self._events(spark, rows)).collect()
        }
        assert out[("2024-01-01", 0)] == 2
        assert out[("2024-01-01", 2)] == 1
        assert len(out) == 2


class TestSaltedSkewJoin:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        ).withColumn("value", F.lit(1.0))

    def test_salted_join_equals_plain_join(self, spark):
        from datetime import datetime as dt

        from yelp_streaming_etl_pipeline_spark.operators.relational import (
            salted_skew_join,
        )

        # hot key: user 1 owns most rows (the skew case the salt spreads)
        rows = [(i, dt(2024, 1, 1, i % 24), 1, "view") for i in range(40)]
        rows += [(100, dt(2024, 1, 2), 2, "click"), (101, dt(2024, 1, 3), 2, "view")]
        ev = self._events(spark, rows)
        got = {
            (r["user_id"], r["event_type"]): (
                r["n_events"], r["first_seen"], r["lifetime_events"],
            )
            for r in salted_skew_join(ev, n_salts=4).collect()
        }
        # plain (unsalted) reference computed with straight DataFrame ops
        dim = ev.groupBy("user_id").agg(
            F.min("ts").alias("fs"), F.count("*").alias("le")
        )
        want = {
            (r["user_id"], r["event_type"]): (r["n"], r["fs"], r["le"])
            for r in ev.join(dim, "user_id")
            .groupBy("user_id", "event_type")
            .agg(F.count("*").alias("n"), F.min("fs").alias("fs"), F.min("le").alias("le"))
            .collect()
        }
        assert got == want
        assert got[(1, "view")][0] == 40 and got[(1, "view")][2] == 40


def test_salted_join_keeps_negative_ids(spark):
    from datetime import datetime as dt

    from pyspark.sql import functions as F

    from yelp_streaming_etl_pipeline_spark.operators.relational import (
        salted_skew_join,
    )

    # negative event_ids: % keeps sign in Spark, so without pmod the
    # salt lands outside the dim explode's range and rows vanish
    rows = [(-i, dt(2024, 1, 1, i % 24), 1, "view") for i in range(1, 9)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ).withColumn("value", F.lit(1.0))
    got = salted_skew_join(ev, n_salts=4).collect()
    assert len(got) == 1
    assert got[0]["n_events"] == 8
