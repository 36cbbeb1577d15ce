"""CDC compaction and SCD2 interval behavior on planted histories."""

from __future__ import annotations

import datetime as dt

from yelp_streaming_etl_pipeline_spark.operators import cdc as CDC


def _ts(minute: int):
    return dt.datetime(2024, 1, 1, 0, minute)


def _history(spark):
    rows = [
        (1, 1, _ts(10), "a"),
        (2, 1, _ts(20), "b"),
        (3, 1, _ts(20), "c"),  # same ts as 2: event_id breaks the tie
        (4, 2, _ts(5), "x"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, state string"
    )


def test_compact_latest_picks_max_order(spark):
    out = CDC.compact_latest(
        _history(spark), ["user_id"], ["ts", "event_id"]
    ).collect()
    got = {r["user_id"]: (r["event_id"], r["state"]) for r in out}
    assert got == {1: (3, "c"), 2: (4, "x")}


def test_scd2_intervals_chain(spark):
    out = CDC.scd2_intervals(
        _history(spark), ["user_id"], "ts", "event_id"
    ).collect()
    by_id = {r["event_id"]: r for r in out}
    assert by_id[1]["valid_from"] == _ts(10)
    assert by_id[1]["valid_to"] == _ts(20)
    assert not by_id[1]["is_current"]
    # tie chain: 2 -> 3 at the same ts, 3 is current
    assert by_id[2]["valid_to"] == _ts(20)
    assert by_id[3]["valid_to"] is None and by_id[3]["is_current"]
    assert by_id[4]["is_current"]
    # intervals tile the history: every non-current valid_to equals
    # some same-user valid_from
    for r in out:
        if r["valid_to"] is not None:
            assert any(
                o["user_id"] == r["user_id"] and o["valid_from"] == r["valid_to"]
                for o in out
            )
