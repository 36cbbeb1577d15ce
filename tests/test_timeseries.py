"""z-score anomalies and per-key EWMA (operators/timeseries.py)."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from yelp_streaming_etl_pipeline_spark.operators.timeseries import (
    EWMA_ALPHA,
    ewma_by_key,
    zscore_anomalies,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )


def test_zscore_flags_planted_outlier(spark):
    t0 = datetime(2026, 8, 1)
    rows = [
        (i, t0 + timedelta(minutes=i), 1, "click", 10.0 + (i % 5) * 0.1)
        for i in range(100)
    ]
    rows.append((999, t0, 1, "click", 500.0))  # planted outlier
    out = zscore_anomalies(_events(spark, rows)).collect()
    assert [r["event_id"] for r in out] == [999]
    assert out[0]["zscore"] > 3.0


def test_zscore_zero_variance_group_silent(spark):
    t0 = datetime(2026, 8, 1)
    rows = [(i, t0, 1, "view", 7.0) for i in range(50)]
    assert zscore_anomalies(_events(spark, rows)).count() == 0


def test_zscore_matches_population_moments(spark):
    t0 = datetime(2026, 8, 1)
    vals = [float(v) for v in [1, 2, 2, 3, 3, 3, 4, 4, 100]]
    rows = [(i, t0, 1, "err", v) for i, v in enumerate(vals)]
    out = {r["event_id"]: r["zscore"] for r in
           zscore_anomalies(_events(spark, rows)).collect()}
    n = len(vals)
    mean = sum(vals) / n
    std = math.sqrt(sum(v * v for v in vals) / n - mean * mean)
    expect = {i: (v - mean) / std for i, v in enumerate(vals)
              if abs((v - mean) / std) > 3.0}
    assert set(out) == set(expect)
    for i in expect:
        assert abs(out[i] - expect[i]) < 1e-4


def test_ewma_matches_sequential_fold(spark):
    t0 = datetime(2026, 8, 1)
    vals = [3.0, 7.0, 1.0, 9.0, 4.0]
    rows = [(i, t0 + timedelta(seconds=i), 5, "click", v)
            for i, v in enumerate(vals)]
    got = ewma_by_key(_events(spark, rows)).collect()
    assert len(got) == 1 and got[0]["n_events"] == 5
    r = vals[0]
    for x in vals[1:]:
        r = EWMA_ALPHA * x + (1 - EWMA_ALPHA) * r
    assert abs(got[0]["ewma"] - r) < 1e-6


def test_ewma_partition_order_independent(spark):
    t0 = datetime(2026, 8, 1)
    rows = [(i, t0 + timedelta(seconds=i % 37), i % 3, "click",
             float((i * 7) % 23)) for i in range(200)]
    df = _events(spark, rows)
    a = {r["key"]: r["ewma"] for r in ewma_by_key(df).collect()}
    b = {r["key"]: r["ewma"]
         for r in ewma_by_key(df.repartition(13)).collect()}
    assert a == b


def test_ewma_single_event_is_identity(spark):
    t0 = datetime(2026, 8, 1)
    got = ewma_by_key(
        _events(spark, [(1, t0, 9, "click", 42.5)])
    ).collect()[0]
    assert got["ewma"] == 42.5 and got["n_events"] == 1


def test_zscore_negative_float_variance_group_is_guarded(spark):
    # exact integer moments still cast to double before the variance
    # subtraction: for a near-constant group at large magnitude the
    # double rounding can make m2 - mean^2 NEGATIVE (true variance
    # here is 2/9). sqrt of that is NaN, and Spark orders NaN > cut,
    # so without the var > 0 guard the whole group leaks out with NaN
    # z-scores (and the DuckDB twin ERRORS on sqrt of a negative).
    qs = [364416948422, 364416948422, 364416948421]  # var_double < 0
    rows = [(i, "flat", q / 1000.0) for i, q in enumerate(qs)]
    # plus a live group that must still emit its outlier
    rows += [(100 + i, "live", 1.0) for i in range(30)]
    rows += [(999, "live", 1000.0)]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    got = zscore_anomalies(df).collect()
    assert all(r["event_type"] == "live" for r in got)
    assert all(not math.isnan(r["zscore"]) for r in got)
    assert {r["event_id"] for r in got} == {999}


# ---------------- segmented EWMA (hot-key safe) ----------------


def test_ewma_segmented_equals_direct_on_hot_key(spark):
    from datetime import datetime as dt

    from yelp_streaming_etl_pipeline_spark.operators.timeseries import (
        ewma_by_key,
        ewma_by_key_segmented,
    )

    # deliberately hot key: 5000 events on one key, tiny segments so
    # the composition crosses many segment boundaries
    rows = [
        (i, dt(2024, 1, 1, i // 3600, (i // 60) % 60, i % 60), 1,
         float((i * 37) % 1000) / 8.0)
        for i in range(5000)
    ] + [(9000 + i, dt(2024, 1, 2), 2, float(i)) for i in range(3)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    direct = {
        r["key"]: (r["n_events"], r["ewma"])
        for r in ewma_by_key(df).collect()
    }
    seg = {
        r["key"]: (r["n_events"], r["ewma"])
        for r in ewma_by_key_segmented(df, segment_size=64).collect()
    }
    assert direct.keys() == seg.keys()
    for k in direct:
        assert direct[k][0] == seg[k][0]
        assert abs(direct[k][1] - seg[k][1]) < 1e-9


def test_ewma_segmented_state_is_bounded(spark):
    from datetime import datetime as dt

    from pyspark.sql import functions as F

    from yelp_streaming_etl_pipeline_spark.operators.timeseries import (
        ewma_by_key_segmented,
    )

    # the widest array any task materializes is max(segment_size,
    # n/segment_size) — verify by inspecting the intermediate: with
    # segment_size=50 and a 5000-event key, level-2 folds a 100-entry
    # array, never 5000
    rows = [
        (i, dt(2024, 1, 1, 0, 0, 0), 1, float(i % 97)) for i in range(5000)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    out = ewma_by_key_segmented(df, segment_size=50).collect()
    assert len(out) == 1 and out[0]["n_events"] == 5000


def test_ewma_guard_raises_on_hot_key(spark):
    from datetime import datetime as dt

    import pytest

    from yelp_streaming_etl_pipeline_spark.operators.timeseries import (
        ewma_by_key,
    )

    rows = [
        (i, dt(2024, 1, 1), 1, float(i)) for i in range(100)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    with pytest.raises(Exception, match="max_events_per_key|assert"):
        ewma_by_key(df, max_events_per_key=50).collect()
    # under the bound: passes
    assert ewma_by_key(df, max_events_per_key=100).count() == 1


def test_resample_ffill_gaps_and_per_key_spans(spark):
    """Gap rows carry the last observed value and are flagged; each
    key's grid spans only its own [min, max] slot; within a slot the
    last observation (by ts, then event_id) wins."""
    from yelp_streaming_etl_pipeline_spark.operators.timeseries import (
        resample_ffill,
    )

    rows = [
        # user 1: obs at 00 and 03 -> gaps at 01, 02 carrying 1.0;
        # slot 00 has two observations, later ts wins
        (1, "2024-01-01 00:10:00", 1, 99.0),
        (2, "2024-01-01 00:50:00", 1, 1.0),
        (3, "2024-01-01 03:30:00", 1, 4.0),
        # user 2: single observation -> one row, no gaps
        (4, "2024-01-01 10:00:00", 2, 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        (r["key"], str(r["slot"])): (r["value"], r["n_obs"], r["is_gap"])
        for r in resample_ffill(df).collect()
    }
    assert len(out) == 5  # user 1: 4 slots; user 2: 1 slot
    assert out[(1, "2024-01-01 00:00:00")] == (1.0, 2, False)
    assert out[(1, "2024-01-01 01:00:00")] == (1.0, 0, True)
    assert out[(1, "2024-01-01 02:00:00")] == (1.0, 0, True)
    assert out[(1, "2024-01-01 03:00:00")] == (4.0, 1, False)
    assert out[(2, "2024-01-01 10:00:00")] == (7.0, 1, False)


def test_cusum_detects_level_shift_zscore_misses(spark):
    """CUSUM's reason to exist: a persistent +2-unit level shift (well
    under any 3-sigma point threshold) accumulates to an alarm; a
    stable series fires none. Integer fold, deterministic counts."""
    from yelp_streaming_etl_pipeline_spark.operators.timeseries import (
        cusum_changepoints,
    )

    rows = []
    # user 1: 20 obs at 10.0 then 20 obs at 12.0 (persistent shift)
    for i in range(40):
        v = 10.0 if i < 20 else 12.0
        rows.append((i, f"2024-01-01 00:{i:02d}:00", 1, v))
    # user 2: flat series
    for i in range(40):
        rows.append((100 + i, f"2024-01-01 00:{i:02d}:00", 2, 11.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["key"]: r for r in cusum_changepoints(df).collect()}
    assert out[1]["n_alarms"] >= 1  # the shift accumulates to alarms
    assert out[2]["n_alarms"] == 0
    assert out[2]["max_cusum_pos"] == 0 and out[2]["max_cusum_neg"] == 0
    # per-step drift above the mean is (12-11)*1000-500 = 500/step:
    # alarms fire roughly every 10 shifted steps
    assert out[1]["max_cusum_pos"] >= 4500
