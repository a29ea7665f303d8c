"""Laws for operators/timeseries.py (resample / spine / gap_fill).

The cross-engine differential for the composed operator is q_gapfill
(driver-graded); these tests pin the semantics a hash can't explain:
spine density, LOCF provenance, the gap flag, and the runaway-calendar
guard.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_sber_spark.operators.timeseries import (
    bucket_ts,
    gap_fill,
    resample,
    time_spine,
)

HOUR = 3600


def _ts(h, m=0):
    return dt.datetime(2024, 3, 1, h, m)


@pytest.fixture(scope="module")
def series(spark):
    # user 1: events in hours 0, 1, 4 (gap at 2, 3); user 2: hour 2 only
    rows = [
        (1, _ts(0, 10), 10.0),
        (1, _ts(0, 50), 5.0),
        (1, _ts(1, 0), 7.0),
        (1, _ts(4, 59), 1.5),
        (2, _ts(2, 30), 100.0),
    ]
    return spark.createDataFrame(rows, "user_id int, ts timestamp, value double")


def test_resample_buckets_and_exact_sums(series):
    out = {
        (r["user_id"], r["bucket"].hour): (r["n_events"], r["value_sum"])
        for r in resample(series, "user_id", "ts", "value", HOUR).collect()
    }
    assert out == {
        (1, 0): (2, 15.0),
        (1, 1): (1, 7.0),
        (1, 4): (1, 1.5),
        (2, 2): (1, 100.0),
    }


def test_bucket_boundary_belongs_to_its_own_bucket(spark):
    # exactly on the boundary: 01:00:00 must land in the 01 bucket, not 00
    df = spark.createDataFrame(
        [(1, _ts(1, 0))], "user_id int, ts timestamp"
    ).select(bucket_ts("ts", HOUR).alias("b"))
    assert df.collect()[0]["b"] == _ts(1, 0)


def test_gap_fill_dense_spine_locf_and_flags(series):
    rows = gap_fill(series, "user_id", "ts", "value", HOUR).collect()
    u1 = sorted(
        ((r["bucket"].hour, r["n_events"], r["value_locf"], r["is_gap"]))
        for r in rows
        if r["user_id"] == 1
    )
    # dense: hours 0..4 all present; gaps 2,3 carry hour-1's sum
    assert u1 == [
        (0, 2, 15.0, False),
        (1, 1, 7.0, False),
        (2, 0, 7.0, True),
        (3, 0, 7.0, True),
        (4, 1, 1.5, False),
    ]
    u2 = [(r["bucket"].hour, r["is_gap"]) for r in rows if r["user_id"] == 2]
    # single-observation key: spine is exactly its own bucket, no gaps
    assert u2 == [(2, False)]


def test_gap_fill_value_sum_null_only_on_gaps(series):
    rows = gap_fill(series, "user_id", "ts", "value", HOUR).collect()
    for r in rows:
        assert (r["value_sum"] is None) == r["is_gap"]


def test_spine_guard_rejects_runaway_key(spark):
    # one corrupt 1970 timestamp next to a 2024 one: the per-key span
    # would be ~473k hourly steps — the guard must refuse, not generate
    bad = spark.createDataFrame(
        [(1, dt.datetime(1970, 1, 1), 1.0), (1, _ts(0), 1.0)],
        "user_id int, ts timestamp, value double",
    )
    b = resample(bad, "user_id", "ts", "value", HOUR)
    with pytest.raises(Exception, match="spans more than"):
        time_spine(b, "user_id", HOUR, max_steps=1000).collect()


def test_spine_guard_allows_exact_cap(spark):
    ok = spark.createDataFrame(
        [(1, _ts(0), 1.0), (1, _ts(0) + dt.timedelta(hours=999), 1.0)],
        "user_id int, ts timestamp, value double",
    )
    b = resample(ok, "user_id", "ts", "value", HOUR)
    assert time_spine(b, "user_id", HOUR, max_steps=1000).count() == 1000


def test_resample_accumulator_widens(spark):
    """value_decimal widens the exact accumulator for large-range
    series (the default (18,2) is a stated contract and fails LOUDLY
    under ANSI when exceeded — round-4 review finding)."""
    rows = [(1, _ts(0), 1e17), (1, _ts(0, 30), 2e17)]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    out = resample(
        df, "user_id", "ts", "value", HOUR, value_decimal=(38, 2)
    ).collect()
    assert out[0]["value_sum"] == 3e17
    with pytest.raises(Exception):
        resample(df, "user_id", "ts", "value", HOUR).collect()


def test_gap_fill_plan_shape(series):
    """SCALE.md claim: resample's hash-aggregate is the only
    corpus-sized shuffle; spine generation is explode over a tiny
    aggregate; the spine⋈buckets join and LOCF window reuse the key
    partitioning. Pin: no cartesian/BNLJ, and the Exchange count stays
    at the audited 4 (agg partials, join sides, window) — a regression
    adding a corpus-wide reshuffle fails this."""
    plan = (
        gap_fill(series, "user_id", "ts", "value", HOUR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert plan.count("Exchange") <= 4
