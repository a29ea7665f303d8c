"""Property tests for the SCD2 engine (SURVEY.md §5.2 item 3):
random snapshot sequences must preserve the invariants

1. exactly one open version per key ever seen;
2. a key's non-deleted intervals never overlap;
3. replaying an identical snapshot is a no-op;
4. the current view equals the latest snapshot exactly.

Hypothesis drives the snapshot generator; examples are kept small (the
cost is Spark jobs, not data size).
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_sber_spark.functions.normalize import MAX_TS
from etl_sber_spark.operators.scd import scd2_apply, scd2_current

KEYS = [f"K{i}" for i in range(6)]
VALUES = ["a", "b", "c"]

SNAP_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("attr", T.StringType()),
    ]
)

snapshot_strategy = st.lists(
    st.dictionaries(
        st.sampled_from(KEYS), st.sampled_from(VALUES), min_size=0, max_size=6
    ),
    min_size=1,
    max_size=4,
)

_spark = None


@pytest.fixture(scope="module", autouse=True)
def _capture_spark(spark):
    global _spark
    _spark = spark
    yield


def _apply_all(snapshots):
    spark = _spark
    hist = spark.createDataFrame(
        [],
        T.StructType(
            list(SNAP_SCHEMA.fields)
            + [
                T.StructField("deleted_flg", T.IntegerType()),
                T.StructField("effective_from", T.TimestampType()),
                T.StructField("effective_to", T.TimestampType()),
            ]
        ),
    )
    base = dt.datetime(2024, 1, 1)
    for i, snap in enumerate(snapshots):
        stg = spark.createDataFrame(sorted(snap.items()), SNAP_SCHEMA)
        hist = scd2_apply(
            hist, stg, "k", ["attr"], base + dt.timedelta(days=i)
        ).localCheckpoint()  # keep the plan from growing per iteration
    return hist, base + dt.timedelta(days=len(snapshots) - 1)


@given(snapshots=snapshot_strategy)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scd2_invariants(snapshots):
    hist, last_ts = _apply_all(snapshots)
    rows = hist.collect()
    max_ts = dt.datetime(2999, 12, 31, 23, 59, 59)

    # 1. at most one open version per key (exactly one for keys ever seen)
    open_rows = [r for r in rows if r.effective_to == max_ts]
    assert len({r.k for r in open_rows}) == len(open_rows)
    assert {r.k for r in open_rows} == {r.k for r in rows}

    # 2. non-deleted intervals per key never overlap
    by_key: dict[str, list] = {}
    for r in rows:
        if r.deleted_flg == 0:
            by_key.setdefault(r.k, []).append(r)
    for vs in by_key.values():
        vs.sort(key=lambda r: r.effective_from)
        for prev, nxt in zip(vs, vs[1:]):
            assert prev.effective_to < nxt.effective_from

    # 4. current view == last snapshot
    cur = {
        (r.k, r.attr)
        for r in scd2_current(hist, last_ts).select("k", "attr").collect()
    }
    assert cur == set(snapshots[-1].items())


@given(snap=st.dictionaries(st.sampled_from(KEYS), st.sampled_from(VALUES), min_size=1, max_size=6))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scd2_replay_is_noop(snap):
    hist, last_ts = _apply_all([snap])
    stg = _spark.createDataFrame(sorted(snap.items()), SNAP_SCHEMA)
    replayed = scd2_apply(
        hist, stg, "k", ["attr"], last_ts + dt.timedelta(days=1)
    )
    a = sorted(map(str, hist.collect()))
    b = sorted(map(str, replayed.collect()))
    assert a == b
