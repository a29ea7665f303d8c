"""Property-based differential for the band-window EXISTS rewrite
(operators/bandjoin.py): on ARBITRARY tiny datasets, the default
per-key windows, the r7 time-binned variant, and a pure-Python
quadratic reference must all agree — hypothesis hunts the bin-edge /
tie / duplicate cases the planted fixtures miss (groups exactly
``tolerance`` apart straddling a bin boundary, same-ts different-diff
clusters, duplicate input rows collapsing into one group)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_sber_spark.operators.bandjoin import band_partner_groups

TOL = 10  # seconds — small, so bins flip constantly
BASE = dt.datetime(2021, 3, 1)

rows = st.lists(
    st.tuples(
        st.sampled_from(["k1", "k2"]),
        st.integers(min_value=0, max_value=45),  # spans ~5 bins
        st.sampled_from(["X", "Y"]),
    ),
    min_size=1,
    max_size=14,
)


def _py_reference(data):
    """Quadratic EXISTS over the DISTINCT groups."""
    groups = sorted({(k, s, d) for k, s, d in data})
    out = set()
    for k, s, d in groups:
        for k2, s2, d2 in groups:
            if k2 == k and d2 != d and s2 != s and abs(s2 - s) <= TOL:
                out.add((k, s, d))
                break
    return out


@given(data=rows)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_binned_and_default_match_python_reference(spark, data):
    df = spark.createDataFrame(
        [(k, BASE + dt.timedelta(seconds=s), d) for k, s, d in data],
        "k string, ts timestamp, d string",
    )
    want = {
        (k, BASE + dt.timedelta(seconds=s), d)
        for k, s, d in _py_reference(data)
    }
    base = {
        tuple(r)
        for r in band_partner_groups(
            df, ["k"], "ts", "d", tolerance_seconds=TOL
        ).collect()
    }
    binned = {
        tuple(r)
        for r in band_partner_groups(
            df, ["k"], "ts", "d", tolerance_seconds=TOL, time_bins=True
        ).collect()
    }
    assert base == want
    assert binned == want
