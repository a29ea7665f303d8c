"""operators/profile.py — fixture-exact stats + real-table laws."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_sber_spark.operators.profile import profile, top_values

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def mixed(spark):
    rows = [
        (1, "a", 10.0, [1]),
        (2, "b", None, [2, 3]),
        (3, None, 30.5, None),
        (4, "a", 2.5, []),
    ]
    return spark.createDataFrame(
        rows, "id long, s string, v double, arr array<int>"
    )


def test_profile_fixture_exact(mixed):
    p = {r["column"]: r for r in profile(mixed, exact_distinct=True).collect()}
    assert set(p) == {"id", "s", "v", "arr"}
    for c in p:
        assert p[c]["n_rows"] == 4

    assert p["id"]["n_null"] == 0 and p["id"]["n_distinct"] == 4
    assert p["id"]["min_repr"] == "1" and p["id"]["max_repr"] == "4"
    assert p["id"]["mean"] == 2.5 and p["id"]["dtype"] == "bigint"

    assert p["s"]["n_null"] == 1 and p["s"]["null_frac"] == 0.25
    assert p["s"]["n_distinct"] == 2  # NULL not counted by count_distinct
    assert p["s"]["min_repr"] == "a" and p["s"]["max_repr"] == "b"
    assert p["s"]["mean"] is None

    assert p["v"]["n_null"] == 1
    assert p["v"]["min_repr"] == "2.5" and p["v"]["max_repr"] == "30.5"
    # mean over NON-NULL values only
    assert math.isclose(p["v"]["mean"], (10.0 + 30.5 + 2.5) / 3)

    # complex type: counts only
    assert p["arr"]["n_null"] == 1
    assert p["arr"]["min_repr"] is None and p["arr"]["mean"] is None


def test_profile_single_job_one_row_reduce(mixed):
    # the whole profile is ONE aggregate: the plan has exactly one
    # corpus-side HashAggregate pair and no join/expand of the input
    plan = profile(mixed)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Expand" not in plan


def test_profile_exact_distinct_uses_expand(mixed):
    # exact mode knowingly pays the Expand (documented trade-off)
    plan = (
        profile(mixed, exact_distinct=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" in plan


def test_profile_matches_direct_queries_on_real_table(spark):
    from etl_sber_spark.sources.tables import load_table

    d = load_table(spark, SF, "documents")
    p = {r["column"]: r for r in profile(d, exact_distinct=True).collect()}
    n = d.count()
    for c in ("doc_id", "lang", "source", "n_chars"):
        assert p[c]["n_rows"] == n
        assert p[c]["n_distinct"] == d.select(c).distinct().na.drop().count()
    assert p["n_chars"]["mean"] == pytest.approx(
        d.agg(F.avg("n_chars")).collect()[0][0]
    )


def test_profile_approx_distinct_within_rsd(spark):
    from etl_sber_spark.sources.tables import load_table

    d = load_table(spark, SF, "documents")
    approx = {
        r["column"]: r["n_distinct"] for r in profile(d, rsd=0.02).collect()
    }
    exact = d.select("doc_id").distinct().count()
    assert abs(approx["doc_id"] - exact) <= max(3, 0.1 * exact)


def test_profile_unknown_column_rejected(mixed):
    with pytest.raises(ValueError, match="unknown columns"):
        profile(mixed, columns=["nope"])


def test_top_values(mixed):
    top = top_values(mixed, "s", k=2).collect()
    assert [(r["value"], r["n"], r["rank"]) for r in top] == [
        ("a", 2, 1),
        (None, 1, 2),  # NULL renders as NULL but counts as a value
    ]


def test_profile_survives_huge_doubles(spark):
    """A 1e30 double must not abort the profile (ANSI decimal overflow)
    nor silently skew the mean (round-4 review finding)."""
    df = spark.createDataFrame(
        [(1, 1e30), (2, 2e30), (3, None)], "id long, v double"
    )
    p = {r["column"]: r for r in profile(df, exact_distinct=True).collect()}
    assert p["v"]["mean"] == pytest.approx(1.5e30)
    assert p["v"]["n_null"] == 1


def test_profile_survives_saturated_decimal_sum(spark):
    """ADVICE round 4: a DECIMAL(38,10) column leaves NO headroom for
    the widened sum (precision already 38) — two near-max values
    overflow it: crash under ANSI, silent NULL mean under ANSI-off. The
    profiler must sum in double instead; a profiler never gets to
    assume its input is tame."""
    from decimal import Decimal

    from pyspark.sql import types as T

    big = Decimal("9.9e27")  # 28 integer digits is DECIMAL(38,10)'s max
    df = spark.createDataFrame(
        [(1, big), (2, big), (3, None)],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("v", T.DecimalType(38, 10)),
            ]
        ),
    )
    p = {r["column"]: r for r in profile(df, exact_distinct=True).collect()}
    assert p["v"]["mean"] == pytest.approx(9.9e27)
    assert p["v"]["n_null"] == 1
