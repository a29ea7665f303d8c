"""Approximate-aggregate surface: sketches (HLL, t-digest) are not
cross-engine comparable, so they get error-bound tests against the exact
answer instead of a DuckDB oracle — the standard contract for approx
operators at 100 TB (exact distinct/percentile don't scale; sketches
do, with known error)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_MED


def test_approx_count_distinct_within_bound(spark):
    e = spark.read.parquet(f"{SF_MED}/events.parquet")
    row = e.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_approx_percentile_within_bound(spark):
    e = spark.read.parquet(f"{SF_MED}/events.parquet")
    row = e.agg(
        F.percentile("value", F.lit(0.5)).alias("exact"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10_000)).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) <= 0.5  # value range ~[0,200]
