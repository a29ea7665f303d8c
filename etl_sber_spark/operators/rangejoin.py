"""Range join (point-in-interval, non-equi) — the brief's named custom
operator alongside the as-of join.

A naive `p.ts BETWEEN i.start AND i.end` join has no equi key, so Spark
plans a broadcast-nested-loop: O(|points|·|intervals|). The scale
rewrite is BIN BUCKETING: quantize time into fixed-width bins, explode
each interval into the bins it covers, and equi-join points on their
bin with the BETWEEN as a residual. Each (point, interval) pair meets in
exactly one bin (the point's), so no dedup is needed; the blowup is
bounded by interval_width/bin_width + 1 rows per interval.

Choosing bin width = typical interval width keeps the explode factor
≈ 2 while making the join a hash join on a high-cardinality key — the
same trick Databricks' range-join hint applies internally, expressed
here with open-source primitives.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EPOCH = "1970-01-01"


def _day_bin(col: Column, bin_days: int) -> Column:
    return F.floor(
        F.datediff(col.cast("date"), F.lit(_EPOCH).cast("date")) / bin_days
    )


def point_in_interval_join(
    points: DataFrame,
    point_ts: str,
    intervals: DataFrame,
    start: str,
    end: str,
    bin_days: int = 7,
) -> DataFrame:
    """Inner join: every (point, interval) with
    ``start <= point_ts <= end``. Output = all point columns + all
    interval columns (caller projects/aggregates)."""
    binned_points = points.withColumn("_bin", _day_bin(F.col(point_ts), bin_days))
    exploded = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                _day_bin(F.col(start), bin_days), _day_bin(F.col(end), bin_days)
            )
        ),
    )
    return (
        binned_points.join(exploded, on="_bin", how="inner")
        .filter(
            F.col(point_ts).between(F.col(start), F.col(end))
        )
        .drop("_bin")
    )
