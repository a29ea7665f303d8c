"""Incremental rollup maintenance — the materialized side of the
hypertable-style time-bucket aggregate (q_time_bucket_rollup).

A continuous aggregate at 100 TB is never recomputed from scratch: each
day's load recomputes ONLY that day's slice of the rollup and swaps it
in with dynamic partition overwrite. Re-running a day is a correction,
not a duplication — the same idempotency contract as the fact load
(pipeline.py ``idempotent=True``).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sinks.warehouse import Warehouse


def incremental_hourly_rollup(
    wh: Warehouse,
    fact_name: str,
    rollup_name: str,
    day: dt.date,
    ts_col: str = "trans_date",
    group_cols: tuple[str, ...] = ("oper_type",),
    amount_col: str = "amt",
) -> DataFrame:
    """Recompute one day's hourly rollup partition and swap it in.

    Reads only the fact's ``load_date=day`` partition (partition
    pruning), aggregates to (hour bucket × group_cols), and overwrites
    exactly the rollup's ``day`` partition. Returns the day's rollup
    rows."""
    fact = wh.read(fact_name).filter(F.col("load_date") == F.lit(day))
    day_rollup = (
        fact.groupBy(
            F.date_trunc("hour", F.col(ts_col)).alias("bucket_start"),
            *[F.col(c) for c in group_cols],
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(amount_col).alias("total_amt"),
        )
        .withColumn("day", F.lit(day).cast("date"))
    )
    wh.overwrite_partitions(day_rollup, rollup_name, partition_by=["day"])
    return wh.read(rollup_name).filter(F.col("day") == F.lit(day))
