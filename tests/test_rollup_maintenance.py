"""Incremental rollup maintenance: per-day slices accumulate, a day's
re-run corrects only its own slice, and every slice equals the direct
aggregation of its fact partition."""

from __future__ import annotations

import datetime as dt
import shutil

from pyspark.sql import functions as F

from etl_sber_spark.operators.rollup_maintenance import incremental_hourly_rollup
from etl_sber_spark.pipeline import T_FACT, run_day
from etl_sber_spark.sinks.warehouse import Warehouse

from .fixtures_bank import build_bank_tables

REF = "/root/reference"


def test_incremental_rollup_accumulates_and_corrects(spark, tmp_path):
    bank = build_bank_tables(spark)
    wh_root = str(tmp_path / "wh")
    for day in ("01", "02"):
        inbox = tmp_path / f"in{day}"
        inbox.mkdir()
        shutil.copy(
            f"{REF}/transactions_{day}032021.txt",
            inbox / f"transactions_{day}032021.txt",
        )
        run_day(
            spark,
            str(inbox),
            wh_root,
            bank,
            dt.datetime(2021, 3, int(day), 23, 50),
        )
    wh = Warehouse(spark, wh_root)
    d1, d2 = dt.date(2021, 3, 1), dt.date(2021, 3, 2)

    n1 = incremental_hourly_rollup(wh, T_FACT, "rollup_hourly", d1).count()
    assert n1 >= 24  # 24h x up to 3 oper types
    n2 = incremental_hourly_rollup(wh, T_FACT, "rollup_hourly", d2).count()
    n_total = wh.read("rollup_hourly").count()
    assert n_total == n1 + n2  # slices accumulate

    # re-running day 1 must NOT duplicate its slice (materialize counts
    # before the overwrite — a stale DataFrame over replaced files would
    # fail on re-read, which is exactly the snapshot hazard dynamic
    # overwrite has and the versioned-swap tables avoid)
    incremental_hourly_rollup(wh, T_FACT, "rollup_hourly", d1)
    assert wh.read("rollup_hourly").count() == n_total

    # each slice equals direct aggregation of the fact partition
    fact_d1 = wh.read(T_FACT).filter(F.col("load_date") == F.lit(d1))
    direct = {
        (str(r.b), r.oper_type): r.n
        for r in fact_d1.groupBy(
            F.date_trunc("hour", "trans_date").alias("b"), "oper_type"
        )
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    slice1 = {
        (str(r.bucket_start), r.oper_type): r.n
        for r in wh.read("rollup_hourly")
        .filter(F.col("day") == F.lit(d1))
        .collect()
    }
    assert slice1 == direct
