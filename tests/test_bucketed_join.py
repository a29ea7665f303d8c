"""Bucketed co-located join (SCALE.md): both sides bucketed on the join
key ⇒ sort-merge join with ZERO Exchange — the physical proof that the
fact⋈fact path avoids its shuffle at 100 TB."""

from __future__ import annotations

import io
import contextlib

import pytest

from pyspark.sql import functions as F

from etl_sber_spark.sinks.warehouse import Warehouse
from etl_sber_spark.sources.tables import load_table

from .conftest import SF_SMALL


@pytest.fixture()
def no_broadcast(spark):
    """Force a shuffle-capable join so the bucketing (not broadcast) is
    what removes the Exchange."""
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
    spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, no_broadcast, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    o = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    try:
        wh.save_bucketed(li, "b_lineitem", "l_orderkey", n_buckets=8)
        wh.save_bucketed(o, "b_orders", "o_orderkey", n_buckets=8)

        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle either side
        # and it actually computes
        assert joined.count() > 0

        # control: the same join on unbucketed parquet DOES shuffle
        control = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        assert "Exchange" in _plan(control)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
