"""SNK7 (CREATE VIEW, main.py:56-67/392-421): the registered-view SQL
surface — plans written in Spark SQL over temp views must agree with the
DataFrame path."""

from __future__ import annotations

from etl_sber_spark.sources.tables import register_views

from .conftest import SF_SMALL


def test_register_views_and_sql(spark):
    dfs = register_views(spark, SF_SMALL)
    assert set(dfs) >= {"lineitem", "orders", "events"}
    via_sql = spark.sql(
        """
        SELECT l_returnflag, COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag
        """
    ).collect()
    via_df = (
        dfs["lineitem"].groupBy("l_returnflag").count().collect()
    )
    assert {(r.l_returnflag, r.n) for r in via_sql} == {
        (r.l_returnflag, r["count"]) for r in via_df
    }


def test_view_replacement_is_idempotent(spark):
    register_views(spark, SF_SMALL)
    n1 = spark.sql("SELECT COUNT(*) AS n FROM events").collect()[0].n
    register_views(spark, SF_SMALL)  # CREATE OR REPLACE semantics
    n2 = spark.sql("SELECT COUNT(*) AS n FROM events").collect()[0].n
    assert n1 == n2 > 0
