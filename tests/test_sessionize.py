"""Sessionization (operators/sessionize.py): hand-computed fixtures,
cross-check of the two formulations (window algebra vs native
session_window), and a DuckDB differential on the synthetic events."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_sber_spark.operators.sessionize import session_stats, sessionize

from .conftest import SF_SMALL


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, u, dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=m))
            for i, (u, m) in enumerate(rows)
        ],
        ["event_id", "user_id", "ts"],
    )


def test_sessionize_hand_fixture(spark):
    # user 1: events at minute 0, 10, 50 (gap 40 > 30 → split), 70
    # user 2: single event
    df = _events(spark, [(1, 0), (1, 10), (1, 50), (1, 70), (2, 5)])
    got = {
        r.event_id: (r.session_seq, r.session_id)
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert got == {
        0: (0, 1 * 2**32 + 0),
        1: (0, 1 * 2**32 + 0),
        2: (1, 1 * 2**32 + 1),
        3: (1, 1 * 2**32 + 1),
        4: (0, 2 * 2**32 + 0),
    }


def test_exact_gap_continues_session(spark):
    """A gap of exactly gap_minutes continues the session (the
    session_window closed-interval convention both formulations share)."""
    df = _events(spark, [(1, 0), (1, 30)])
    rows = sessionize(df, gap_minutes=30).collect()
    assert {r.session_seq for r in rows} == {0}
    assert session_stats(df, gap_minutes=30).count() == 1


def test_formulations_agree_on_fixture(spark):
    df = _events(spark, [(1, 0), (1, 10), (1, 50), (1, 70), (2, 5), (2, 59)])
    a = (
        sessionize(df, gap_minutes=20)
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )
    b = session_stats(df, gap_minutes=20)
    assert sorted(map(tuple, a.collect())) == sorted(
        map(tuple, b.select(a.columns).collect())
    )


def test_formulations_agree_on_real_events(spark):
    """The two implementations are independent formulations of the same
    semantics; on the full synthetic events table they must produce
    identical per-session aggregate sets."""
    from etl_sber_spark.sources.tables import load_table

    e = load_table(spark, SF_SMALL, "events").select("event_id", "user_id", "ts")
    a = (
        sessionize(e, gap_minutes=30)
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )
    b = session_stats(e, gap_minutes=30)
    assert a.count() == b.count()
    diff = (
        a.select("user_id", "session_start", "session_end", "n_events")
        .exceptAll(b.select("user_id", "session_start", "session_end", "n_events"))
    )
    assert diff.isEmpty()


def test_sessionize_vs_duckdb_oracle(spark, tmp_path):
    """Differential: the same lag→flag→cumsum algebra in DuckDB SQL over
    the events table gives identical (event → session) assignment."""
    import duckdb

    from etl_sber_spark.sources.tables import load_table

    e = load_table(spark, SF_SMALL, "events").select("event_id", "user_id", "ts")
    got = {
        r.event_id: r.session_id
        for r in sessionize(e, gap_minutes=30).collect()
    }
    con = duckdb.connect()
    want = dict(
        con.execute(
            f"""
            WITH e AS (
                SELECT event_id, user_id, ts
                FROM read_parquet('{SF_SMALL}/events.parquet')
            ),
            flags AS (
                SELECT *,
                    CASE WHEN lag(ts) OVER w IS NULL
                           OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                              > 30*60*1000000
                         THEN 1 ELSE 0 END AS is_new
                FROM e
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT event_id,
                   user_id * 4294967296 +
                   (SUM(is_new) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) - 1) AS session_id
            FROM flags
            """
        ).fetchall()
    )
    assert got == want
