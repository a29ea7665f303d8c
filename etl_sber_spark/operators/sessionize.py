"""Gap-based sessionization of event streams.

Groups a user's events into sessions separated by inactivity gaps —
the standard unit of web/product analytics and the canonical
"stateful" operator every engine is asked for. Two independent
formulations, cross-checked in tests/test_sessionize.py:

- :func:`sessionize` — window algebra: lag → gap flag → running sum.
  Emits one row PER EVENT with its session id (what downstream
  per-event feature pipelines join on). One shuffle (the per-user
  window sort).
- :func:`session_stats` — per-session aggregate rows via Spark's
  native ``F.session_window`` (merging-interval aggregation). In
  BATCH it computes the same sessions as the window formulation;
  in STREAMING the identical expression runs incrementally with
  watermark-evicted state (streaming/sessions.py) — one definition,
  both execution modes, which is the Structured-Streaming design
  argument for using session_window over hand-rolled state.

Session identity: ``session_id = user × 2^32 + seq`` (seq is the
0-based per-user session ordinal) — deterministic, collision-free for
user ids < 2^31 (the fixture range), and cheap (no string concat in
the hot path).

Scale: both shapes shuffle once on the user key; per-user data is
bounded (events/user, not corpus-sized), so the window sort never
spills pathologically; AQE skew handling covers hot users. No UDFs,
no state bigger than the watermark horizon in streaming mode.

Reference parity: the reference has no sessionization (nightly bank
batch); extension surface. Same gap semantics as the trailing-window
velocity operator (streaming/rollup.py velocity_alerts) but partitioned
into disjoint sessions rather than a sliding horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_MIN = 30


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_minutes: int = DEFAULT_GAP_MIN,
) -> DataFrame:
    """Per-event session assignment.

    Output: input columns + ``session_seq`` (0-based per-user ordinal)
    + ``session_id``. An event starts a new session iff it is the
    user's first or follows the previous event by MORE than
    ``gap_minutes`` (a gap of exactly ``gap_minutes`` continues the
    session — the closed-interval convention ``session_window`` uses,
    so the two formulations agree on boundary events).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    gap_us = F.lit(gap_minutes * 60 * 1_000_000)
    prev = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    is_new = F.when(
        prev.isNull() | (F.unix_micros(F.col(ts_col)) - prev > gap_us), 1
    ).otherwise(0)
    seq = (
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1
    )
    return df.withColumn("session_seq", seq).withColumn(
        "session_id",
        F.col(user_col).cast("long") * F.lit(2**32) + F.col("session_seq"),
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = DEFAULT_GAP_MIN,
) -> DataFrame:
    """One row per session via native ``session_window`` merging.

    Output: ``user_col``, ``session_start``, ``session_end`` (last
    event time; session_window's ``end`` is last-event + gap, so the
    aggregate carries max(ts) explicitly), ``n_events``,
    ``duration_us``. Works unchanged on a streaming DataFrame
    (add a watermark first — see streaming/sessions.py).
    """
    gap = f"{gap_minutes} minutes"
    return (
        df.groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), gap).alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(
            user_col,
            "session_start",
            "session_end",
            "n_events",
            (
                F.unix_micros(F.col("session_end"))
                - F.unix_micros(F.col("session_start"))
            ).alias("duration_us"),
        )
    )
