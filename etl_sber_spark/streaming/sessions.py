"""Streaming sessionization: the batch session_stats expression run
incrementally.

``F.session_window`` is the Structured-Streaming-native session
operator: the state store keeps one merging interval per open (user,
session); the watermark closes and EMITS a session once event time
passes session_end + gap + watermark delay, and the closed session's
state is evicted — so state is bounded by OPEN sessions within the
watermark horizon, not by lifetime user cardinality (the property the
round-2 advice pass demanded of every stateful operator here).

The aggregation expression is literally operators/sessionize.py's
``session_stats`` — one definition, batch and streaming execution.
tests/test_sessionize.py proves batch == window-algebra sessionize;
tests/test_streaming_sessions.py proves the streamed availableNow run
over the same events equals the batch answer (append mode only emits
watermark-closed sessions; the test sets the watermark so every
fixture session closes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.sessionize import DEFAULT_GAP_MIN, session_stats


def streaming_session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = DEFAULT_GAP_MIN,
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked per-session aggregate stream (append output mode)."""
    return session_stats(
        events.withWatermark(ts_col, watermark),
        user_col=user_col,
        ts_col=ts_col,
        gap_minutes=gap_minutes,
    )
