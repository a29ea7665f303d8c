"""Streaming aggregation over the transactions feed (SURVEY.md §2.9
phase-2 surface): watermarked tumbling-window rollups and a custom
stateful per-card operator.

Neither exists in the reference (its nightly batch recomputes
everything); these are the Structured-Streaming-native equivalents a
live deployment of the same pipeline would use:

- :func:`hourly_rollup` — tumbling 1-hour window × oper_type counts and
  amounts; the watermark bounds state (late files older than the
  allowed lateness are dropped, matching the daily-batch cutoff
  semantics of ``trunc(create_date)=trunc(sysdate)``, main.py:417).
- :func:`card_running_totals` — ``applyInPandasWithState``: per-card
  running transaction count/amount maintained across micro-batches —
  the template for custom stateful operators (sessionization, fraud
  velocity checks) that windowed aggs can't express.

Scale: state is keyed by (window, type) / card_num — both partition
uniformly; state store size is bounded by watermark eviction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def hourly_rollup(
    typed_stream: DataFrame, *, watermark: str = "1 day"
) -> DataFrame:
    """Tumbling 1-hour rollup of the typed transactions stream."""
    return (
        typed_stream.withWatermark("trans_date", watermark)
        .groupBy(
            F.window("trans_date", "1 hour").alias("w"),
            F.col("oper_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("amt").alias("total_amt"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "oper_type",
            "n",
            "total_amt",
        )
    )


STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("card_num", T.StringType()),
        T.StructField("n_trans", T.LongType()),
        T.StructField("total_amt", T.DoubleType()),
    ]
)


VELOCITY_STATE = T.StructType(
    [T.StructField("recent_ts", T.ArrayType(T.TimestampType()))]
)

VELOCITY_SCHEMA = T.StructType(
    [
        T.StructField("card_num", T.StringType()),
        T.StructField("alert_ts", T.TimestampType()),
        T.StructField("n_last_hour", T.LongType()),
    ]
)


def velocity_alerts(
    typed_stream: DataFrame,
    max_per_hour: int = 5,
    idle_timeout_min: int = 360,
) -> DataFrame:
    """Streaming fraud velocity rule: alert when a card exceeds
    ``max_per_hour`` transactions inside any trailing 1-hour window.

    The streaming-native sibling of batch rule 3: per-card state is the
    list of transaction timestamps within 1 hour of the NEWEST seen
    (pruned each batch, so per-card state is bounded by the card's
    1-hour burst size). Each event's window is the two-sided
    ``(ts-1h, ts]`` — an out-of-order event never counts events that
    happened after it (review finding). An event arriving more than 1h
    behind the card's newest may undercount its window (older
    timestamps were pruned) — the bounded-state trade-off, shared with
    any watermarked evaluation of this rule; the batch rule replayed
    nightly remains the exact authority. Emits one alert row per
    offending transaction. Self-contained closure (executors have no
    repo on sys.path).

    TOTAL state is bounded too (round-3 fix, ADVICE r2): a
    ProcessingTimeTimeout evicts the entry for any card idle longer
    than ``idle_timeout_min`` WALL-CLOCK minutes; round-2's NoTimeout
    grew state with lifetime distinct-card cardinality. The timeout is
    processing-time, the rule window event-time, so eviction preserves
    semantics only while ingestion keeps pace: if the SOURCE stalls
    past the TTL (outage, backpressure) while a card's event-time gap
    stays under 1h, its rebuilt window under-counts and an alert can be
    missed. The default therefore sits well past any routine stall —
    state cost is the ACTIVE-card working set per 6h, still bounded —
    and deployments needing strict event-time eviction should put a
    watermark on the stream and use EventTimeTimeout instead (TTL then
    advances with the data, at the price of dropping late events).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    timeout_ms = idle_timeout_min * 60_000

    def update(key, pdfs, state):
        import datetime as _dt

        import pandas as _pd

        empty = _pd.DataFrame(
            {"card_num": [], "alert_ts": [], "n_last_hour": []}
        )
        if state.hasTimedOut:
            state.remove()
            yield empty
            return
        recent: list = list(state.get[0]) if state.exists else []
        alerts_ts, alerts_n = [], []
        new_ts = []
        for pdf in pdfs:
            new_ts.extend(_pd.to_datetime(pdf["trans_date"]).tolist())
        # Drop NaT up front (malformed timestamp rows survive ingestion
        # as NULL): a NaT cutoff comparison is False for EVERY retained
        # timestamp, so one bad row would silently wipe the card's
        # whole trailing-hour window and suppress real alerts. The
        # batch rule filters NULL ts the same way (bandjoin _non_null).
        new_ts = [t for t in new_ts if not _pd.isna(t)]
        # The rule window for an event at ts is (ts-1h, ts] — bounded on
        # BOTH sides. A late cross-batch event used to be counted
        # against every FUTURE timestamp already in state (the window
        # degenerated to (ts-1h, ∞)), firing spurious alerts for bursts
        # that never co-occurred in any real trailing hour (review
        # finding). State is pruned against the NEWEST timestamp seen,
        # not the current event's — pruning by a late event's cutoff
        # would (a) not bound state and (b) previously evicted nothing.
        for ts in sorted(new_ts):
            ts = ts.to_pydatetime() if hasattr(ts, "to_pydatetime") else ts
            cutoff = ts - _dt.timedelta(hours=1)
            recent.append(ts)
            n_window = sum(1 for t in recent if cutoff < t <= ts)
            if n_window > max_per_hour:
                alerts_ts.append(ts)
                alerts_n.append(n_window)
        if recent:
            horizon = max(recent) - _dt.timedelta(hours=1)
            recent = [t for t in recent if t > horizon]
        state.update((recent,))
        state.setTimeoutDuration(timeout_ms)
        yield _pd.DataFrame(
            {
                "card_num": [key[0]] * len(alerts_ts),
                "alert_ts": alerts_ts,
                "n_last_hour": alerts_n,
            }
        )

    return typed_stream.groupBy("card_num").applyInPandasWithState(
        update,
        outputStructType=VELOCITY_SCHEMA,
        stateStructType=VELOCITY_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def card_running_totals(
    typed_stream: DataFrame, idle_timeout_hours: int = 24
) -> DataFrame:
    """Per-card running totals via ``applyInPandasWithState``.

    Emits one (card_num, n_trans, total_amt) row per card per
    micro-batch, carrying state forward — the minimal template for
    custom streaming state. The update function is self-contained (no
    module-global references) so executor workers need no repo on
    sys.path.

    State TTL (round-3 fix, ADVICE r2): a ProcessingTimeTimeout drops
    the counters of any card idle longer than ``idle_timeout_hours``,
    bounding total state by the active-card working set instead of
    lifetime distinct-card cardinality. Unlike velocity_alerts this IS
    a semantic trade: a card returning after the TTL restarts its
    totals from zero. The last emitted row before eviction holds the
    final totals — a downstream sink keyed on card_num retains them —
    so the contract is "running totals over activity sessions gapped
    by < TTL"; for exact lifetime totals, aggregate the fact table in
    batch (q_agg_sum_by_key) instead of holding unbounded stream state.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    timeout_ms = idle_timeout_hours * 3_600_000

    def update(key, pdfs, state):
        import pandas as _pd

        if state.hasTimedOut:
            state.remove()
            yield _pd.DataFrame(
                {"card_num": [], "n_trans": [], "total_amt": []}
            )
            return
        n, total = (0, 0.0)
        if state.exists:
            n, total = state.get
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["amt"].astype(float).sum())
        state.update((n, total))
        state.setTimeoutDuration(timeout_ms)
        yield _pd.DataFrame(
            {"card_num": [key[0]], "n_trans": [n], "total_amt": [total]}
        )

    return (
        typed_stream.groupBy("card_num")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
