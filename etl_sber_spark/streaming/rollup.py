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


#: sharded velocity state: one row per SHARD — parallel arrays of the
#: shard's cards, each card's retained window (unix micros — nested
#: timestamp arrays are avoided in state on purpose), and the card's
#: last-activity wall clock for the per-card TTL prune.
VELOCITY_SHARD_STATE = T.StructType(
    [
        T.StructField("cards", T.ArrayType(T.StringType())),
        T.StructField("times_us", T.ArrayType(T.ArrayType(T.LongType()))),
        T.StructField("last_seen", T.ArrayType(T.DoubleType())),
    ]
)


#: auto shard sizing: shards per task slot. One shard per slot would
#: fill the cluster but leave hash imbalance (the largest shard gates
#: the stage); 8× smooths the balance while keeping each shard's card
#: set well under one Arrow batch at the measured working sets
#: (196k cards / 256 shards ≈ 770 cards/invocation, SCALE.md).
SHARDS_PER_SLOT = 8
#: auto floor: below this, per-invocation Python overhead is already
#: negligible and fewer shards only concentrate skew.
MIN_AUTO_SHARDS = 64


def velocity_alerts_sharded(
    typed_stream: DataFrame,
    max_per_hour: int = 5,
    idle_timeout_min: int = 360,
    n_shards: int | str = 256,
) -> DataFrame:
    """:func:`velocity_alerts` with state keyed by ``hash(card) %
    n_shards`` instead of by card — the high-cardinality throughput
    shape (r8).

    The per-card algebra is IDENTICAL (same two-sided ``(ts-1h, ts]``
    window, same NaT filter, same newest-timestamp prune — alert rows
    are row-equal, pinned in tests/test_velocity.py). What changes is
    the state-store granularity: the streaming smoke measured the
    per-key path at ~23 s/batch with 196k active cards/batch
    (SCALE.md) — the cost is 196k Python function invocations + state
    (de)serializations per batch, not the algebra. Sharding turns that
    into ``n_shards`` invocations whose inner per-card loop runs over a
    pandas groupby, and the state store holds ``n_shards`` rows.

    The TTL trade: the per-card ProcessingTimeTimeout becomes (a) a
    per-SHARD timer (a shard with no traffic at all for the TTL drops
    whole) plus (b) an in-update per-card prune against each card's
    last-activity wall clock — so an idle card's window is dropped on
    its shard's next invocation rather than by its own timer. Total
    state stays bounded by the active-card working set either way; the
    source-stall undercount caveat of the per-key form carries over
    unchanged. ``n_shards`` sizes parallelism: at least the cluster's
    task slots, small enough that a shard's cards fit one Arrow batch.

    ``n_shards="auto"`` (r9, the last manual scale knob in streaming)
    computes that sizing rule instead of trusting the caller:
    ``max(MIN_AUTO_SHARDS, SHARDS_PER_SLOT × defaultParallelism)`` —
    sized from the CLUSTER, not the data, because a stream has no
    batch to probe before the plan exists (unlike the band join's
    eager auto probe); the key-count side of the rule is safe by
    construction since more-cards-per-shard only grows the pandas
    groupby, whose per-card cost the smoke measured flat. On the
    local[32] smoke box auto resolves to 256 — exactly the measured
    default. The shard count is baked into the plan at build time;
    like any state-key change it must stay FIXED across restarts of
    one checkpointed query (state rows are keyed by shard id).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    if isinstance(n_shards, str):
        if n_shards != "auto":
            raise ValueError(
                f"n_shards must be an int or 'auto'; got {n_shards!r}"
            )
        slots = typed_stream.sparkSession.sparkContext.defaultParallelism
        n_shards = max(MIN_AUTO_SHARDS, SHARDS_PER_SLOT * slots)

    timeout_ms = idle_timeout_min * 60_000
    hour_us = 3_600_000_000

    def update(key, pdfs, state):
        import time as _time

        import pandas as _pd

        empty = _pd.DataFrame(
            {"card_num": [], "alert_ts": [], "n_last_hour": []}
        )
        if state.hasTimedOut:
            state.remove()
            yield empty
            return
        store: dict = {}
        if state.exists:
            cards, times_us, last_seen = state.get
            store = {
                c: [list(t), s]
                for c, t, s in zip(cards, times_us, last_seen)
            }
        now = _time.time()
        out_card, out_us, out_n = [], [], []
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            allpdf = _pd.concat(frames) if len(frames) > 1 else frames[0]
            ts = _pd.to_datetime(allpdf["trans_date"])
            keep = ~_pd.isna(ts)  # the NaT-wipe guard, vectorized
            allpdf = _pd.DataFrame(
                {
                    "card_num": allpdf["card_num"][keep],
                    # pandas datetime64[ns] -> unix micros
                    "_us": ts[keep].astype("int64") // 1_000,
                }
            )
            # dropna=False: Spark's groupBy keys NULL card_nums like any
            # other group, and pandas' default groupby silently DROPS
            # None keys — the row-equality contract with the per-key
            # form would break on malformed-card rows (r8 review)
            for card, grp in allpdf.groupby(
                "card_num", sort=False, dropna=False
            ):
                if isinstance(card, float):
                    # pandas reports the NULL group's key as float NaN;
                    # normalize to None so the state row stays an
                    # array<string> null and round-trips across batches
                    card = None
                entry = store.setdefault(card, [[], now])
                recent = entry[0]
                for us in sorted(grp["_us"].tolist()):
                    cutoff = us - hour_us
                    recent.append(us)
                    n_window = sum(1 for t in recent if cutoff < t <= us)
                    if n_window > max_per_hour:
                        out_card.append(card)
                        out_us.append(us)
                        out_n.append(n_window)
                horizon = max(recent) - hour_us
                entry[0] = [t for t in recent if t > horizon]
                entry[1] = now
        # per-card TTL prune: the sharded analog of the per-key timer
        ttl_s = timeout_ms / 1000.0
        store = {c: v for c, v in store.items() if now - v[1] <= ttl_s}
        if store:
            state.update(
                (
                    list(store.keys()),
                    [v[0] for v in store.values()],
                    [v[1] for v in store.values()],
                )
            )
            state.setTimeoutDuration(timeout_ms)
        else:
            state.remove()
        yield _pd.DataFrame(
            {
                "card_num": out_card,
                "alert_ts": _pd.to_datetime(_pd.Series(out_us), unit="us"),
                "n_last_hour": out_n,
            }
        )

    shard = (F.crc32(F.col("card_num")) % n_shards).alias("_shard")
    return (
        typed_stream.select("*", shard)
        .groupBy("_shard")
        .applyInPandasWithState(
            update,
            outputStructType=VELOCITY_SCHEMA,
            stateStructType=VELOCITY_SHARD_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
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
