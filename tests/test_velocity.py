"""Streaming velocity rule: trailing-1h per-card burst detection with
state carried across micro-batches."""

from __future__ import annotations

import pytest

from etl_sber_spark.streaming.inbox import stream_transactions
from etl_sber_spark.streaming.rollup import velocity_alerts



#: r12 suite tiering (VERDICT r11 #3): stateful streaming with timers across micro-batches; rule algebra fast-covered by test_fraud_parity.
pytestmark = pytest.mark.slow

@pytest.fixture(autouse=True)
def _no_empty_batches(spark):
    """ProcessingTimeTimeout state keeps an availableNow query alive
    firing EMPTY micro-batches until the 6h timers expire, so every
    awaitTermination(180) here used to burn its full 180 s. Nothing in
    this module asserts timer-expiry behavior — drain and stop."""
    old = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    yield
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", old)

HEADER = (
    "transaction_id;transaction_date;amount;card_num;oper_type;"
    "oper_result;terminal\n"
)


def _file(path, rows):
    path.write_text(
        HEADER
        + "".join(
            f"{i};{ts};10,00;{card};PAYMENT;SUCCESS;P0001\n"
            for i, (ts, card) in enumerate(rows)
        )
    )


def test_velocity_alerts_across_batches(spark, tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    burst_card = "9999 0000"
    quiet_card = "1111 2222"
    # batch 1: 4 tx for the burst card inside one hour (below threshold
    # of 5), plus noise on the quiet card
    _file(
        inbox / "transactions_b1.txt",
        [(f"2021-03-01 10:0{m}:00", burst_card) for m in range(4)]
        + [("2021-03-01 10:05:00", quiet_card)],
    )
    # batch 2: 2 more inside the same hour -> crossings at #6 (and #5... )
    _file(
        inbox / "transactions_b2.txt",
        [
            ("2021-03-01 10:30:00", burst_card),
            ("2021-03-01 10:40:00", burst_card),
            # and one far outside the window: no alert
            ("2021-03-01 14:00:00", burst_card),
        ],
    )
    # pin micro-batch order: the file source picks files by mtime
    import os
    import time

    now = time.time()
    os.utime(inbox / "transactions_b1.txt", (now - 60, now - 60))
    os.utime(inbox / "transactions_b2.txt", (now, now))

    typed = stream_transactions(spark, str(inbox), max_files_per_trigger=1)
    q = (
        velocity_alerts(typed, max_per_hour=5)
        .writeStream.format("memory")
        .queryName("velocity_t")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    alerts = spark.sql("SELECT * FROM velocity_t").collect()
    # only the burst card alerts, only for the 6th tx in the trailing
    # hour (state from batch 1 must carry into batch 2)
    assert {r.card_num for r in alerts} == {burst_card}
    assert len(alerts) == 1
    assert alerts[0].n_last_hour == 6
    assert str(alerts[0].alert_ts) == "2021-03-01 10:40:00"


def test_malformed_timestamp_does_not_wipe_velocity_state(spark, tmp_path):
    """A NULL trans_date (malformed timestamp -> NaT) must be DROPPED,
    not processed: a NaT cutoff comparison is False for every retained
    timestamp, so one bad row used to discard the card's whole
    trailing-hour window and suppress the alert for a real burst
    (round-3 review finding)."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    card = "9999 0000"
    rows = [(f"2021-03-01 10:0{m}:00", card) for m in range(5)]
    # EMPTY timestamp field -> NULL through the strict reader (ANSI
    # to_timestamp nulls on NULL input; garbage TEXT would instead fail
    # the query, which is the strict reader's separate contract)
    rows.append(("", card))
    rows.append(("2021-03-01 10:30:00", card))  # 6th valid tx: alert
    _file(inbox / "transactions_nat.txt", rows)

    typed = stream_transactions(spark, str(inbox))
    q = (
        velocity_alerts(typed, max_per_hour=5)
        .writeStream.format("memory")
        .queryName("velocity_nat")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    alerts = spark.sql("SELECT * FROM velocity_nat").collect()
    assert len(alerts) == 1
    assert alerts[0].n_last_hour == 6
    assert str(alerts[0].alert_ts) == "2021-03-01 10:30:00"


def test_late_event_does_not_count_future_transactions(spark, tmp_path):
    """Review regression: an event's rule window is the two-sided
    (ts-1h, ts]. A late cross-batch event used to be counted against
    every FUTURE timestamp already in state — 5 on-time transactions
    plus one late 11:50 arrival fired a spurious n_last_hour=6 alert
    although no real trailing hour ever held more than 5."""
    import os
    import time

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    card = "7777 8888"
    # batch 1: exactly max_per_hour tx between 12:00-12:40 -> no alert
    _file(
        inbox / "transactions_b1.txt",
        [(f"2021-03-01 12:{m:02d}:00", card) for m in (0, 10, 20, 30, 40)],
    )
    # batch 2: one LATE event at 11:50 — its own trailing hour
    # (10:50, 11:50] holds only itself: still no alert
    _file(inbox / "transactions_b2.txt", [("2021-03-01 11:50:00", card)])
    now = time.time()
    os.utime(inbox / "transactions_b1.txt", (now - 60, now - 60))
    os.utime(inbox / "transactions_b2.txt", (now, now))

    typed = stream_transactions(spark, str(inbox), max_files_per_trigger=1)
    q = (
        velocity_alerts(typed, max_per_hour=5)
        .writeStream.format("memory")
        .queryName("velocity_late")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert spark.sql("SELECT * FROM velocity_late").count() == 0


def _run_stream(spark, tmp_path, build, name):
    import os
    import time

    inbox = tmp_path / f"inbox_{name}"
    ck = tmp_path / f"ck_{name}"
    inbox.mkdir()
    burst = "9999 0000"
    quiet = "1111 2222"
    _file(
        inbox / "b1.txt",
        [(f"2021-03-01 10:0{m}:00", burst) for m in range(4)]
        + [("2021-03-01 10:05:00", quiet)]
        # a NULL-card burst (empty CSV field -> NULL): Spark's groupBy
        # keys NULL like any group, so the per-key form alerts on the
        # 6th row — the sharded form must not silently drop the NULL
        # group (pandas dropna default — r8 review)
        + [(f"2021-03-01 11:0{m}:00", "") for m in range(6)],
    )
    _file(
        inbox / "b2.txt",
        [
            ("2021-03-01 10:30:00", burst),
            ("2021-03-01 10:40:00", burst),
            ("2021-03-01 14:00:00", burst),
            ("", burst),  # NaT guard must hold in both forms
        ],
    )
    now = time.time()
    os.utime(inbox / "b1.txt", (now - 60, now - 60))
    os.utime(inbox / "b2.txt", (now, now))
    typed = stream_transactions(spark, str(inbox), max_files_per_trigger=1)
    q = (
        build(typed)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return sorted(
        ((r.card_num, str(r.alert_ts), r.n_last_hour)
         for r in spark.sql(f"SELECT * FROM {name}").collect()),
        key=lambda t: (t[0] is None, t[0] or "", t[1], t[2]),
    )


def test_sharded_velocity_row_equal_to_per_key(spark, tmp_path):
    """velocity_alerts_sharded is the same algebra at shard-state
    granularity — alert rows must be identical across batches,
    including the cross-batch state carry and the NaT guard
    (n_shards=2 forces both cards through shared shard groups)."""
    from etl_sber_spark.streaming.rollup import velocity_alerts_sharded

    per_key = _run_stream(
        spark, tmp_path, lambda t: velocity_alerts(t, max_per_hour=5),
        "vel_pk",
    )
    sharded = _run_stream(
        spark,
        tmp_path,
        lambda t: velocity_alerts_sharded(t, max_per_hour=5, n_shards=2),
        "vel_sh",
    )
    assert per_key == sharded
    # the burst-card alert AND the NULL-card alert, in both forms
    assert len(per_key) == 2
    assert (None, "2021-03-01 11:05:00", 6) in per_key
    assert ("9999 0000", "2021-03-01 10:40:00", 6) in per_key


def test_sharded_velocity_many_cards_one_shard(spark, tmp_path):
    """Many cards hashing into ONE shard stay independent: bursts on
    two cards alert separately, a quiet card never does."""
    import os
    import time

    from etl_sber_spark.streaming.rollup import velocity_alerts_sharded

    inbox = tmp_path / "inbox1s"
    inbox.mkdir()
    a, b, quiet = "4000 0001", "4000 0002", "4000 0003"
    rows = []
    for card in (a, b):
        rows += [(f"2021-03-01 09:{m:02d}:00", card) for m in range(6)]
    rows += [("2021-03-01 09:00:00", quiet)]
    _file(inbox / "one.txt", rows)
    q = (
        velocity_alerts_sharded(
            stream_transactions(spark, str(inbox)), max_per_hour=5,
            n_shards=1,
        )
        .writeStream.format("memory")
        .queryName("vel_one_shard")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck1s"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    alerts = spark.sql("SELECT * FROM vel_one_shard").collect()
    assert {r.card_num for r in alerts} == {a, b}
    for r in alerts:
        assert r.n_last_hour == 6 and str(r.alert_ts) == "2021-03-01 09:05:00"


def test_sharded_velocity_auto_shards(spark, tmp_path):
    """n_shards="auto" (r9): sizes shards from the cluster's task slots
    (8×, floored at 64), is row-equal to the per-key form, and rejects
    any other string instead of silently degrading."""
    import pytest

    from etl_sber_spark.streaming.rollup import (
        MIN_AUTO_SHARDS,
        SHARDS_PER_SLOT,
        velocity_alerts_sharded,
    )

    slots = spark.sparkContext.defaultParallelism
    expect = max(MIN_AUTO_SHARDS, SHARDS_PER_SLOT * slots)
    assert expect >= slots  # never fewer shards than task slots

    with pytest.raises(ValueError, match="n_shards"):
        velocity_alerts_sharded(
            spark.readStream.format("rate").load(), n_shards="Auto"
        )

    per_key = _run_stream(
        spark, tmp_path, lambda t: velocity_alerts(t, max_per_hour=5),
        "vel_pk_auto",
    )
    auto = _run_stream(
        spark,
        tmp_path,
        lambda t: velocity_alerts_sharded(
            t, max_per_hour=5, n_shards="auto"
        ),
        "vel_sh_auto",
    )
    assert per_key == auto and len(auto) == 2
