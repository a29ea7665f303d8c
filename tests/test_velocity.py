"""Streaming velocity rule: trailing-1h per-card burst detection with
state carried across micro-batches."""

from __future__ import annotations

from etl_sber_spark.streaming.inbox import stream_transactions
from etl_sber_spark.streaming.rollup import velocity_alerts

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
