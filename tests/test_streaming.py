"""Streaming inbox (SURVEY.md §2.9): AvailableNow drain + checkpointed
exactly-once per file."""

from __future__ import annotations

import datetime as dt
import shutil

from etl_sber_spark.streaming.inbox import load_transactions_available_now

REF = "/root/reference"


def test_available_now_drain_and_exactly_once(spark, tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    out = str(tmp_path / "fact")
    ckpt = str(tmp_path / "ckpt")
    shutil.copy(f"{REF}/transactions_01032021.txt", inbox / "transactions_01032021.txt")

    q = load_transactions_available_now(
        spark, str(inbox), out, ckpt, dt.datetime(2021, 3, 1, 23, 50)
    )
    q.awaitTermination(120)
    df = spark.read.parquet(out)
    assert df.count() == 15650
    # typed all the way through the stream: no parse nulls
    assert df.filter(df.trans_date.isNull() | df.amt.isNull()).count() == 0

    # run 2: day-1 file still present + day-2 file arrives; checkpoint
    # must skip the processed file (exactly-once, no Archive/ rename)
    shutil.copy(f"{REF}/transactions_02032021.txt", inbox / "transactions_02032021.txt")
    q = load_transactions_available_now(
        spark, str(inbox), out, ckpt, dt.datetime(2021, 3, 2, 23, 50)
    )
    q.awaitTermination(120)
    df = spark.read.parquet(out)
    assert df.count() == 15650 + 15686

    # run 3: nothing new -> no growth
    q = load_transactions_available_now(
        spark, str(inbox), out, ckpt, dt.datetime(2021, 3, 3, 23, 50)
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 15650 + 15686


def test_record_level_dedup_across_files(spark, tmp_path):
    """dedup_ids=True: a transaction re-shipped in a second file lands
    exactly once (dropDuplicates state under the watermark spans
    micro-batches)."""
    import os
    import time

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    header = (
        "transaction_id;transaction_date;amount;card_num;oper_type;"
        "oper_result;terminal\n"
    )
    (inbox / "transactions_a.txt").write_text(
        header
        + "1;2021-03-01 10:00:00;1,00;c1;PAYMENT;SUCCESS;P1\n"
        + "2;2021-03-01 11:00:00;2,00;c2;PAYMENT;SUCCESS;P1\n"
    )
    (inbox / "transactions_b.txt").write_text(
        header
        + "2;2021-03-01 11:00:00;2,00;c2;PAYMENT;SUCCESS;P1\n"  # re-ship
        + "3;2021-03-01 12:00:00;3,00;c3;PAYMENT;SUCCESS;P1\n"
    )
    now = time.time()
    os.utime(inbox / "transactions_a.txt", (now - 60, now - 60))
    os.utime(inbox / "transactions_b.txt", (now, now))

    q = load_transactions_available_now(
        spark,
        str(inbox),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
        dt.datetime(2021, 3, 1, 23, 50),
        dedup_ids=True,
    )
    q.awaitTermination(120)
    df = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r.trans_id for r in df.collect()) == ["1", "2", "3"]


def test_dedup_ids_loads_late_files(spark, tmp_path):
    """Review regression: dedup_ids must suppress RE-SHIPPED ids only.
    The old watermarked implementation dropped every row older than the
    dedup state's watermark as late input — a delayed supplier file
    vanished wholesale, non-duplicates included. The anti-join
    implementation loads late data normally."""
    import os
    import time

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    header = (
        "transaction_id;transaction_date;amount;card_num;oper_type;"
        "oper_result;terminal\n"
    )
    # fresh file: recent event times (advances any watermark far past
    # the late file's events)
    (inbox / "transactions_b.txt").write_text(
        header
        + "10;2021-03-04 11:00:00;2,00;c2;PAYMENT;SUCCESS;P1\n"
        + "11;2021-03-04 12:00:00;3,00;c3;PAYMENT;SUCCESS;P1\n"
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = load_transactions_available_now(
        spark, str(inbox), out, ck, dt.datetime(2021, 3, 4, 23, 50),
        dedup_ids=True,
    )
    q.awaitTermination(120)

    # the LATE file arrives days later: three-day-old events, one of
    # them (id 10) a true re-ship
    (inbox / "transactions_a_late.txt").write_text(
        header
        + "1;2021-03-01 10:00:00;1,00;c1;PAYMENT;SUCCESS;P1\n"
        + "10;2021-03-04 11:00:00;2,00;c2;PAYMENT;SUCCESS;P1\n"
    )
    now = time.time()
    os.utime(inbox / "transactions_a_late.txt", (now, now))
    q = load_transactions_available_now(
        spark, str(inbox), out, ck, dt.datetime(2021, 3, 4, 23, 55),
        dedup_ids=True,
    )
    q.awaitTermination(120)

    df = spark.read.parquet(out)
    # the late NON-duplicate row loaded; the re-ship landed exactly once
    assert sorted(r.trans_id for r in df.collect()) == ["1", "10", "11"]


def test_dedup_ids_does_not_collapse_null_ids(spark, tmp_path):
    """dedup_ids mode: NULL trans_ids are not duplicates of each other.
    dropDuplicates' group-by semantics treat NULLs as equal, so N
    missing-id rows used to collapse to ONE loaded row — silent record
    loss the strict path does not have (r8 review). NULL-key rows load
    like any other; key hygiene stays a downstream gate."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    header = (
        "transaction_id;transaction_date;amount;card_num;oper_type;"
        "oper_result;terminal\n"
    )
    (inbox / "transactions_n.txt").write_text(
        header
        + ";2021-03-01 10:00:00;1,00;c1;PAYMENT;SUCCESS;P1\n"  # NULL id
        + ";2021-03-01 11:00:00;2,00;c2;PAYMENT;SUCCESS;P1\n"  # NULL id
        + "9;2021-03-01 12:00:00;3,00;c3;PAYMENT;SUCCESS;P1\n"
        + "9;2021-03-01 12:00:00;3,00;c3;PAYMENT;SUCCESS;P1\n"  # true dup
    )
    q = load_transactions_available_now(
        spark,
        str(inbox),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
        dt.datetime(2021, 3, 1, 23, 50),
        dedup_ids=True,
    )
    q.awaitTermination(120)
    df = spark.read.parquet(str(tmp_path / "out"))
    assert df.count() == 3  # 2 null-id rows + the deduped id 9
    assert df.filter("trans_id IS NULL").count() == 2
