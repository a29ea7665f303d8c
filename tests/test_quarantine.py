"""Quarantining CSV reader + the smaller operators the main flows don't
reach: scd1_latest, range_violations, read_jdbc error path, ws_tokens."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest

from pyspark.sql import functions as F

from etl_sber_spark.functions.text import ws_tokens
from etl_sber_spark.operators.quality import range_violations
from etl_sber_spark.operators.scd import scd1_latest
from etl_sber_spark.sources.io import read_transactions_csv_quarantine
from etl_sber_spark.sources.jdbc import read_jdbc


def test_quarantine_reader_splits_good_and_bad(spark, tmp_path):
    p = tmp_path / "transactions_x.txt"
    p.write_text(
        "transaction_id;transaction_date;amount;card_num;oper_type;oper_result;terminal\n"
        "1;2021-03-01 10:00:00;100,50;1111 2222;PAYMENT;SUCCESS;P0001\n"
        "2;NOT A DATE;100,50;1111 2222;PAYMENT;SUCCESS;P0001\n"
        "3;2021-03-01 11:00:00;garbage;1111 2222;PAYMENT;SUCCESS;P0001\n"
        "4;2021-03-01 12:00:00;7,25;3333 4444;WITHDRAW;REJECT;A0002\n"
    )
    good, bad = read_transactions_csv_quarantine(spark, str(p))
    g = {r.trans_id: r for r in good.collect()}
    assert set(g) == {"1", "4"}
    assert g["1"].amt == Decimal("100.50")
    assert g["4"].trans_date == dt.datetime(2021, 3, 1, 12, 0, 0)
    b = {r.transaction_id: r for r in bad.collect()}
    assert set(b) == {"2", "3"}
    # raw values preserved for forensics
    assert b["2"].transaction_date == "NOT A DATE"
    assert b["3"].amount == "garbage"


def test_quarantine_on_clean_reference_file(spark):
    good, bad = read_transactions_csv_quarantine(
        spark, "/root/reference/transactions_02032021.txt"
    )
    assert bad.count() == 0
    assert good.count() == 15686


def test_scd1_latest_keeps_newest(spark):
    fact = spark.createDataFrame(
        [
            ("P1", dt.date(2021, 3, 1)),
            ("P1", dt.date(2021, 3, 3)),
            ("P2", dt.date(2021, 3, 2)),
        ],
        ["passport_num", "entry_dt"],
    )
    latest = {
        r.passport_num: r.entry_dt
        for r in scd1_latest(fact, "passport_num", "entry_dt").collect()
    }
    assert latest == {"P1": dt.date(2021, 3, 3), "P2": dt.date(2021, 3, 2)}


def test_range_violations(spark):
    df = spark.createDataFrame([(1,), (5,), (50,)], ["v"])
    assert range_violations(df, "v", lo=2, hi=10).count() == 2  # 1 and 50
    assert range_violations(df, "v", lo=0).count() == 0


def test_read_jdbc_fails_cleanly_without_driver(spark):
    with pytest.raises(Exception):
        read_jdbc(
            spark,
            "jdbc:oracle:thin:@nowhere:1521/x",
            "t",
            partition_column="id",
            lower_bound=0,
            upper_bound=1,
            num_partitions=2,
        )


def test_ws_tokens(spark):
    row = (
        spark.createDataFrame([("  a b   c ",)], ["t"])
        .select(ws_tokens(F.col("t")).alias("toks"))
        .collect()[0]
    )
    assert row.toks == ["a", "b", "c"]


def test_quarantine_accepts_negative_amounts(spark, tmp_path):
    """A refund/reversal ('-100,50') parses in the strict reader, so the
    quarantine reader must rate it GOOD too — the earlier try_to_number
    format had no sign token and silently quarantined valid negatives
    (round-3 review finding). try_cast now applies the strict reader's
    exact cast."""
    p = tmp_path / "transactions_neg.txt"
    p.write_text(
        "transaction_id;transaction_date;amount;card_num;oper_type;oper_result;terminal\n"
        "1;2021-03-01 10:00:00;-100,50;1111 2222;PAYMENT;REVERSAL;P0001\n"
        "2;2021-03-01 11:00:00;garbage;1111 2222;PAYMENT;SUCCESS;P0001\n"
    )
    good, bad = read_transactions_csv_quarantine(spark, str(p))
    g = {r.trans_id: r for r in good.collect()}
    assert set(g) == {"1"}
    assert g["1"].amt == Decimal("-100.50")
    assert bad.count() == 1


def test_read_jdbc_rejects_invalid_sharding_combos(spark):
    with pytest.raises(ValueError, match="not both"):
        read_jdbc(
            spark,
            "jdbc:derby:memory:x",
            "t",
            partition_column="id",
            lower_bound=0,
            upper_bound=10,
            predicates=["id < 5"],
        )
    with pytest.raises(ValueError, match="requires lower_bound"):
        read_jdbc(spark, "jdbc:derby:memory:x", "t", partition_column="id")


def test_archive_file_preserves_earlier_backups(tmp_path):
    from etl_sber_spark.sources.io import archive_file

    first = tmp_path / "f.txt"
    first.write_text("v1")
    p1 = archive_file(str(first))
    again = tmp_path / "f.txt"
    again.write_text("v2 corrected")
    p2 = archive_file(str(again))
    assert p1 != p2
    assert open(p1).read() == "v1"  # forensic copy of delivery 1 intact
    assert open(p2).read() == "v2 corrected"


def test_xlsx_cell_stringify():
    from etl_sber_spark.sources.io import _cell_str

    assert _cell_str(None) is None
    assert _cell_str(4511123456) == "4511123456"
    assert _cell_str(4511123456.0) == "4511123456"  # Excel numeric cell
    assert _cell_str(1.5) == "1.5"
    assert _cell_str("P0001") == "P0001"


def test_quarantine_null_fields_match_strict_reader(spark, tmp_path):
    """Review regression: a NULL (empty) field is not a PARSE failure —
    the strict reader keeps such rows with NULL typed values, so the
    quarantining reader must route them to `good` too (its documented
    contract is accept-set parity with the strict reader). Only rows
    whose PRESENT values fail to parse are quarantined."""
    from etl_sber_spark.sources.io import read_transactions_csv

    p = tmp_path / "transactions_nulls.txt"
    p.write_text(
        "transaction_id;transaction_date;amount;card_num;oper_type;oper_result;terminal\n"
        "1;2021-03-01 10:00:00;;1111 2222;PAYMENT;SUCCESS;P0001\n"   # empty amount
        "2;;100,50;1111 2222;PAYMENT;SUCCESS;P0001\n"                 # empty date
        ";2021-03-01 12:00:00;7,25;3333 4444;WITHDRAW;REJECT;A0002\n" # empty id
        "4;NOT A DATE;1,00;1111 2222;PAYMENT;SUCCESS;P0001\n"         # real parse failure
    )
    strict = read_transactions_csv(spark, str(p)).filter("trans_id != '4' or trans_id is null")
    good, bad = read_transactions_csv_quarantine(spark, str(p))
    assert bad.count() == 1
    assert bad.collect()[0].transaction_id == "4"
    # good == the strict reader's rows (minus the one strict would die on)
    key = lambda t: (t[0] is None, str(t))
    g = sorted(
        ((r.trans_id, r.trans_date, r.amt) for r in good.collect()), key=key
    )
    s = sorted(
        ((r.trans_id, r.trans_date, r.amt) for r in strict.collect()), key=key
    )
    assert g == s
    assert len(g) == 3
