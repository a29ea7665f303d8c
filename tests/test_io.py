"""Ingestion readers vs the three real reference data files
(/root/reference — readable fixtures; SURVEY.md §5.1 calls them the
reference's de-facto engineered test assets)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest

from etl_sber_spark.sources import io as src

REF = "/root/reference"


@pytest.mark.parametrize(
    "day,expected", [("01", 15650), ("02", 15686), ("03", 15780)]
)
def test_transactions_row_counts(spark, day, expected):
    df = src.read_transactions_csv(spark, f"{REF}/transactions_{day}032021.txt")
    assert df.count() == expected


def test_transactions_day2_padding_normalized(spark):
    """Day-2 file pads headers and values (§1.4 quirk 2); canonical
    behavior trims everything and parses the padded timestamp."""
    df = src.read_transactions_csv(spark, f"{REF}/transactions_02032021.txt")
    row = df.filter(df.trans_id == "43853694275").collect()[0]
    assert row.oper_type == "DEPOSIT"  # raw value is ' DEPOSIT'
    assert row.trans_date == dt.datetime(2021, 3, 2, 0, 0, 0)
    assert row.amt == Decimal("7000.00")  # raw '7000,00' comma decimal
    assert row.terminal == "A3763"
    # no nulls introduced anywhere by parsing
    assert df.filter(df.trans_date.isNull() | df.amt.isNull()).count() == 0


def test_transactions_card_num_spaces_kept(spark):
    """Card numbers keep internal spaces ('4600 5574 2101 5919') —
    only edge whitespace is trimmed; the join key is the trimmed value
    (main.py:416)."""
    df = src.read_transactions_csv(spark, f"{REF}/transactions_02032021.txt")
    row = df.filter(df.trans_id == "43853694275").collect()[0]
    assert row.card_num == "4600 5574 2101 5919"


@pytest.mark.parametrize("day,expected", [("01", 150), ("02", 151), ("03", 150)])
def test_terminals_row_counts(spark, day, expected):
    df = src.read_terminals_xlsx(spark, f"{REF}/terminals_{day}032021.xlsx")
    assert df.count() == expected
    assert df.columns == [
        "terminal_id",
        "terminal_type",
        "terminal_city",
        "terminal_address",
    ]


def test_terminals_utf8_content(spark):
    df = src.read_terminals_xlsx(spark, f"{REF}/terminals_01032021.xlsx")
    row = df.filter(df.terminal_id == "A1096").collect()[0]
    assert row.terminal_city == "Кемерово"
    assert row.terminal_address.startswith("г. Кемерово")


@pytest.mark.parametrize("day,expected", [("01", 7), ("02", 15), ("03", 24)])
def test_blacklist_row_counts_and_blank_rows_dropped(spark, day, expected):
    """Day-1 sheet has 17 styled-blank rows after the 7 real ones (§1.4
    quirk 4) — the reader must drop them, not stage NaNs."""
    df = src.read_blacklist_xlsx(
        spark, f"{REF}/passport_blacklist_{day}032021.xlsx"
    )
    assert df.count() == expected
    assert df.filter(df.passport_num.isNull() | df.entry_dt.isNull()).count() == 0


def test_blacklist_reorder_and_serial_dates(spark):
    """File columns are (date, passport) with Excel-serial dates; output
    is (passport_num, entry_dt date) (§1.4 quirks 4-5, main.py:212-223)."""
    df = src.read_blacklist_xlsx(spark, f"{REF}/passport_blacklist_01032021.xlsx")
    assert df.columns == ["passport_num", "entry_dt"]
    rows = {r.passport_num: r.entry_dt for r in df.collect()}
    assert rows["9933 106914"] == dt.date(2021, 3, 1)  # serial 44256


def test_inbox_scan_deterministic_order(tmp_path):
    for n in (
        "transactions_01032021.txt",
        "passport_blacklist_01032021.xlsx",
        "terminals_01032021.xlsx",
        "unrelated.bin",
    ):
        (tmp_path / n).write_bytes(b"")
    kinds = [k for k, _ in src.scan_inbox(str(tmp_path))]
    assert kinds == ["terminals", "blacklist", "transactions"]


def test_archive_file(tmp_path):
    p = tmp_path / "transactions_01032021.txt"
    p.write_text("x")
    dest = src.archive_file(str(p))
    assert not p.exists()
    assert dest.endswith("Archive/transactions_01032021.txt.backup")
    import os

    assert os.path.exists(dest)


def test_load_table_normalizes_timestamp_physical_types(spark):
    """Round-3 regression: the driver regenerated testdata with
    TIMESTAMP(MICROS, isAdjustedToUTC=false) columns, which Spark 4
    infers as TIMESTAMP_NTZ — a type the engine's timestamp algebra
    (unix_micros band keys, SCD sentinels, NTZ/LTZ unions) rejects.
    load_table must hand every downstream operator plain TIMESTAMP
    regardless of the parquet physical encoding (nanos-as-long in
    rounds 1-2, NTZ micros in round 3)."""
    from pyspark.sql import types as T

    from etl_sber_spark.sources.tables import load_table

    for table, col in (
        ("events", "ts"),
        ("orders", "o_orderdate"),
        ("lineitem", "l_shipdate"),
    ):
        dt = load_table(spark, "/root/testdata/sf0.001", table).schema[col].dataType
        assert isinstance(dt, T.TimestampType), f"{table}.{col} is {dt}"


def test_xlsx_reader_picks_lowest_numbered_sheet(tmp_path):
    """"First worksheet" must mean sheet1.xml regardless of zip member
    order: archive order is producer-dependent, and the old
    first-entry-wins selection read whatever sheet happened to be
    stored first (round-3 review finding)."""
    import zipfile

    from etl_sber_spark.sources.xlsx import read_table

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'

    def sheet_xml(header, value):
        return (
            f'<worksheet {ns}><sheetData>'
            f'<row r="1"><c r="A1" t="inlineStr"><is><t>{header}</t></is></c></row>'
            f'<row r="2"><c r="A2" t="inlineStr"><is><t>{value}</t></is></c></row>'
            "</sheetData></worksheet>"
        )

    p = tmp_path / "multi.xlsx"
    with zipfile.ZipFile(p, "w") as z:
        # deliberately store sheet10 and sheet2 BEFORE sheet1
        z.writestr("xl/worksheets/sheet10.xml", sheet_xml("wrong10", "x"))
        z.writestr("xl/worksheets/sheet2.xml", sheet_xml("wrong2", "y"))
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml("passport", "4511"))
    header, rows = read_table(str(p))
    assert header == ["passport"]
    assert rows == [["4511"]]
