"""Backfill mode (pipeline.run_backfill + the CLI --until flag): the
outage-repair path — one mixed inbox, per-day file assignment by the
embedded DDMMYYYY, ascending idempotent day units — must reach the
same golden end states as the sequential daily replay."""

from __future__ import annotations

import datetime as dt
import shutil

import pytest
from pyspark.sql import functions as F

from etl_sber_spark.pipeline import (
    T_BLACKLIST,
    T_FACT,
    T_HIST,
    T_MART,
    run_backfill,
)
from etl_sber_spark.sinks.warehouse import Warehouse
from etl_sber_spark.sources.io import file_date, read_terminals_xlsx

from .fixtures_bank import build_bank_tables

REF = "/root/reference"
DAYS = ("01", "02", "03")


def test_file_date_parsing():
    assert file_date("/x/transactions_01032021.txt") == dt.date(2021, 3, 1)
    assert file_date("terminals_31122021.xlsx") == dt.date(2021, 12, 31)
    assert file_date("passport_blacklist_02032021.xlsx") == dt.date(2021, 3, 2)
    assert file_date("readme.txt") is None
    assert file_date("transactions_99992021.txt") is None  # invalid date


@pytest.fixture(scope="module")
def backfilled(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("backfill")
    inbox = root / "inbox"
    inbox.mkdir()
    # ALL three days' files land in one inbox at once (the outage
    # shape), plus a file outside the range that must remain untouched
    for day in DAYS:
        for pat in (
            f"transactions_{day}032021.txt",
            f"terminals_{day}032021.xlsx",
            f"passport_blacklist_{day}032021.xlsx",
        ):
            shutil.copy(f"{REF}/{pat}", inbox / pat)
    shutil.copy(
        f"{REF}/transactions_01032021.txt",
        inbox / "transactions_05032021.txt",
    )
    wh_root = str(root / "wh")
    out = run_backfill(
        spark,
        str(inbox),
        wh_root,
        build_bank_tables(spark),
        dt.date(2021, 3, 1),
        dt.date(2021, 3, 3),
    )
    return Warehouse(spark, wh_root), out, inbox


def test_backfill_processes_days_ascending(backfilled):
    _, out, _ = backfilled
    assert [d for d, _ in out] == [dt.date(2021, 3, i) for i in (1, 2, 3)]
    assert all(r.count() > 0 for _, r in out)


def test_backfill_reaches_golden_states(backfilled):
    wh, _, _ = backfilled
    # the same pins as the sequential golden replay / CLI test
    fact = wh.read(T_FACT)
    assert fact.count() == 15650 + 15686 + 15780
    assert wh.read(T_BLACKLIST).count() == 24
    hist = wh.read(T_HIST)
    a = hist.filter(F.col("terminal_id") == "A8966").collect()
    assert len(a) == 3
    assert sum(str(r.effective_to).startswith("2999") for r in a) == 1
    p = hist.filter(F.col("terminal_id") == "P9111").collect()
    assert len(p) == 2
    assert sum(r.deleted_flg == 1 for r in p) == 1
    mart_days = {
        r.report_dt
        for r in wh.read(T_MART).select("report_dt").distinct().collect()
    }
    assert mart_days == {dt.date(2021, 3, i) for i in (1, 2, 3)}


def test_backfill_leaves_out_of_range_files(backfilled):
    import os

    _, _, inbox = backfilled
    left = [
        e for e in os.listdir(inbox) if not e.startswith(("Archive", "."))
    ]
    # only the out-of-range day-5 file remains for the regular nightly
    assert left == ["transactions_05032021.txt"]


def test_backfill_rerun_is_a_correction_not_a_duplication(
    spark, backfilled, tmp_path
):
    """Re-running the same range out of a re-delivered inbox must leave
    counts unchanged — fact/mart partitions overwrite, SCD2 replays as
    a no-op, blacklist appends nothing new."""
    wh, _, _ = backfilled
    inbox2 = tmp_path / "redelivery"
    inbox2.mkdir()
    for day in DAYS:
        for pat in (
            f"transactions_{day}032021.txt",
            f"terminals_{day}032021.xlsx",
            f"passport_blacklist_{day}032021.xlsx",
        ):
            shutil.copy(f"{REF}/{pat}", inbox2 / pat)
    run_backfill(
        spark,
        str(inbox2),
        wh.root,
        build_bank_tables(spark),
        dt.date(2021, 3, 1),
        dt.date(2021, 3, 3),
    )
    assert wh.read(T_FACT).count() == 15650 + 15686 + 15780
    assert wh.read(T_BLACKLIST).count() == 24
    assert wh.read(T_HIST).filter(
        F.col("terminal_id") == "A8966"
    ).count() == 3


def test_range_day_without_files_is_surfaced_not_skipped(
    spark, tmp_path
):
    """Review regression: a day inside the range with no files must
    appear in the output as (day, None) — a typo'd range or missing
    correction file is visible, not silently absent."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    shutil.copy(
        f"{REF}/transactions_01032021.txt",
        inbox / "transactions_01032021.txt",
    )
    out = run_backfill(
        spark,
        str(inbox),
        str(tmp_path / "wh"),
        build_bank_tables(spark),
        dt.date(2021, 3, 1),
        dt.date(2021, 3, 3),
    )
    assert [(d, r is None) for d, r in out] == [
        (dt.date(2021, 3, 1), False),
        (dt.date(2021, 3, 2), True),
        (dt.date(2021, 3, 3), True),
    ]


def test_stale_terminals_snapshot_skipped_not_applied(
    spark, backfilled, tmp_path
):
    """Review regression: scd2_apply is forward-only — a terminals
    snapshot dated behind existing history would close the OPEN (later)
    version with an inverted interval. The backfill skips it (the
    streaming high-water rule), QUARANTINES the file to Rejected/
    (leaving it in the inbox would let the next nightly apply it at a
    newer processing_ts — ADVICE round 4), and still processes the
    day's facts."""
    import os

    wh, _, _ = backfilled
    before = sorted(
        (r.terminal_id, str(r.effective_from), str(r.effective_to))
        for r in wh.read(T_HIST).collect()
    )
    late = tmp_path / "late_inbox"
    late.mkdir()
    # a DIFFERENT day-2 terminals snapshot arriving after day 3 applied
    shutil.copy(
        f"{REF}/terminals_01032021.xlsx", late / "terminals_02032021.xlsx"
    )
    shutil.copy(
        f"{REF}/transactions_02032021.txt",
        late / "transactions_02032021.txt",
    )
    out = run_backfill(
        spark,
        str(late),
        wh.root,
        build_bank_tables(spark),
        dt.date(2021, 3, 2),
        dt.date(2021, 3, 2),
    )
    # history untouched — no inverted intervals, no resurrected attrs
    after = sorted(
        (r.terminal_id, str(r.effective_from), str(r.effective_to))
        for r in wh.read(T_HIST).collect()
    )
    assert after == before
    # the stale snapshot left the SCANNED inbox into Rejected/ (not
    # Archive/ — it was never applied); the transactions file processed
    left = [
        e
        for e in os.listdir(late)
        if not e.startswith(("Archive", "Rejected", "."))
    ]
    assert left == []
    assert os.listdir(late / "Rejected") == ["terminals_02032021.xlsx"]
    assert out[0][1] is not None


def test_nightly_run_day_quarantines_stale_terminals(
    spark, backfilled, tmp_path
):
    """ADVICE round 4 (medium): the regular nightly needs its own
    forward-only guard — a stale snapshot reaching run_day would be
    applied at a NEWER processing_ts, closing current SCD2 versions and
    resurrecting old attributes as current. The guard keys on the
    file-name-embedded date vs the history high-water mark and
    quarantines the file."""
    import os

    from etl_sber_spark.pipeline import run_day

    wh, _, _ = backfilled
    before = sorted(
        (r.terminal_id, str(r.effective_from), str(r.effective_to))
        for r in wh.read(T_HIST).collect()
    )
    late = tmp_path / "nightly_inbox"
    late.mkdir()
    # a day-2 snapshot (different content) surfacing after day 3 applied
    shutil.copy(
        f"{REF}/terminals_01032021.xlsx", late / "terminals_02032021.xlsx"
    )
    run_day(
        spark,
        str(late),
        wh.root,
        build_bank_tables(spark),
        dt.datetime(2021, 3, 6, 23, 50),
        idempotent=True,
    )
    after = sorted(
        (r.terminal_id, str(r.effective_from), str(r.effective_to))
        for r in wh.read(T_HIST).collect()
    )
    assert after == before
    assert os.listdir(late / "Rejected") == ["terminals_02032021.xlsx"]


def test_cli_backfill_validation():
    from etl_sber_spark.__main__ import parse_args

    base = ["--inbox", "i", "--warehouse", "w", "--bank-dir", "b"]
    with pytest.raises(SystemExit):
        parse_args(base + ["--date", "2021-3-5"])  # bad format
    with pytest.raises(SystemExit):
        parse_args(base + ["--date", "2021-03-05", "--until", ""])
    with pytest.raises(SystemExit):
        parse_args(base + ["--date", "2021-03-05", "--until", "2021-03-01"])
    ok = parse_args(base + ["--date", "2021-03-01", "--until", "2021-03-05"])
    assert ok.until_parsed == dt.date(2021, 3, 5)


def test_outage_inbox_applies_newest_snapshot_only(spark, tmp_path):
    """run_day on an inbox holding TWO terminals snapshots (outage
    catch-up): all files share one processing_ts, so only the
    newest-dated snapshot loads — the older quarantines as superseded.
    Name order would have applied April BEFORE late March ('0' < '2'),
    and a second same-ts apply writes inverted SCD2 intervals (r8
    review). Per-day history is run_backfill's job."""
    import os

    from etl_sber_spark.pipeline import run_day

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    # older snapshot dated 25/03, newer dated 01/04 — lexicographically
    # REVERSED ('terminals_0104...' < 'terminals_2503...')
    shutil.copy(
        f"{REF}/terminals_01032021.xlsx", inbox / "terminals_25032021.xlsx"
    )
    shutil.copy(
        f"{REF}/terminals_02032021.xlsx", inbox / "terminals_01042021.xlsx"
    )
    shutil.copy(
        f"{REF}/transactions_01032021.txt", inbox / "transactions_01032021.txt"
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ts = dt.datetime(2021, 4, 1, 23, 50)
    run_day(spark, str(inbox), wh.root, build_bank_tables(spark), ts)

    hist = wh.read(T_HIST)
    # exactly the newer snapshot's state, one version per terminal, no
    # inverted intervals
    n_day2 = read_terminals_xlsx(
        spark, f"{REF}/terminals_02032021.xlsx"
    ).count()
    assert hist.count() == n_day2
    assert (
        hist.filter(F.col("effective_to") < F.col("effective_from")).count()
        == 0
    )
    assert os.listdir(inbox / "Rejected") == ["terminals_25032021.xlsx"]


def test_undated_terminals_file_is_quarantined(spark, tmp_path):
    """A terminals file without a parseable _DDMMYYYY date used to skip
    the forward-only comparison entirely and load unconditionally — a
    renamed old snapshot could silently resurrect stale attributes (r8
    review). It quarantines instead."""
    import os

    from etl_sber_spark.pipeline import run_day

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    shutil.copy(f"{REF}/terminals_01032021.xlsx", inbox / "terminals_old.xlsx")
    shutil.copy(
        f"{REF}/transactions_01032021.txt", inbox / "transactions_01032021.txt"
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    run_day(
        spark, str(inbox), wh.root, build_bank_tables(spark),
        dt.datetime(2021, 3, 1, 23, 50),
    )
    assert not wh.has_data(T_HIST)  # nothing loaded
    assert os.listdir(inbox / "Rejected") == ["terminals_old.xlsx"]


def test_changed_content_replay_at_original_ts_refused(spark, tmp_path):
    """load_terminals refuses a CHANGED snapshot replayed at its
    original processing_ts: the close-out would write effective_to =
    ts−1s under versions opened AT ts — permanently inverted intervals
    the full-history mart would multiply (r8 review). The same
    correction at a later ts loads cleanly."""
    from etl_sber_spark.pipeline import load_terminals

    wh = Warehouse(spark, str(tmp_path / "wh"))
    ts = dt.datetime(2021, 3, 1, 23, 50)
    snap1 = read_terminals_xlsx(spark, f"{REF}/terminals_01032021.xlsx")
    load_terminals(wh, snap1, ts)
    # identical replay at the same ts: the documented no-op, still fine
    load_terminals(wh, snap1, ts)
    snap2 = read_terminals_xlsx(spark, f"{REF}/terminals_02032021.xlsx")
    import pytest

    with pytest.raises(ValueError, match="inverted"):
        load_terminals(wh, snap2, ts)
    # history untouched by the refused load
    assert (
        wh.read(T_HIST)
        .filter(F.col("effective_to") < F.col("effective_from"))
        .count()
        == 0
    )
    load_terminals(wh, snap2, ts + dt.timedelta(hours=1))
    assert (
        wh.read(T_HIST)
        .filter(F.col("effective_to") < F.col("effective_from"))
        .count()
        == 0
    )
