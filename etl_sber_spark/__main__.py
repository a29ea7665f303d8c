"""Cron-shaped CLI: the reference's nightly batch as one command.

The reference is driven by cron (main.cron:1) invoking a script that
scans an inbox directory, loads each recognized file, and appends the
day's fraud report. This module is that entry point for the Spark
engine::

    python -m etl_sber_spark \
        --inbox /data/inbox --warehouse /data/dwh \
        --bank-dir /data/bank --date 2021-03-01

which runs ``pipeline.run_day``: scan_inbox → terminals SCD2 →
blacklist SCD1 → transactions fact append → fraud mart, with the
deterministic terminals→blacklist→transactions order (SURVEY.md §3.1 —
the reference processes in ``os.listdir`` order, which can join a day's
transactions against a stale terminal version) and file archiving.

``--date`` replaces the reference's ``sysdate`` (P7): the processing
timestamp is explicit, so replaying a day is reproducible. The time
component defaults to 23:50:00, the reference's cron slot.

The external ``bank.clients/accounts/cards`` tables (pre-existing
Oracle tables in the reference, main.py:410-416) are read as parquet
from ``--bank-dir`` (clients.parquet / accounts.parquet /
cards.parquet). A JDBC source can stand in by materializing those
tables to parquet first (sources/jdbc.py).
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import sys


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        prog="python -m etl_sber_spark",
        description="Run one nightly batch day: inbox scan -> warehouse "
        "loads -> fraud mart.",
    )
    p.add_argument("--inbox", required=True, help="landing directory to scan")
    p.add_argument(
        "--warehouse", required=True, help="warehouse root directory"
    )
    p.add_argument(
        "--bank-dir",
        required=True,
        help="directory holding clients.parquet / accounts.parquet / "
        "cards.parquet (the reference's pre-existing bank.* tables)",
    )
    p.add_argument(
        "--date",
        required=True,
        help="processing date YYYY-MM-DD (replaces the reference's sysdate)",
    )
    p.add_argument(
        "--time",
        default="23:50:00",
        help="processing time HH:MM:SS (default 23:50:00, the cron slot)",
    )
    p.add_argument(
        "--until",
        help="BACKFILL mode: replay every day from --date through this "
        "date (inclusive) out of ONE mixed inbox — files are assigned "
        "to days by their embedded DDMMYYYY, each day runs as a full "
        "nightly unit (loads then mart) in ascending order, always "
        "idempotently. The repair tool for an outage window.",
    )
    p.add_argument(
        "--no-archive",
        action="store_true",
        help="leave consumed files in the inbox (default archives them)",
    )
    p.add_argument(
        "--idempotent",
        action="store_true",
        help="overwrite the day's fact/mart partitions instead of "
        "appending (re-running a day corrects instead of duplicating)",
    )
    p.add_argument(
        "--faithful-full-history",
        action="store_true",
        help="reproduce the reference's full-history join trap "
        "(SURVEY.md §3.3) instead of the canonical as-of view",
    )
    args = p.parse_args(argv)
    # validate up front as PARSER errors (usage + exit 2), not Python
    # tracebacks mid-run — and so an empty --until cannot silently fall
    # back to single-day mode, which would load every outage-day file
    # under ONE processing_ts (review finding)

    def _parse(value: str, flag: str, parse):
        try:
            return parse(value)
        except ValueError:
            p.error(f"{flag} must be ISO format, got {value!r}")

    args.date_parsed = _parse(args.date, "--date", dt.date.fromisoformat)
    args.time_parsed = _parse(args.time, "--time", dt.time.fromisoformat)
    args.until_parsed = None
    if args.until is not None:
        args.until_parsed = _parse(
            args.until, "--until", dt.date.fromisoformat
        )
        if args.until_parsed < args.date_parsed:
            p.error(
                f"--until {args.until} is before --date {args.date} — "
                "the backfill range is empty"
            )
    return args


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)
    date = args.date_parsed
    t = args.time_parsed
    processing_ts = dt.datetime.combine(date, t)

    from .pipeline import run_backfill, run_day
    from .session import get_spark

    spark = get_spark("etl-sber-nightly")
    bank = {
        name: spark.read.parquet(f"{args.bank_dir}/{name}.parquet")
        for name in ("clients", "accounts", "cards")
    }
    if args.until_parsed is not None:
        days = run_backfill(
            spark,
            args.inbox,
            args.warehouse,
            bank,
            date,
            args.until_parsed,
            time=t,
            archive=not args.no_archive,
            faithful_full_history=args.faithful_full_history,
        )
        for day, report in days:
            print(
                json.dumps(
                    {
                        "date": day.isoformat(),
                        "processing_ts": dt.datetime.combine(
                            day, t
                        ).isoformat(sep=" "),
                        # null mart_rows = the day had NO files and was
                        # deliberately not touched (a rows-to-zero
                        # correction needs an explicit empty file)
                        "mart_rows": None if report is None else report.count(),
                        "no_files": report is None,
                        "warehouse": args.warehouse,
                        "backfill": True,
                    }
                )
            )
        spark.stop()
        return 0
    report = run_day(
        spark,
        args.inbox,
        args.warehouse,
        bank,
        processing_ts,
        archive=not args.no_archive,
        faithful_full_history=args.faithful_full_history,
        idempotent=args.idempotent,
    )
    n = report.count()
    print(
        json.dumps(
            {
                "date": args.date,
                "processing_ts": processing_ts.isoformat(sep=" "),
                "mart_rows": n,
                "warehouse": args.warehouse,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
