"""CLI golden test (VERDICT r2 #5): replay the reference's three shipped
days through ``python -m etl_sber_spark`` — the cron-shaped entry point
(main.cron:1) — as real subprocesses, then assert the same warehouse end
states as tests/test_pipeline_golden.py.

Each day is one subprocess with cwd OUTSIDE the repo (the round-1
lesson: executor workers don't inherit the repo on sys.path, so this
also exercises the PYTHONPATH-only deployment shape a cron job uses).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import subprocess
import sys

import pytest

from pyspark.sql import functions as F

from etl_sber_spark.pipeline import T_BLACKLIST, T_FACT, T_HIST, T_MART
from etl_sber_spark.sinks.warehouse import Warehouse

from .fixtures_bank import build_bank_tables


#: r12 suite tiering (VERDICT r11 #3): pipeline CLI subprocess JVMs; pipeline logic fast-covered by test_pipeline_golden.
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
DAYS = ("01", "02", "03")


@pytest.fixture(scope="module")
def cli_replayed(spark, tmp_path_factory):
    """Run the 3-day replay via the CLI; yield (warehouse, stdout rows)."""
    root = tmp_path_factory.mktemp("cli_golden")
    wh_root = str(root / "warehouse")
    bank_dir = root / "bank"
    bank = build_bank_tables(spark)
    for name in ("clients", "accounts", "cards"):
        bank[name].write.mode("overwrite").parquet(
            str(bank_dir / f"{name}.parquet")
        )

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the CLI owns its own SparkSession; keep it small for the test
    env["SPARK_GRAFT_CPUS"] = "4"

    summaries = []
    for day in DAYS:
        inbox = root / f"inbox_{day}"
        inbox.mkdir()
        for pat in (
            f"transactions_{day}032021.txt",
            f"terminals_{day}032021.xlsx",
            f"passport_blacklist_{day}032021.xlsx",
        ):
            shutil.copy(f"{REF}/{pat}", inbox / pat)
        proc = subprocess.run(
            [
                sys.executable,
                "-m",
                "etl_sber_spark",
                "--inbox",
                str(inbox),
                "--warehouse",
                wh_root,
                "--bank-dir",
                str(bank_dir),
                "--date",
                f"2021-03-{day}",
            ],
            capture_output=True,
            text=True,
            env=env,
            cwd=str(root),  # NOT the repo root — cron-shaped deployment
            timeout=600,
        )
        assert proc.returncode == 0, f"day {day} failed:\n{proc.stderr[-2000:]}"
        summaries.append(json.loads(proc.stdout.strip().splitlines()[-1]))
        # inbox fully archived by the run
        leftover = [
            e for e in os.listdir(inbox) if not e.startswith(("Archive", "."))
        ]
        assert leftover == [], f"day {day} left files in inbox: {leftover}"
    return Warehouse(spark, wh_root), summaries


def test_cli_reports_each_day(cli_replayed):
    _, summaries = cli_replayed
    assert [s["date"] for s in summaries] == [f"2021-03-{d}" for d in DAYS]
    assert all(s["mart_rows"] > 0 for s in summaries)


def test_cli_fact_complete(cli_replayed):
    wh, _ = cli_replayed
    fact = wh.read(T_FACT)
    assert fact.count() == 15650 + 15686 + 15780
    days = {r.load_date for r in fact.select("load_date").distinct().collect()}
    assert days == {dt.date(2021, 3, 1), dt.date(2021, 3, 2), dt.date(2021, 3, 3)}


def test_cli_blacklist_cumulative(cli_replayed):
    wh, _ = cli_replayed
    assert wh.read(T_BLACKLIST).count() == 24


def test_cli_scd2_states(cli_replayed):
    wh, _ = cli_replayed
    hist = wh.read(T_HIST)
    # same pins as the in-process golden replay: A8966 3 versions (one
    # open), P9111 closed v1 + open tombstone, P6934 2 versions
    a = hist.filter(F.col("terminal_id") == "A8966").collect()
    assert len(a) == 3
    assert sum(str(r.effective_to).startswith("2999") for r in a) == 1
    p = hist.filter(F.col("terminal_id") == "P9111").collect()
    assert len(p) == 2
    assert sum(r.deleted_flg == 1 for r in p) == 1
    assert hist.filter(F.col("terminal_id") == "P6934").count() == 2


def test_cli_mart_partitions(cli_replayed):
    wh, _ = cli_replayed
    mart = wh.read(T_MART)
    days = {r.report_dt for r in mart.select("report_dt").distinct().collect()}
    assert days == {dt.date(2021, 3, 1), dt.date(2021, 3, 2), dt.date(2021, 3, 3)}
