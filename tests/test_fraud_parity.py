"""Canonical-vs-faithful parity for the J7 OR-join rewrite (SURVEY.md
§2.5 J7, §7.4): the union-of-semi canonical plan must produce exactly
the reference-shaped left-join-OR plan's rows on real replay data."""

from __future__ import annotations

import datetime as dt
import shutil

import pytest

from etl_sber_spark.pipeline import T_BLACKLIST, T_FACT, T_HIST, run_day
from etl_sber_spark.plans.fraud import (
    data_view,
    rule_blacklisted_passport,
    rule_city_hopping,
)
from etl_sber_spark.sinks.warehouse import Warehouse

from .fixtures_bank import build_bank_tables

REF = "/root/reference"


@pytest.fixture(scope="module")
def day1_warehouse(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("parity")
    inbox = root / "inbox"
    inbox.mkdir()
    for pat in (
        "transactions_01032021.txt",
        "terminals_01032021.xlsx",
        "passport_blacklist_01032021.xlsx",
    ):
        shutil.copy(f"{REF}/{pat}", inbox / pat)
    bank = build_bank_tables(spark)
    wh_root = str(root / "wh")
    run_day(spark, str(inbox), wh_root, bank, dt.datetime(2021, 3, 1, 23, 50))
    return Warehouse(spark, wh_root), bank


def test_rule1_faithful_equals_canonical(spark, day1_warehouse):
    wh, bank = day1_warehouse
    view = data_view(
        bank["clients"],
        bank["accounts"],
        bank["cards"],
        wh.read(T_FACT),
        wh.read(T_HIST),
        dt.datetime(2021, 3, 1, 23, 50),
    ).cache()
    bl = wh.read(T_BLACKLIST)
    canonical = rule_blacklisted_passport(view, bl)
    faithful = rule_blacklisted_passport(view, bl, faithful=True)
    c = sorted(tuple(str(v) for v in r) for r in canonical.collect())
    f = sorted(tuple(str(v) for v in r) for r in faithful.collect())
    assert len(c) > 0
    assert c == f
    view.unpersist()


def test_rule3_faithful_equals_canonical(spark, day1_warehouse):
    """Round 3: the window EXISTS rewrite (default) must produce exactly
    the literal band self-join's rows on real replay data."""
    wh, bank = day1_warehouse
    view = data_view(
        bank["clients"],
        bank["accounts"],
        bank["cards"],
        wh.read(T_FACT),
        wh.read(T_HIST),
        dt.datetime(2021, 3, 1, 23, 50),
    ).cache()
    canonical = rule_city_hopping(view)
    faithful = rule_city_hopping(view, faithful=True)
    c = sorted(tuple(str(v) for v in r) for r in canonical.collect())
    f = sorted(tuple(str(v) for v in r) for r in faithful.collect())
    assert c == f
    view.unpersist()


def test_data_view_faithful_full_history_multiplies(spark, day1_warehouse):
    """J6 trap (main.py:418): after day 1 there is exactly one version
    per terminal, so faithful-full-history == canonical; the golden
    3-day test relies on canonical — here we just pin the day-1
    equivalence so any divergence later is intentional."""
    wh, bank = day1_warehouse
    ts = dt.datetime(2021, 3, 1, 23, 50)
    common = (
        bank["clients"],
        bank["accounts"],
        bank["cards"],
        wh.read(T_FACT),
        wh.read(T_HIST),
        ts,
    )
    canonical = data_view(*common)
    faithful = data_view(*common, faithful_full_history=True)
    assert canonical.count() == faithful.count()


def test_data_view_faithful_multiplies_after_day2(spark, day1_warehouse, tmp_path):
    """Day 2 changes two terminals (P6934, A8966 → 2 history versions
    each); the reference's full-history join then DOUBLE-counts their
    transactions (main.py:418). The faithful mode must reproduce that
    multiplication; canonical (as-of-current) must not."""
    wh, bank = day1_warehouse
    inbox = tmp_path / "inbox2"
    inbox.mkdir()
    for pat in ("transactions_02032021.txt", "terminals_02032021.xlsx"):
        shutil.copy(f"{REF}/{pat}", inbox / pat)
    run_day(
        spark, str(inbox), wh.root, bank, dt.datetime(2021, 3, 2, 23, 50)
    )
    ts = dt.datetime(2021, 3, 2, 23, 50)
    common = (
        bank["clients"],
        bank["accounts"],
        bank["cards"],
        wh.read(T_FACT),
        wh.read(T_HIST),
        ts,
    )
    canonical = data_view(*common)
    faithful = data_view(*common, faithful_full_history=True)
    n_can, n_faith = canonical.count(), faithful.count()
    assert n_faith > n_can
    # the excess is exactly the changed terminals' day-2 transactions:
    # each has 2 history versions, so faithful counts them twice
    import pyspark.sql.functions as F

    fact_day2 = wh.read(T_FACT).filter(
        F.to_date("create_date") == F.lit("2021-03-02")
    )
    n_changed = fact_day2.filter(
        F.col("terminal").isin("P6934", "A8966")
    ).count()
    assert n_faith - n_can == n_changed


def test_rule1_modes_agree_on_empty_blacklist(spark, day1_warehouse):
    """The reference's OR-left-join admits EXPIRED-passport rows only by
    matching them against some blacklist row, so an empty blacklist
    empties the whole rule — expired passports included. The canonical
    rewrite must reproduce that, not helpfully emit the expired arm
    anyway (r8 review)."""
    from pyspark.sql import functions as F

    wh, bank = day1_warehouse
    view = data_view(
        bank["clients"],
        bank["accounts"],
        bank["cards"],
        wh.read(T_FACT),
        wh.read(T_HIST),
        dt.datetime(2021, 3, 1, 23, 50),
    ).localCheckpoint()
    empty_bl = spark.createDataFrame([], "passport_num string, entry_dt date")
    canonical = rule_blacklisted_passport(view, empty_bl)
    faithful = rule_blacklisted_passport(view, empty_bl, faithful=True)
    assert canonical.count() == 0
    assert faithful.count() == 0
    # and the view genuinely holds expired-passport rows the gate hides
    assert (
        view.filter(
            F.col("passport_valid_to") < F.to_date("trans_date")
        ).count()
        > 0
    )
