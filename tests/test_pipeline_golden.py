"""Pipeline golden test: replay the reference's three shipped days
end-to-end (SURVEY.md §5.2 item 2) through real warehouse writes.

Day-by-day expectations are derived from the engineered fixtures
(SURVEY.md §5.1): day2 adds terminal P9111 and changes P6934+A8966;
day3 deletes P9111 and changes A8966 again — so after day 3, A8966 has
3 versions and P9111 an open tombstone; the cumulative blacklist lands
24 rows; the fact holds all 47,116 transactions.
"""

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
    run_day,
)
from etl_sber_spark.plans.fraud import (
    EVENT_BLACKLISTED,
    EVENT_CITY_HOPPING,
    EVENT_INVALID_CONTRACT,
)
from etl_sber_spark.sinks.warehouse import Warehouse
from etl_sber_spark.functions.normalize import MAX_TS

from .fixtures_bank import build_bank_tables

REF = "/root/reference"
DAYS = ("01", "02", "03")


def _ts(day: str) -> dt.datetime:
    return dt.datetime(2021, 3, int(day), 23, 50, 0)


@pytest.fixture(scope="module")
def replayed(spark, tmp_path_factory):
    """Run the 3-day replay once; yield (warehouse, bank, per-day mart
    row counts)."""
    root = tmp_path_factory.mktemp("golden")
    wh_root = str(root / "warehouse")
    bank = build_bank_tables(spark)
    mart_counts = {}
    for day in DAYS:
        inbox = root / f"inbox_{day}"
        inbox.mkdir()
        for pat in (
            f"transactions_{day}032021.txt",
            f"terminals_{day}032021.xlsx",
            f"passport_blacklist_{day}032021.xlsx",
        ):
            shutil.copy(f"{REF}/{pat}", inbox / pat)
        report = run_day(
            spark, str(inbox), wh_root, bank, _ts(day)
        )
        mart_counts[day] = report.count()
        # inbox fully archived
        assert [
            k for k, _ in __import__(
                "etl_sber_spark.sources.io", fromlist=["scan_inbox"]
            ).scan_inbox(str(inbox))
        ] == []
    return Warehouse(spark, wh_root), bank, mart_counts


def test_fact_transactions_complete(replayed):
    wh, _, _ = replayed
    fact = wh.read(T_FACT)
    assert fact.count() == 15650 + 15686 + 15780
    # partitioned by load_date: one partition per day
    days = {r.load_date for r in fact.select("load_date").distinct().collect()}
    assert days == {dt.date(2021, 3, 1), dt.date(2021, 3, 2), dt.date(2021, 3, 3)}


def test_blacklist_cumulative_24(replayed):
    wh, _, _ = replayed
    bl = wh.read(T_BLACKLIST)
    # cumulative file re-ships old rows; anti-join keeps them out (J3)
    assert bl.count() == 24
    assert bl.select("passport_num").distinct().count() == 24


def test_scd2_states(replayed):
    wh, _, _ = replayed
    hist = wh.read(T_HIST)

    # A8966: changed on day 2 and day 3 -> 3 versions, exactly one open
    a = hist.filter(F.col("terminal_id") == "A8966").collect()
    assert len(a) == 3
    open_a = [r for r in a if str(r.effective_to).startswith("2999")]
    assert len(open_a) == 1 and open_a[0].deleted_flg == 0

    # P9111: new on day 2, deleted on day 3 -> closed v1 + open tombstone
    p = hist.filter(F.col("terminal_id") == "P9111").collect()
    assert len(p) == 2
    tomb = [r for r in p if r.deleted_flg == 1]
    assert len(tomb) == 1
    assert str(tomb[0].effective_to).startswith("2999")
    assert tomb[0].effective_from == _ts("03")
    closed = [r for r in p if r.deleted_flg == 0]
    assert closed[0].effective_to == _ts("03") - dt.timedelta(seconds=1)

    # P6934: changed on day 2 only -> 2 versions
    assert hist.filter(F.col("terminal_id") == "P6934").count() == 2


def test_scd2_invariants(replayed):
    """Engine-level invariants (SURVEY.md §5.2 item 3): per key at most
    one open version; non-deleted intervals never overlap."""
    wh, _, _ = replayed
    hist = wh.read(T_HIST)
    open_per_key = (
        hist.filter(F.col("effective_to") == F.lit(MAX_TS).cast("timestamp"))
        .groupBy("terminal_id")
        .count()
    )
    assert open_per_key.filter(F.col("count") > 1).count() == 0

    h1 = hist.filter(F.col("deleted_flg") == 0).alias("h1")
    h2 = hist.filter(F.col("deleted_flg") == 0).alias("h2")
    overlaps = h1.join(
        h2,
        (F.col("h1.terminal_id") == F.col("h2.terminal_id"))
        & (F.col("h1.effective_from") < F.col("h2.effective_from"))
        & (F.col("h2.effective_from") <= F.col("h1.effective_to")),
        "inner",
    )
    assert overlaps.count() == 0


def test_mart_rules_fire(replayed):
    wh, bank, mart_counts = replayed
    mart = wh.read(T_MART)
    by_type = {
        r.event_type: r["count"]
        for r in mart.groupBy("event_type").count().collect()
    }
    # the planted fixtures guarantee rules 1 and 2 fire every day
    assert by_type.get(EVENT_BLACKLISTED, 0) > 0
    assert by_type.get(EVENT_INVALID_CONTRACT, 0) > 0
    assert set(by_type) <= {
        EVENT_BLACKLISTED,
        EVENT_INVALID_CONTRACT,
        EVENT_CITY_HOPPING,
    }
    # every day appended something
    assert all(mart_counts[d] > 0 for d in DAYS)
    # report_dt partitioning: one partition per replay day
    days = {r.report_dt for r in mart.select("report_dt").distinct().collect()}
    assert days == {dt.date(2021, 3, 1), dt.date(2021, 3, 2), dt.date(2021, 3, 3)}


def test_rule2_against_duckdb_oracle(replayed, tmp_path):
    """Differential check of rule 2 through the written warehouse: DuckDB
    recomputes 'transaction day > account valid_to' from the parquet
    fact + fixture accounts/clients/cards; counts must match per day."""
    import duckdb

    wh, bank, _ = replayed
    acc = tmp_path / "accounts.parquet"
    cl = tmp_path / "clients.parquet"
    crd = tmp_path / "cards.parquet"
    bank["accounts"].write.mode("overwrite").parquet(str(acc))
    bank["clients"].write.mode("overwrite").parquet(str(cl))
    bank["cards"].write.mode("overwrite").parquet(str(crd))

    con = duckdb.connect()
    fact_dir = wh._dir(T_FACT)
    mart_dir = wh._dir(T_MART)
    expected = con.execute(
        f"""
        SELECT CAST(t.create_date AS DATE) AS d, COUNT(*) AS n
        FROM read_parquet('{fact_dir}/*/*.parquet') t
        JOIN read_parquet('{crd}/*.parquet') c ON trim(c.card_num) = t.card_num
        JOIN read_parquet('{acc}/*.parquet') a ON a.account = c.account
        WHERE CAST(t.trans_date AS DATE) > a.valid_to
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    got = con.execute(
        f"""
        SELECT report_dt AS d, COUNT(*) AS n
        FROM read_parquet('{mart_dir}/*/*.parquet', hive_partitioning=1)
        WHERE event_type = '{EVENT_INVALID_CONTRACT}'
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    assert [(str(d), n) for d, n in expected] == [(str(d), n) for d, n in got]


def test_replay_determinism(spark, tmp_path):
    """Same inputs + same processing_ts ⇒ identical warehouse content
    (SURVEY.md §5.2 item 4) — day 1 replayed into two fresh warehouses."""
    bank = build_bank_tables(spark)
    outs = []
    for tag in ("a", "b"):
        inbox = tmp_path / f"inbox_{tag}"
        inbox.mkdir()
        for pat in (
            "transactions_01032021.txt",
            "terminals_01032021.xlsx",
            "passport_blacklist_01032021.xlsx",
        ):
            shutil.copy(f"{REF}/{pat}", inbox / pat)
        report = run_day(
            spark, str(inbox), str(tmp_path / f"wh_{tag}"), bank, _ts("01")
        )
        outs.append(
            sorted(tuple(str(v) for v in r) for r in report.collect())
        )
    assert outs[0] == outs[1] and len(outs[0]) > 0
