"""Live enriched mart (streaming/mart.py): the nightly denormalization
join running continuously, with dimension versions bound at each
micro-batch's processing time.

Replays the three reference days as three stream invocations with the
SCD2 terminal dim advanced between them (plus a planted city change —
the reference snapshots only ever change the unprojected address
column), then checks the point-in-time law: every live row's terminal
attributes equal the dim version open at its batch's as-of timestamp —
day-1 rows keep day-1 attributes even after the dim moved on. Plus
replay idempotence (marker loss) and inner-join coverage.
"""

from __future__ import annotations

import datetime as dt
import shutil

import pytest
from pyspark.sql import functions as F

from etl_sber_spark import schemas
from etl_sber_spark.operators.scd import scd2_apply, scd2_current
from etl_sber_spark.pipeline import TERMINAL_ATTRS, T_HIST
from etl_sber_spark.sinks.warehouse import Warehouse
from etl_sber_spark.sources.io import read_terminals_xlsx, read_transactions_csv
from etl_sber_spark.streaming.mart import (
    MARKER,
    T_LIVE,
    stream_enriched_transactions,
)

from .fixtures_bank import build_bank_tables


#: r12 suite tiering (VERDICT r11 #3): stream variant; mart logic fast-covered by test_sql_views.
pytestmark = pytest.mark.slow

REF = "/root/reference"


def _ts(day: str) -> dt.datetime:
    return dt.datetime(2021, 3, int(day), 23, 50, 0)


PLANTED_CITY = "г. Тестоград"


def _busy_terminal(spark) -> str:
    """A terminal transacting on BOTH day 1 and day 2 (deterministic:
    smallest id) — the planted dim change must affect live rows on each
    side of the dim swap."""
    t1 = read_transactions_csv(
        spark, f"{REF}/transactions_01032021.txt"
    ).select("terminal")
    t2 = read_transactions_csv(
        spark, f"{REF}/transactions_02032021.txt"
    ).select("terminal")
    both = t1.intersect(t2)
    return both.agg(F.min("terminal")).collect()[0][0]


def _load_terminals(spark, wh, day, planted_terminal=None):
    stg = read_terminals_xlsx(spark, f"{REF}/terminals_{day}032021.xlsx")
    if planted_terminal is not None:
        # the reference snapshots only ever change terminal_address,
        # which the enriched view does not project — plant a CITY change
        # from day 2 on so the point-in-time law is observable in the
        # live table's own columns
        stg = stg.withColumn(
            "terminal_city",
            F.when(
                F.col("terminal_id") == planted_terminal,
                F.lit(PLANTED_CITY),
            ).otherwise(F.col("terminal_city")),
        )
    hist = (
        wh.read(T_HIST)
        if wh.has_data(T_HIST)
        else spark.createDataFrame([], schemas.TERMINALS_HIST)
    )
    wh.overwrite_versioned(
        scd2_apply(hist, stg, "terminal_id", TERMINAL_ATTRS, _ts(day)), T_HIST
    )


@pytest.fixture(scope="module")
def streamed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("livemart")
    inbox = root / "inbox"
    inbox.mkdir()
    wh = Warehouse(spark, str(root / "wh"))
    bank = build_bank_tables(spark)
    ckpt = str(root / "ckpt")

    planted = _busy_terminal(spark)
    for day in ("01", "02", "03"):
        _load_terminals(
            spark, wh, day, planted_terminal=planted if day != "01" else None
        )
        shutil.copy(
            f"{REF}/transactions_{day}032021.txt",
            inbox / f"transactions_{day}032021.txt",
        )
        q = stream_enriched_transactions(
            spark, str(inbox), wh, ckpt, bank, as_of=_ts(day)
        )
        q.awaitTermination()
    return spark, wh, bank, inbox, ckpt, planted


def test_live_rows_cover_both_days(streamed):
    spark, wh, _, _, _, _ = streamed
    live = wh.read(T_LIVE)
    n_in = sum(
        read_transactions_csv(
            spark, f"{REF}/transactions_{d}032021.txt"
        ).count()
        for d in ("01", "02", "03")
    )
    # the bank fixture covers every card and the terminals file every
    # terminal, so the inner enrichment drops nothing
    assert live.count() == n_in
    assert set(r.batch_id for r in live.select("batch_id").distinct().collect()) == {0, 1, 2}


def test_point_in_time_dimension_binding(streamed):
    """Each live row's terminal attributes == the dim version open at
    ITS batch's as-of — the as-of law, keyed through the row's OWN
    terminal (trans_id → source transaction → terminal_id → as-of dim);
    a whole-dim semi-join on (type, city) would pass whenever ANY open
    terminal shares the low-cardinality pair (review finding)."""
    spark, wh, _, _, _, _ = streamed
    hist = wh.read(T_HIST)
    live = wh.read(T_LIVE)
    for batch_id, day in ((0, "01"), (1, "02"), (2, "03")):
        tx = read_transactions_csv(
            spark, f"{REF}/transactions_{day}032021.txt"
        ).select("trans_id", F.col("terminal").alias("terminal_id"))
        dim = scd2_current(hist, _ts(day)).select(
            "terminal_id",
            F.col("terminal_type").alias("want_type"),
            F.col("terminal_city").alias("want_city"),
        )
        want = tx.join(dim, "terminal_id")
        rows = live.filter(F.col("batch_id") == batch_id)
        assert want.count() == rows.count()
        bad = rows.join(want, "trans_id").filter(
            (F.col("terminal_type") != F.col("want_type"))
            | (F.col("terminal_city") != F.col("want_city"))
        )
        assert bad.count() == 0


def test_early_rows_keep_early_attributes(streamed):
    """Day-1 live rows of the planted terminal keep the ORIGINAL city;
    day-2/3 rows carry the planted one — a batch recompute against
    today's dim could not reproduce the day-1 rows."""
    spark, wh, _, _, _, planted = streamed
    hist = wh.read(T_HIST)
    v1_city = (
        scd2_current(hist, _ts("01"))
        .filter(F.col("terminal_id") == planted)
        .collect()[0]["terminal_city"]
    )
    assert v1_city != PLANTED_CITY

    day1_ids = {
        r["trans_id"]
        for r in read_transactions_csv(
            spark, f"{REF}/transactions_01032021.txt"
        )
        .filter(F.col("terminal") == planted)
        .select("trans_id")
        .collect()
    }
    assert day1_ids, "planted terminal must transact on day 1"
    live = wh.read(T_LIVE)
    got_day1 = {
        r["terminal_city"]
        for r in live.filter(
            (F.col("batch_id") == 0) & F.col("trans_id").isin(*day1_ids)
        ).collect()
    }
    assert got_day1 == {v1_city}

    day2_rows = live.filter(
        (F.col("batch_id") == 1) & (F.col("terminal_city") == PLANTED_CITY)
    )
    assert day2_rows.count() > 0


def test_marker_loss_replay_is_idempotent(streamed):
    spark, wh, bank, inbox, ckpt, _ = streamed
    before = wh.read(T_LIVE).count()
    wh.drop(MARKER)
    # re-running over the drained inbox (checkpoint intact) must not
    # duplicate anything, marker or no marker
    q = stream_enriched_transactions(
        spark, str(inbox), wh, ckpt, bank, as_of=_ts("03")
    )
    q.awaitTermination()
    assert wh.read(T_LIVE).count() == before


def test_missing_dim_fails_batch_instead_of_losing_rows(spark, tmp_path):
    """Starting the stream before the first dim load must FAIL the batch
    (checkpoint unadvanced), not enrich to zero rows and mark the batch
    applied (round-4 review finding)."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    shutil.copy(
        f"{REF}/transactions_01032021.txt",
        inbox / "transactions_01032021.txt",
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    bank = build_bank_tables(spark)
    q = stream_enriched_transactions(
        spark, str(inbox), wh, str(tmp_path / "ckpt"), bank, as_of=_ts("01")
    )
    with pytest.raises(Exception, match="missing or empty"):
        q.awaitTermination()
    assert not wh.has_data(T_LIVE)
    assert not wh.has_data(MARKER)
    # after the dim load the SAME checkpoint drains the file
    _load_terminals(spark, wh, "01")
    q2 = stream_enriched_transactions(
        spark, str(inbox), wh, str(tmp_path / "ckpt"), bank, as_of=_ts("01")
    )
    q2.awaitTermination()
    n = read_transactions_csv(
        spark, f"{REF}/transactions_01032021.txt"
    ).count()
    assert wh.read(T_LIVE).count() == n


def test_dimless_rows_park_in_pending_and_retry(spark, tmp_path):
    """Review regression: a transaction whose terminal has not reached
    the warehouse yet (live intra-day before the nightly dim load) must
    NOT be silently dropped by the inner enrichment joins — it parks in
    rep_live_pending and is enriched by a later batch once the dim
    catches up, exactly once."""
    from etl_sber_spark.streaming.mart import T_PENDING

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    bank = build_bank_tables(spark)
    ckpt = str(tmp_path / "ckpt")

    # day-1 dim WITHOUT one terminal that transacts on day 1
    missing = _busy_terminal(spark)
    stg = read_terminals_xlsx(spark, f"{REF}/terminals_01032021.xlsx").filter(
        F.col("terminal_id") != missing
    )
    wh.overwrite_versioned(
        scd2_apply(
            spark.createDataFrame([], schemas.TERMINALS_HIST),
            stg, "terminal_id", TERMINAL_ATTRS, _ts("01"),
        ),
        T_HIST,
    )
    shutil.copy(
        f"{REF}/transactions_01032021.txt", inbox / "transactions_01.txt"
    )
    q = stream_enriched_transactions(
        spark, str(inbox), wh, ckpt, bank, as_of=_ts("01")
    )
    q.awaitTermination()

    day1 = read_transactions_csv(spark, f"{REF}/transactions_01032021.txt")
    n_day1 = day1.count()
    n_missing = day1.filter(F.col("terminal") == missing).count()
    assert n_missing > 0
    live = wh.read(T_LIVE)
    assert live.count() == n_day1 - n_missing
    pending = wh.read(T_PENDING)
    assert pending.count() == n_missing
    assert {r.terminal for r in pending.collect()} == {missing}

    # the nightly dim load catches up (full day-2 snapshot), a new file
    # arrives -> the parked rows enrich in the NEXT batch
    full = read_terminals_xlsx(spark, f"{REF}/terminals_02032021.xlsx")
    wh.overwrite_versioned(
        scd2_apply(wh.read(T_HIST), full, "terminal_id", TERMINAL_ATTRS, _ts("02")),
        T_HIST,
    )
    shutil.copy(
        f"{REF}/transactions_02032021.txt", inbox / "transactions_02.txt"
    )
    q = stream_enriched_transactions(
        spark, str(inbox), wh, ckpt, bank, as_of=_ts("02")
    )
    q.awaitTermination()

    n_day2 = read_transactions_csv(
        spark, f"{REF}/transactions_02032021.txt"
    ).count()
    live = wh.read(T_LIVE)
    # every row of both days present, the parked ones exactly once
    assert live.count() == n_day1 + n_day2
    assert live.groupBy("trans_id").count().filter("count > 1").count() == 0

    # a third drained batch must not re-enrich the stale pending copies
    shutil.copy(
        f"{REF}/transactions_03032021.txt", inbox / "transactions_03.txt"
    )
    q = stream_enriched_transactions(
        spark, str(inbox), wh, ckpt, bank, as_of=_ts("03")
    )
    q.awaitTermination()
    n_day3 = read_transactions_csv(
        spark, f"{REF}/transactions_03032021.txt"
    ).count()
    live = wh.read(T_LIVE)
    assert live.count() == n_day1 + n_day2 + n_day3
    assert live.groupBy("trans_id").count().filter("count > 1").count() == 0


def test_pending_row_redelivered_in_same_batch_enriches_once(
    spark, tmp_path
):
    """ADVICE round 4: a trans_id BOTH parked in rep_live_pending and
    re-delivered in the current batch's own files was enriched twice
    (pending was deduped only within itself before the union). The
    batch's copy must win and the row lands in rep_live_enriched exactly
    once."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    bank = build_bank_tables(spark)
    ckpt = str(tmp_path / "ckpt")

    # batch 0: dim lacks one busy terminal -> its rows park in pending
    missing = _busy_terminal(spark)
    stg = read_terminals_xlsx(
        spark, f"{REF}/terminals_01032021.xlsx"
    ).filter(F.col("terminal_id") != missing)
    wh.overwrite_versioned(
        scd2_apply(
            spark.createDataFrame([], schemas.TERMINALS_HIST),
            stg, "terminal_id", TERMINAL_ATTRS, _ts("01"),
        ),
        T_HIST,
    )
    shutil.copy(
        f"{REF}/transactions_01032021.txt", inbox / "transactions_01.txt"
    )
    q = stream_enriched_transactions(
        spark, str(inbox), wh, ckpt, bank, as_of=_ts("01")
    )
    q.awaitTermination()
    day1 = read_transactions_csv(spark, f"{REF}/transactions_01032021.txt")
    n_day1 = day1.count()
    n_missing = day1.filter(F.col("terminal") == missing).count()
    assert n_missing > 0
    assert wh.read(T_LIVE).count() == n_day1 - n_missing

    # dim catches up, and batch 1's OWN file re-delivers exactly the
    # parked rows (the raw lines of the missing terminal)
    raw = open(f"{REF}/transactions_01032021.txt", encoding="utf-8").read()
    lines = raw.splitlines()
    redelivered = [lines[0]] + [
        ln for ln in lines[1:] if ln.split(";")[-1].strip() == missing
    ]
    assert len(redelivered) - 1 == n_missing
    (inbox / "transactions_01_redelivery.txt").write_text(
        "\n".join(redelivered) + "\n", encoding="utf-8"
    )
    full = read_terminals_xlsx(spark, f"{REF}/terminals_02032021.xlsx")
    wh.overwrite_versioned(
        scd2_apply(
            wh.read(T_HIST), full, "terminal_id", TERMINAL_ATTRS, _ts("02")
        ),
        T_HIST,
    )
    q = stream_enriched_transactions(
        spark, str(inbox), wh, ckpt, bank, as_of=_ts("02")
    )
    q.awaitTermination()

    live = wh.read(T_LIVE)
    assert live.groupBy("trans_id").count().filter("count > 1").count() == 0
    assert live.count() == n_day1


def test_bank_dims_provider_rebinds_per_batch(spark, tmp_path):
    """A callable bank_tables provider is re-invoked inside every
    micro-batch, so a transaction parked on a missing CARD drains once
    the provider serves the late dim — within ONE stream invocation.
    With a plain dict the dims are bound at stream start and the parked
    row would retry against the stale frame forever (r8 review)."""
    import datetime as dt
    import os
    import time

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")

    card_a, card_b = "4000 0000 0000 0001", "4000 0000 0000 0002"
    terminals = spark.createDataFrame(
        [("T0001", "POS", "Москва", "street 1")],
        "terminal_id string, terminal_type string, terminal_city string, "
        "terminal_address string",
    )
    wh.overwrite_versioned(
        scd2_apply(
            spark.createDataFrame([], schemas.TERMINALS_HIST),
            terminals, "terminal_id", TERMINAL_ATTRS,
            dt.datetime(2021, 3, 1, 0, 0),
        ),
        T_HIST,
    )
    far = dt.date(2030, 1, 1)
    clients = spark.createDataFrame(
        [("CL1", "L1", "F1", "M1", "0001 000001", far, "+71"),
         ("CL2", "L2", "F2", "M2", "0002 000002", far, "+72")],
        "client_id string, last_name string, first_name string, "
        "patronymic string, passport_num string, passport_valid_to date, "
        "phone string",
    )
    accounts = spark.createDataFrame(
        [("ACC1", far, "CL1"), ("ACC2", far, "CL2")],
        "account string, valid_to date, client string",
    )
    cards_full = spark.createDataFrame(
        [(card_a, "ACC1"), (card_b, "ACC2")], "card_num string, account string"
    )
    cards_partial = cards_full.filter(F.col("card_num") != card_a)

    calls = []

    def provider():
        calls.append(1)
        return {
            "clients": clients,
            "accounts": accounts,
            # first batch: card A's dim row has not landed yet
            "cards": cards_partial if len(calls) == 1 else cards_full,
        }

    header = (
        "transaction_id;transaction_date;amount;card_num;oper_type;"
        "oper_result;terminal\n"
    )
    (inbox / "b1.txt").write_text(
        header
        + f"1;2021-03-01 10:00:00;10,00;{card_a};PAYMENT;SUCCESS;T0001\n"
        + f"2;2021-03-01 10:01:00;10,00;{card_b};PAYMENT;SUCCESS;T0001\n"
    )
    (inbox / "b2.txt").write_text(
        header
        + f"3;2021-03-01 10:02:00;10,00;{card_b};PAYMENT;SUCCESS;T0001\n"
    )
    now = time.time()
    os.utime(inbox / "b1.txt", (now - 60, now - 60))
    os.utime(inbox / "b2.txt", (now, now))

    q = stream_enriched_transactions(
        spark, str(inbox), wh, ckpt, provider,
        as_of=dt.datetime(2021, 3, 1, 12, 0), max_files_per_trigger=1,
    )
    q.awaitTermination()
    assert len(calls) >= 2  # the provider really rebound per batch
    live = wh.read(T_LIVE)
    assert live.count() == 3  # card A's parked row drained in batch 2
    assert live.groupBy("trans_id").count().filter("count > 1").count() == 0
