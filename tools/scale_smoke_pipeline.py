#!/usr/bin/env python3
"""Fraud-ETL scale smoke (VERDICT r6 #1): synthesize the reference's
3-day nightly at N× its transaction volume (~15.7k rows/day × N, with
proportionally more cards/clients/terminals, SCD2 version churn, and a
planted hot corporate card), run the REAL pipeline end-to-end
(``pipeline.run_day`` over a CSV inbox in the reference's `;`/comma-
decimal format), and report per-phase wall time + REAL shuffle bytes
(Spark REST status API) — so SCALE.md's pipeline section carries the
same measured evidence the corpus (scale_smoke_corpus.py) and ANN
(scale_smoke_ann.py) stacks already have.

Phases measured per day:
  terminals_scd2  load_terminals: SCD2 apply + atomic versioned rewrite
                  (day 2/3 churn 20% of addresses each; day 3 adds 1%)
  blacklist       load_blacklist: SCD1 anti-join append
  run_day         the nightly unit: CSV scan -> typed fact append
                  (load_date-partitioned) -> mart build (5-way view +
                  3 fraud rules) -> mart append

Then, on the day-3 warehouse state:
  rule1/rule2/rule3   per-rule cost over the cached view
  rule3 A/B           faithful band self-join vs the O(n log n) EXISTS
                      window rewrite (SCALE.md §"band join" promise) —
                      same rows, different plan; the planted hot card
                      (~1% of all transactions on one card_num) is the
                      adversarial case the rewrite exists for.

Deterministic throughout (modular arithmetic, no RNG): the same factor
always generates the same corpus, so runs are comparable across rounds.

Usage:  python tools/scale_smoke_pipeline.py [factor]   (default 10)

Reference parity: volumes/shape mirror /root/reference main.py's nightly
(three source kinds, 3 days, ~15.7k tx/day at 1×); the bank.* dims are
synthetic like tests/fixtures_bank.py, with the same planted fraud
triggers (blacklisted + expired passports, expired accounts).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

os.environ.setdefault("SPARK_GRAFT_UI", "true")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

TX_PER_DAY_1X = 15_700  # the reference's measured daily volume
N_CITIES = 50
HOT_EVERY = 97  # ~1% of transactions land on card 0 (corporate card)


def shuffle_totals(spark) -> tuple[int, int]:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages"
    ) as r:
        stages = json.load(r)
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("shuffleReadBytes", 0) for s in stages),
    )


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    tx_day = TX_PER_DAY_1X * factor
    n_cards = max(500, tx_day // 8)
    n_terminals = min(200 * factor, 20_000)
    n_bl = max(24, n_cards // 1000)  # blacklisted passports
    n_exp_p = n_cards // 1000 + 10  # expired passports
    n_exp_a = n_cards // 1000 + 10  # expired accounts

    from pyspark.sql import functions as F

    from etl_sber_spark import pipeline, schemas
    from etl_sber_spark.operators.materialize import pin
    from etl_sber_spark.plans import fraud
    from etl_sber_spark.session import get_spark
    from etl_sber_spark.sinks.warehouse import Warehouse

    spark = get_spark("pipeline-scale-smoke")
    results: dict[str, dict] = {}

    def phase(name, fn):
        w0, r0 = shuffle_totals(spark)
        t0 = time.perf_counter()
        out = fn()
        sec = time.perf_counter() - t0
        w1, r1 = shuffle_totals(spark)
        results[name] = {
            "sec": round(sec, 2),
            "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
            "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
            "out": out,
        }
        print(f"[{name}] {results[name]}", file=sys.stderr)

    # -- deterministic bank.* dims (the fixtures_bank trigger layout,
    # scaled): card i <-> account ACC<i> <-> client CL<i>;
    # [0, n_bl) blacklisted passports, [n_bl, n_bl+n_exp_p) expired
    # passports, [n_bl+n_exp_p, +n_exp_a) expired accounts ------------
    def card_sql(col: str) -> str:
        return (
            f"format_string('4%03d %04d %04d %04d', {col} % 997, "
            f"CAST({col} / 10000 AS INT), {col} % 10000, {col} % 9973)"
        )

    pass_expr = "format_string('%04d %06d', id % 10000, id)"
    idx = spark.range(n_cards)
    clients = idx.select(
        F.format_string("CL%07d", "id").alias("client_id"),
        F.format_string("Last%d", "id").alias("last_name"),
        F.format_string("First%d", "id").alias("first_name"),
        F.format_string("Mid%d", "id").alias("patronymic"),
        F.expr(pass_expr).alias("passport_num"),
        F.when(
            (F.col("id") >= n_bl) & (F.col("id") < n_bl + n_exp_p),
            F.lit(dt.date(2021, 2, 15)),
        )
        .otherwise(F.lit(dt.date(2030, 1, 1)))
        .alias("passport_valid_to"),
        F.format_string("+7%010d", "id").alias("phone"),
    )
    accounts = idx.select(
        F.format_string("ACC%07d", "id").alias("account"),
        F.when(
            (F.col("id") >= n_bl + n_exp_p)
            & (F.col("id") < n_bl + n_exp_p + n_exp_a),
            F.lit(dt.date(2021, 2, 20)),
        )
        .otherwise(F.lit(dt.date(2030, 1, 1)))
        .alias("valid_to"),
        F.format_string("CL%07d", "id").alias("client"),
    )
    cards = idx.select(
        # padded like Oracle CHAR columns — exercises the trim join
        F.concat(F.expr(card_sql("id")), F.lit("  ")).alias("card_num"),
        F.format_string("ACC%07d", "id").alias("account"),
    )
    bank = {
        "clients": pin(clients),
        "accounts": pin(accounts),
        "cards": pin(cards),
    }

    def terminals_stg(day: int):
        """Day-d terminal snapshot with deterministic churn: day 2
        re-addresses i%5==0, day 3 re-addresses i%5==1 and adds 1%."""
        n = n_terminals + (n_terminals // 100 if day >= 3 else 0)
        # address version per terminal: i%5==0 churns on day 2 (then
        # keeps that address), i%5==1 churns on day 3, others never
        addr_ver = (
            f"CASE WHEN id % 5 = 0 THEN least({day}, 2) "
            f"WHEN id % 5 = 1 THEN CASE WHEN {day} >= 3 THEN 3 ELSE 1 END "
            "ELSE 1 END"
        )
        return spark.range(n).select(
            F.format_string("T%05d", "id").alias("terminal_id"),
            F.when(F.col("id") % 2 == 0, F.lit("POS"))
            .otherwise(F.lit("ATM"))
            .alias("terminal_type"),
            F.format_string("CITY%02d", F.col("id") % N_CITIES).alias(
                "terminal_city"
            ),
            F.format_string(
                "Street %d v%d", F.col("id"), F.expr(addr_ver)
            ).alias("terminal_address"),
        )

    def blacklist_stg(day: int):
        """Cumulative blacklist thirds, like the reference's files."""
        upto = n_bl * day // 3
        return spark.range(upto).select(
            F.expr(pass_expr).alias("passport_num"),
            F.lit(dt.date(2021, 3, 1)).alias("entry_dt"),
        )

    def write_tx_csv(inbox: str, day: int) -> str:
        """Day-d transactions in the reference CSV format (`;` fields,
        comma decimals), written executor-parallel as a DIRECTORY named
        like the reference file — splittable on read, the multi-split
        landing shape a 100 TB inbox actually has."""
        name = f"transactions_{day:02d}032021.txt"
        path = os.path.join(inbox, name)
        rows = spark.range(tx_day).select(
            F.format_string("9%011d", F.col("id") + day * 10**10).alias(
                "transaction_id"
            ),
            F.date_format(
                F.expr(
                    f"timestamp'2021-03-{day:02d} 00:00:00' + "
                    "make_interval(0, 0, 0, 0, 0, 0, (id * 37) % 86400)"
                ),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("transaction_date"),
            F.format_string(
                "%d,%02d", F.col("id") % 9000 + 10, F.col("id") % 100
            ).alias("amount"),
            F.expr(
                "CASE WHEN id % {hot} = 0 THEN 0 ELSE id % {n} END".format(
                    hot=HOT_EVERY, n=n_cards
                )
            ).alias("cidx"),
            F.when(F.col("id") % 3 == 0, F.lit("WITHDRAW"))
            .otherwise(F.lit("PAYMENT"))
            .alias("oper_type"),
            F.when(F.col("id") % 20 == 0, F.lit("FAILED"))
            .otherwise(F.lit("SUCCESS"))
            .alias("oper_result"),
            F.format_string(
                "T%05d", (F.col("id") * 13) % n_terminals
            ).alias("terminal"),
        )
        rows = rows.withColumn(
            "card_num", F.expr(card_sql("cidx"))
        ).select(
            "transaction_id",
            "transaction_date",
            "amount",
            "card_num",
            "oper_type",
            "oper_result",
            "terminal",
        )
        (
            rows.write.option("sep", ";")
            .option("header", True)
            .mode("overwrite")
            .csv(path)
        )
        return path

    tmp = tempfile.mkdtemp(prefix="pipeline_smoke_")
    try:
        root = os.path.join(tmp, "wh")
        wh = Warehouse(spark, root)
        for day in (1, 2, 3):
            ts = dt.datetime(2021, 3, day, 23, 50)
            inbox = os.path.join(tmp, f"inbox_{day}")
            os.makedirs(inbox)
            write_tx_csv(inbox, day)
            phase(
                f"d{day}_terminals_scd2",
                lambda d=day, t=ts: (
                    pipeline.load_terminals(wh, terminals_stg(d), t),
                    wh.read(pipeline.T_HIST).count(),
                )[1],
            )
            phase(
                f"d{day}_blacklist",
                lambda d=day: (
                    pipeline.load_blacklist(wh, blacklist_stg(d)),
                    wh.read(pipeline.T_BLACKLIST).count(),
                )[1],
            )
            phase(
                f"d{day}_run_day",
                lambda i=inbox, t=ts: pipeline.run_day(
                    spark, i, root, bank, t, archive=False
                ).count(),
            )

        # -- per-rule cost + the rule-3 plan A/B on day-3 state --------
        ts3 = dt.datetime(2021, 3, 3, 23, 50)
        fact = wh.read(pipeline.T_FACT)
        view = fraud.data_view(
            bank["clients"],
            bank["accounts"],
            bank["cards"],
            fact,
            wh.read(pipeline.T_HIST),
            ts3,
        ).localCheckpoint()
        blacklist = wh.read(pipeline.T_BLACKLIST)
        phase(
            "rule1_canonical",
            lambda: fraud.rule_blacklisted_passport(view, blacklist).count(),
        )
        phase(
            "rule1_faithful",
            lambda: fraud.rule_blacklisted_passport(
                view, blacklist, faithful=True
            ).count(),
        )
        phase("rule2", lambda: fraud.rule_invalid_contract(view).count())
        phase(
            "rule3_exists_rewrite",
            lambda: fraud.rule_city_hopping(view).count(),
        )
        phase(
            "rule3_faithful_bandjoin",
            lambda: fraud.rule_city_hopping(view, faithful=True).count(),
        )
        # auto hot-key detection (r8): daily volumes sit far below the
        # binning threshold, so auto must pick the SAME unbinned plan —
        # equal rows, cost = rewrite + the probe aggregate
        phase(
            "rule3_exists_auto",
            lambda: fraud.rule_city_hopping(view, time_bins="auto").count(),
        )
        ab = {
            "exists_sec": results["rule3_exists_rewrite"]["sec"],
            "faithful_sec": results["rule3_faithful_bandjoin"]["sec"],
            "auto_sec": results["rule3_exists_auto"]["sec"],
            "rows_equal": results["rule3_exists_rewrite"]["out"]
            == results["rule3_faithful_bandjoin"]["out"]
            == results["rule3_exists_auto"]["out"],
        }

        print(
            json.dumps(
                {
                    "factor": factor,
                    "tx_per_day": tx_day,
                    "n_cards": n_cards,
                    "n_terminals": n_terminals,
                    "hot_card_tx_per_day": tx_day // HOT_EVERY,
                    "phases": results,
                    "rule3_ab": ab,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
