"""Synthetic `bank.clients/accounts/cards` fixtures for the pipeline
golden tests.

The reference reads these as pre-existing Oracle tables (main.py:410-416,
never created in its repo — SURVEY.md §1.1). We derive them
deterministically from the reference's own transaction files so every
card joins to exactly one account/client, and plant the fraud triggers:

- clients of cards[0..23] carry the 24 real blacklist passports
  (rule 1, blacklisted arm);
- clients of cards[24..33] have passports expired 2021-02-15
  (rule 1, expired arm);
- accounts of cards[34..43] expired 2021-02-20 (rule 2);
- everyone else is valid through 2030.
"""

from __future__ import annotations

import datetime as dt

from etl_sber_spark import schemas
from etl_sber_spark.sources.xlsx import read_table

REF = "/root/reference"

FUTURE = dt.date(2030, 1, 1)
EXPIRED_PASSPORT = dt.date(2021, 2, 15)
EXPIRED_ACCOUNT = dt.date(2021, 2, 20)


def blacklist_passports() -> list[str]:
    """All 24 passports from the cumulative day-3 blacklist file, in
    sheet order."""
    header, rows = read_table(
        f"{REF}/passport_blacklist_03032021.xlsx", date_cols=("date",)
    )
    pi = header.index("passport")
    return [r[pi] for r in rows]


def distinct_cards(spark) -> list[str]:
    """Sorted distinct trimmed card numbers across the three days."""
    from etl_sber_spark.sources.io import read_transactions_csv

    days = [
        read_transactions_csv(spark, f"{REF}/transactions_{d}032021.txt")
        for d in ("01", "02", "03")
    ]
    df = days[0].unionByName(days[1]).unionByName(days[2])
    return sorted(r.card_num for r in df.select("card_num").distinct().collect())


def build_bank_tables(spark) -> dict:
    cards = distinct_cards(spark)
    bl = blacklist_passports()
    clients_rows, accounts_rows, cards_rows = [], [], []
    for i, card in enumerate(cards):
        cid = f"CL{i:05d}"
        acc = f"ACC{i:05d}"
        if i < len(bl):
            passport = bl[i]
            valid_to = FUTURE
        elif i < len(bl) + 10:
            passport = f"{5000 + i:04d} {600000 + i:06d}"
            valid_to = EXPIRED_PASSPORT
        else:
            passport = f"{5000 + i:04d} {600000 + i:06d}"
            valid_to = FUTURE
        acc_valid = (
            EXPIRED_ACCOUNT if len(bl) + 10 <= i < len(bl) + 20 else FUTURE
        )
        clients_rows.append(
            (cid, f"Last{i}", f"First{i}", f"Mid{i}", passport, valid_to, f"+7000{i:07d}")
        )
        accounts_rows.append((acc, acc_valid, cid))
        # cards join on trim(card_num) (main.py:416) — store a padded
        # value to exercise the trim, like Oracle CHAR columns do
        cards_rows.append((card + "  ", acc))
    return {
        "clients": spark.createDataFrame(clients_rows, schemas.CLIENTS),
        "accounts": spark.createDataFrame(accounts_rows, schemas.ACCOUNTS),
        "cards": spark.createDataFrame(cards_rows, schemas.CARDS),
        "n_cards": len(cards),
        "blacklist_passports": bl,
    }
