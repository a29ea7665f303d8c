"""Semantic pins for PII redaction (functions/redact.py): each class
redacts its shape, clean text is untouched, precedence resolves
overlaps, and counts agree with replacements. q_pii_redact
differentially proves the regex subset renders identically in DuckDB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sber_spark.functions.redact import pii_count, pii_total, redact_pii


def _redact_one(spark, text: str) -> str:
    df = spark.createDataFrame([(text,)], ["text"]).select(
        redact_pii(F.col("text")).alias("out")
    )
    return df.collect()[0].out


@pytest.mark.parametrize(
    "text,expected",
    [
        ("mail me at john.doe+x@bank-corp.ru today", "mail me at <EMAIL> today"),
        ("card 1234 5678 9012 3456 was used", "card <CARD> was used"),
        ("card 1234-5678-9012-3456 was used", "card <CARD> was used"),
        ("card 1234567890123456 was used", "card <CARD> was used"),
        ("passport 1234 567890 blacklisted", "passport <ID> blacklisted"),
        ("call +79161234567 now", "call <PHONE> now"),
        ("no pii in this sentence at all", "no pii in this sentence at all"),
        ("digits 123 45 6789 stay", "digits 123 45 6789 stay"),
    ],
)
def test_redaction_per_class(spark, text, expected):
    assert _redact_one(spark, text) == expected


def test_card_wins_over_id(spark):
    """A 16-digit card in 4-4-4-4 form contains a '1234 5678'-ish prefix;
    precedence (card first) must consume it as one CARD, not ID+junk."""
    out = _redact_one(spark, "pay 1111 2222 3333 4444 ok")
    assert out == "pay <CARD> ok"
    assert "<ID>" not in out


def test_counts_match_redactions(spark):
    text = (
        "a@b.co writes to c.d@e.org; card 1111 2222 3333 4444; "
        "passport 9876 543210; call +71234567890"
    )
    df = spark.createDataFrame([(text,)], ["text"]).select(
        pii_count(F.col("text"), "email").alias("n_email"),
        pii_count(F.col("text"), "card").alias("n_card"),
        pii_count(F.col("text"), "id").alias("n_id"),
        pii_count(F.col("text"), "phone").alias("n_phone"),
        pii_total(F.col("text")).alias("n_total"),
    )
    r = df.collect()[0]
    assert (r.n_email, r.n_card, r.n_id, r.n_phone) == (2, 1, 1, 1)
    assert r.n_total == 5


def test_idempotent(spark):
    """Redacting already-redacted text changes nothing (placeholders
    contain no digits/@)."""
    once = _redact_one(spark, "x a@b.co 1111 2222 3333 4444 +79990001122")
    assert _redact_one(spark, once) == once
