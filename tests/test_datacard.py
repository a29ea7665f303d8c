"""Corpus datacard (operators/datacard.py): hand fixture, slice-sum
laws on the real corpus, file round-trip."""

from __future__ import annotations

import json
import os

from etl_sber_spark.operators.datacard import corpus_datacard

from .conftest import SF_SMALL


def test_hand_fixture(spark):
    rows = [
        (1, "one two three", "en", "web"),
        (2, "uno dos tres", "es", "web"),
        (3, "four five six", "en", "books"),
        (4, "seven eight nine", "en", "web"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, lang string, source string")
    card = corpus_datacard(df, lang_col="lang", source_col="source")
    assert card["n_docs"] == 4
    assert card["n_tokens"] == 12
    assert card["n_chars"] == sum(len(t) for _, t, _, _ in rows)
    # every doc has exactly 3 tokens -> all percentiles are 3
    assert card["token_p50"] == card["token_p90"] == card["token_p99"] == 3
    assert set(card["by_lang"]) == {"en", "es"}
    assert card["by_lang"]["en"]["n_docs"] == 3
    assert card["by_lang"]["es"]["n_tokens"] == 3
    assert set(card["by_source"]) == {"web", "books"}
    assert card["by_source"]["web"]["n_docs"] == 3
    assert card["by_source"]["books"]["n_chars"] == len("four five six")


def test_slice_sums_real_corpus(spark):
    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    card = corpus_datacard(df, lang_col="lang", source_col="source")
    for breakdown in ("by_lang", "by_source"):
        for field in ("n_docs", "n_tokens", "n_chars"):
            assert (
                sum(s[field] for s in card[breakdown].values())
                == card[field]
            ), (breakdown, field)
    assert card["n_docs"] == df.count()


def test_derived_lang_and_no_source(spark):
    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    card = corpus_datacard(df)  # lang derived, no source breakdown
    assert card["by_source"] is None
    assert card["n_docs"] == df.count()
    assert set(card["by_lang"]) <= {"en", "ru", "und"}  # lang_id's range


def test_file_round_trip(spark, tmp_path):
    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    out = str(tmp_path / "card")
    card = corpus_datacard(df, lang_col="lang", source_col="source", path=out)
    on_disk = json.load(open(os.path.join(out, "datacard.json")))
    assert on_disk == card


def test_null_text_slice_reports_instead_of_crashing(spark):
    """An all-NULL-text slice (lang_id(NULL) -> 'und') must produce a
    null-quality slice row, not a TypeError."""
    rows = [(1, "a real english document here"), (2, None), (3, None)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    card = corpus_datacard(df)
    assert card["n_docs"] == 3
    und = card["by_lang"]["und"]
    assert und["n_docs"] == 2
    assert und["n_tokens"] == 0 and und["n_chars"] == 0
    assert und["mean_quality"] is None


def test_datacard_diff():
    from etl_sber_spark.operators.datacard import datacard_diff

    old = {
        "n_docs": 100, "n_tokens": 1000, "n_chars": 5000, "mean_quality": 0.8,
        "by_lang": {
            "en": {"n_docs": 80}, "ru": {"n_docs": 20},
        },
        "by_source": None,
    }
    new = {
        "n_docs": 150, "n_tokens": 1400, "n_chars": 7000, "mean_quality": 0.8,
        "by_lang": {
            "en": {"n_docs": 60}, "ru": {"n_docs": 30}, "de": {"n_docs": 60},
        },
        "by_source": None,
    }
    d = datacard_diff(old, new, rel_threshold=0.1)
    assert d["fields"]["n_docs"] == {"old": 100, "new": 150, "rel": 0.5}
    assert d["fields"]["mean_quality"]["rel"] == 0.0
    assert d["by_lang"]["added"] == ["de"] and d["by_lang"]["removed"] == []
    # en share 0.8 -> 0.4: shifted; ru 0.2 -> 0.2: not
    assert set(d["by_lang"]["shifted"]) == {"en"}
    assert d["by_source"] is None
