"""Fill-in-the-middle transform (operators/fim.py): pure-Python
differential on the real corpus + conservation and rate laws."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_sber_spark.operators.fim import MID, PRE, SUF, _RES, fim_transform

from .conftest import SF_SMALL


def _h(s: str, seed: int) -> int:
    return int(hashlib.md5(f"{s}:{seed}".encode()).hexdigest()[:15], 16)


def _py_fim(doc_id: int, text: str, rate: float, min_tokens: int, seed: int):
    import re

    toks = [
        t
        for t in re.split(r"\s+", (text or "").strip().lower())
        if t != ""
    ]
    sid = str(doc_id)
    applied = (_h(sid, 3 * seed) % _RES < round(rate * _RES)) and len(
        toks
    ) >= min_tokens
    if not applied:
        return toks, False
    n = len(toks)
    d1 = _h(sid, 3 * seed + 1) % (n + 1)
    d2 = _h(sid, 3 * seed + 2) % (n + 1)
    a, b = min(d1, d2), max(d1, d2)
    return (
        [PRE] + toks[:a] + [SUF] + toks[b:] + [MID] + toks[a:b],
        True,
    )


def test_python_differential_real_corpus(spark):
    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    got = {
        r.doc_id: (list(r.fim_tokens), r.fim_applied)
        for r in fim_transform(df, fim_rate=0.5).collect()
    }
    want = {
        r.doc_id: _py_fim(r.doc_id, r.text, 0.5, 4, 0)
        for r in df.collect()
    }
    assert got == {k: (list(v[0]), v[1]) for k, v in want.items()}
    applied = sum(1 for _, a in got.values() if a)
    assert 0.35 < applied / len(got) < 0.65  # hash-Bernoulli near rate


def test_token_conservation_and_sentinels(spark):
    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    out = fim_transform(df, fim_rate=1.0, min_tokens=1)
    rows = out.select(
        "doc_id",
        "fim_applied",
        F.size("fim_tokens").alias("n_out"),
        F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n_in"),
        F.array_sort(
            F.filter(
                "fim_tokens", lambda t: ~t.isin(PRE, MID, SUF)
            )
        ).alias("content"),
        F.array_sort(F.split(F.trim(F.lower("text")), r"\s+")).alias("orig"),
    ).collect()
    for r in rows:
        assert r.fim_applied
        assert r.n_out == r.n_in + 3  # exactly the three sentinels added
        assert r.content == r.orig  # token multiset preserved


def test_rate_zero_and_short_docs_pass_through(spark):
    df = spark.createDataFrame(
        [(1, "one two three four five"), (2, "tiny")],
        "doc_id int, text string",
    )
    none = fim_transform(df, fim_rate=0.0).collect()
    assert all(not r.fim_applied for r in none)
    out = {r.doc_id: r for r in fim_transform(df, fim_rate=1.0).collect()}
    assert out[1].fim_applied
    assert not out[2].fim_applied  # < min_tokens
    assert list(out[2].fim_tokens) == ["tiny"]
    with pytest.raises(ValueError, match="fim_rate"):
        fim_transform(df, fim_rate=1.5)


def test_seed_changes_selection_and_splits(spark):
    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    a = {r.doc_id: list(r.fim_tokens) for r in fim_transform(df, seed=0).collect()}
    b = {r.doc_id: list(r.fim_tokens) for r in fim_transform(df, seed=7).collect()}
    assert a != b  # per-epoch reseed really changes the transform
    # and each is individually reproducible
    a2 = {r.doc_id: list(r.fim_tokens) for r in fim_transform(df, seed=0).collect()}
    assert a == a2


def test_null_and_whitespace_text(spark):
    """NULL/blank text: empty token array, applied strictly false —
    never a NULL flag or a phantom '' token."""
    df = spark.createDataFrame(
        [(1, None), (2, "   "), (3, "real tokens here okay")],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in fim_transform(df, fim_rate=1.0).collect()}
    for i in (1, 2):
        assert out[i].fim_applied is False
        assert list(out[i].fim_tokens) == []
    assert out[3].fim_applied is True
    assert "" not in out[3].fim_tokens


def test_consecutive_epoch_seeds_share_no_draws(spark):
    """seed=e and seed=e+1 use disjoint hash salts (3e..3e+2 vs
    3e+3..3e+5), so consecutive epochs never repeat a split endpoint
    by construction."""
    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(50)
    def splits(seed):
        out = {}
        for r in fim_transform(df, fim_rate=1.0, seed=seed).collect():
            toks = list(r.fim_tokens)
            out[r.doc_id] = (toks.index(SUF), toks.index(MID))
        return out
    a, b = splits(0), splits(1)
    # with consecutive (non-strided) salts EVERY doc shared an
    # endpoint; with the stride, overlap is only chance-level
    shared = sum(
        1 for d in a if set(a[d]) & set(b[d])
    )
    assert shared < len(a)
