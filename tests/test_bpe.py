"""BPE trainer: differential vs the reference Python algorithm,
determinism across partitionings, encode laws, and plan shape.

The oracle is the classic Sennrich-2016 word-frequency BPE implemented
directly in Python below — tiny inputs, exhaustive comparison of the
full merge sequence (pair AND count) and of every encoded word.
"""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from etl_sber_spark.operators import bpe


# ---------------------------------------------------------------- oracle

def _ref_pair_counts(vocab: dict[tuple[str, ...], int]):
    counts: collections.Counter = collections.Counter()
    for syms, n in vocab.items():
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] += n
    return counts


def _ref_apply(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    for s in syms:
        if out and out[-1] == pair[0] and s == pair[1]:
            out[-1] = pair[0] + pair[1]
        else:
            out.append(s)
    return tuple(out)


def ref_train(word_counts: dict[str, int], n_merges: int, min_count: int = 2):
    vocab = {
        tuple(list(w) + [bpe.EOW]): n for w, n in word_counts.items()
    }
    merges = []
    for _ in range(n_merges):
        counts = _ref_pair_counts(vocab)
        if not counts:
            break
        # total order: count DESC, left ASC, right ASC
        pair, cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merges.append((pair[0], pair[1], cnt))
        vocab = {
            _ref_apply(syms, pair): n for syms, n in vocab.items()
        }
    return merges, vocab


def ref_encode(word: str, merges) -> list[str]:
    syms = tuple(list(word) + [bpe.EOW])
    for left, right, _ in merges:
        syms = _ref_apply(syms, (left, right))
    return list(syms)


# ---------------------------------------------------------------- helpers

CORPUS = [
    ("d1", "low lower lowest low low"),
    ("d2", "newer newest new low"),
    ("d3", "wider wide widest newer newer"),
    ("d4", "low low low newest"),
    ("d5", ""),
]


def _docs(spark, rows=CORPUS):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _word_counts(rows=CORPUS) -> dict[str, int]:
    counts: collections.Counter = collections.Counter()
    for _, text in rows:
        counts.update(w for w in text.lower().split() if w)
    return dict(counts)


# ----------------------------------------------------------------- tests

def test_word_frequencies_match_python(spark):
    got = {
        r["word"]: r["n"]
        for r in bpe.word_frequencies(_docs(spark)).collect()
    }
    assert got == _word_counts()


def test_merge_sequence_matches_reference(spark):
    words = bpe.word_frequencies(_docs(spark))
    got = bpe.train_bpe(words, n_merges=12)
    want, _ = ref_train(_word_counts(), n_merges=12)
    assert got == want
    # the sequence is non-trivial (several multi-char merges learned)
    assert len(got) >= 6
    assert any(len(l) + len(r) > 2 for l, r, _ in got if r != bpe.EOW)


def test_merge_counts_weighted_by_frequency(spark):
    # 'low' appears 7x -> (l,o) and (o,w) dominate early merges
    words = bpe.word_frequencies(_docs(spark))
    merges = bpe.train_bpe(words, n_merges=2)
    assert merges[0][:2] in {("l", "o"), ("o", "w")} or merges[0][2] >= 7


def test_greedy_left_to_right_overlap():
    # the documented "aaaa" contract of the fold
    merges, vocab = ref_train({"aaaa": 3}, n_merges=1, min_count=1)
    assert merges[0][:2] == ("a", "a")
    assert ("aa", "aa", bpe.EOW) in vocab


def test_spark_fold_handles_overlapping_pairs(spark):
    words = spark.createDataFrame([("aaaa", 3)], ["word", "n"])
    got = bpe.encode_words(words, [("a", "a", 3)]).collect()[0]["subwords"]
    assert got == ["aa", "aa", bpe.EOW]


def test_encode_words_match_reference(spark):
    words = bpe.word_frequencies(_docs(spark))
    merges = bpe.train_bpe(words, n_merges=10)
    enc = {
        r["word"]: r["subwords"]
        for r in bpe.encode_words(words, merges).collect()
    }
    for w in _word_counts():
        assert enc[w] == ref_encode(w, merges), w


def test_encode_words_chunked_pinning_identical(spark):
    # chunk=1 forces a pin after every merge; result must not change
    words = bpe.word_frequencies(_docs(spark))
    merges = bpe.train_bpe(words, n_merges=6)
    a = {r["word"]: r["subwords"] for r in bpe.encode_words(words, merges).collect()}
    b = {
        r["word"]: r["subwords"]
        for r in bpe.encode_words(words, merges, chunk=1).collect()
    }
    assert a == b


def test_bpe_encode_documents(spark):
    docs = _docs(spark)
    merges = bpe.train_bpe(bpe.word_frequencies(docs), n_merges=10)
    out = {r["doc_id"]: r["subwords"] for r in bpe.bpe_encode(docs, merges).collect()}
    assert set(out) == {d for d, _ in CORPUS}
    for doc_id, text in CORPUS:
        want: list[str] = []
        for w in text.lower().split():
            want.extend(ref_encode(w, merges))
        assert out[doc_id] == want, doc_id
    assert out["d5"] == []


def test_encode_roundtrip_law(spark):
    # concatenating a word's subwords (minus EOW) reproduces the word
    docs = _docs(spark)
    words = bpe.word_frequencies(docs)
    merges = bpe.train_bpe(words, n_merges=8)
    for r in bpe.encode_words(words, merges).collect():
        assert "".join(r["subwords"]).removesuffix(bpe.EOW) == r["word"]


def test_determinism_across_partitionings(spark):
    docs = _docs(spark)
    w1 = bpe.word_frequencies(docs).repartition(1)
    w2 = bpe.word_frequencies(docs).repartition(7, "word")
    assert bpe.train_bpe(w1, n_merges=10) == bpe.train_bpe(w2, n_merges=10)


def test_early_stop_on_min_count(spark):
    # every word unique, all pair counts 1 -> min_count=2 stops at zero
    words = spark.createDataFrame(
        [("abc", 1), ("def", 1), ("ghi", 1)], ["word", "n"]
    )
    assert bpe.train_bpe(words, n_merges=5) == []
    # min_count=1 learns merges
    assert len(bpe.train_bpe(words, n_merges=5, min_count=1)) == 5


def test_n_merges_validation(spark):
    with pytest.raises(ValueError):
        bpe.train_bpe(_docs(spark).limit(0), 0)


def test_real_corpus_trains_and_encodes(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = bpe.word_frequencies(docs, "text")
    merges = bpe.train_bpe(words, n_merges=8)
    assert len(merges) == 8
    # counts strictly positive and the merge table is ordered sanely
    assert all(c >= 2 for _, _, c in merges)
    enc = bpe.bpe_encode(docs.limit(50), merges)
    rows = enc.collect()
    assert len(rows) == 50
    sample = [r for r in rows if r["subwords"]][0]
    assert sample["subwords"].count(bpe.EOW) >= 1


def test_dictionary_pass_is_single_aggregate(spark):
    # the corpus-scale pass: one explode + one hash aggregate, no joins
    plan = bpe.word_frequencies(_docs(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_merge_table_round_trip_versioned(spark, tmp_path):
    """save_merges/load_merges: the tokenizer is a versioned warehouse
    artifact — reload is exact and order-preserving, and the previous
    training survives as a queryable version."""
    from etl_sber_spark.operators.bpe import (
        bpe_encode,
        load_merges,
        save_merges,
        train_bpe,
        word_frequencies,
    )
    from etl_sber_spark.sinks.warehouse import Warehouse

    df = spark.createDataFrame(
        [(1, "low low low lower lowest"), (2, "new newer newest low")],
        "doc_id int, text string",
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    m1 = train_bpe(word_frequencies(df), n_merges=5)
    save_merges(wh, m1)
    assert load_merges(wh) == m1

    m2 = train_bpe(word_frequencies(df), n_merges=2)
    save_merges(wh, m2)
    assert load_merges(wh) == m2
    assert load_merges(wh, version=1) == m1  # time travel to the old tokenizer

    # the reloaded table encodes identically to the in-memory one
    a = {r.doc_id: list(r.subwords) for r in bpe_encode(df, m1).collect()}
    b = {
        r.doc_id: list(r.subwords)
        for r in bpe_encode(df, load_merges(wh, version=1)).collect()
    }
    assert a == b
