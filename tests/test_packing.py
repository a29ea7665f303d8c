"""Semantic pins for sequence chunking and token-budget packing
(operators/packing.py) — the differential harness proves Spark == DuckDB
for q_seq_packing; these pin the MEANING (coverage, overlap, bin
invariants) on hand-checkable inputs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sber_spark.operators.packing import chunk_tokens, pack_documents

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    # letter-only tokens: the BPE-ish tokenizer splits "t0" into "t","0"
    letters = "abcdefghijklm"
    rows = [
        ("a", " ".join(f"t{letters[i]}" for i in range(10))),  # 10 tokens
        ("b", " ".join(f"t{letters[i]}" for i in range(4))),  # 4 (< chunk)
        ("c", ""),  # empty → no chunks
        ("d", " ".join(f"t{letters[i]}" for i in range(13))),  # 13 tokens
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_chunks_cover_all_tokens_with_overlap(docs):
    out = chunk_tokens(docs, chunk_size=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert "c" not in by_doc  # empty doc yields no chunks
    # doc a: 10 tokens, size 4 step 3 → starts 0,3,6 (chunk at 6 covers
    # tokens 6..9, so no trailing 1-token fragment is emitted)
    a = sorted(by_doc["a"], key=lambda r: r.chunk_idx)
    assert [r.start for r in a] == [0, 3, 6]
    assert [r.n_chunk_tokens for r in a] == [4, 4, 4]
    covered_a = set()
    for r in a:
        covered_a |= set(range(r.start, r.start + r.n_chunk_tokens))
    assert covered_a == set(range(10))
    # consecutive chunks overlap by exactly 1 token
    assert a[0].chunk_text.split()[-1] == a[1].chunk_text.split()[0]
    # doc shorter than chunk_size → single chunk, whole doc
    b = by_doc["b"]
    assert len(b) == 1 and b[0].n_chunk_tokens == 4 and b[0].start == 0
    # every token of d appears in some chunk (union of [start, start+n))
    d = sorted(by_doc["d"], key=lambda r: r.chunk_idx)
    covered = set()
    for r in d:
        covered |= set(range(r.start, r.start + r.n_chunk_tokens))
    assert covered == set(range(13))


def test_chunk_text_matches_slice(docs):
    out = chunk_tokens(docs, chunk_size=4, overlap=1).filter(
        (F.col("doc_id") == "a") & (F.col("chunk_idx") == 1)
    ).collect()
    assert out[0].chunk_text == "td te tf tg"


def test_packing_invariants(docs, spark):
    # 200 docs of 7 tokens each, budget 32, 4 buckets
    rows = [(f"doc{i:03d}", " ".join(["w"] * 7)) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = pack_documents(df, budget=32, n_buckets=4).collect()
    assert len(out) == 200
    by_bucket = {}
    for r in out:
        assert 0 <= r.bucket < 4
        assert r.bin_id == r.bucket * 2**32 + (r.bin_id % 2**32)
        assert 0 <= r.bin_offset < 32
        by_bucket.setdefault(r.bucket, []).append(r)
    assert len(by_bucket) == 4  # hash spreads across all buckets
    for bucket, rs in by_bucket.items():
        rs.sort(key=lambda r: r.doc_id)
        # concat-and-split: offsets advance by n_tokens mod budget, bins
        # are the running-sum quotient — no gaps, no padding inside a
        # bucket
        cum = 0
        for r in rs:
            assert r.bin_offset == cum % 32
            assert r.bin_id % 2**32 == cum // 32
            assert r.spans_bins == (cum // 32 != (cum + r.n_tokens - 1) // 32)
            cum += r.n_tokens


def test_packing_deterministic_and_hash_stable(spark):
    rows = [(f"doc{i:03d}", "a b c d e") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = {r.doc_id: (r.bucket, r.bin_id, r.bin_offset) for r in pack_documents(df).collect()}
    b = {r.doc_id: (r.bucket, r.bin_id, r.bin_offset) for r in pack_documents(df).collect()}
    assert a == b  # rerun-identical (no RNG anywhere)
    # bucket assignment is hash-of-id: unaffected by other rows present
    sub = spark.createDataFrame(rows[:10], ["doc_id", "text"])
    sub_buckets = {r.doc_id: r.bucket for r in pack_documents(sub).collect()}
    for k, v in sub_buckets.items():
        assert a[k][0] == v


def test_materialize_bins_fixture(spark):
    """budget=8, one bucket: exact layout, spanning fragments, and
    boundary metadata."""
    from etl_sber_spark.operators.packing import materialize_bins

    rows = [
        (1, "a b c d e"),          # 5 tokens -> bin0 [0,5)
        (2, "f g h i j k"),        # 6 tokens -> bin0 [5,8) + bin1 [0,3)
        (3, "l m n o p q r"),      # 7 tokens -> bin1 [3,8) + bin2 [0,2)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    bins = {
        r.bin_id: r
        for r in materialize_bins(df, budget=8, n_buckets=1).collect()
    }
    assert sorted(bins) == [0, 1, 2]
    assert bins[0].tokens == list("abcdefgh")
    assert bins[1].tokens == list("ijklmnop")
    assert bins[2].tokens == list("qr")
    assert [d.asDict() for d in bins[0].docs] == [
        {"doc_id": 1, "start": 0, "n": 5},
        {"doc_id": 2, "start": 5, "n": 3},
    ]
    assert [d.asDict() for d in bins[1].docs] == [
        {"doc_id": 2, "start": 0, "n": 3},
        {"doc_id": 3, "start": 3, "n": 5},
    ]
    assert [d.asDict() for d in bins[2].docs] == [
        {"doc_id": 3, "start": 0, "n": 2}
    ]


def test_materialize_bins_laws_real_corpus(spark):
    """Conservation laws on the real corpus: full bins are exactly
    budget-sized, and every document's fragments reconstruct its token
    sequence in order."""
    from etl_sber_spark.functions.text import bpe_ish_tokens
    from etl_sber_spark.operators.packing import materialize_bins

    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    budget, n_buckets = 128, 4
    out = materialize_bins(df, budget=budget, n_buckets=n_buckets).collect()

    # docs metadata is consistent with the token payload
    for r in out:
        assert sum(d.n for d in r.docs) == len(r.tokens)
        pos = 0
        for d in r.docs:
            assert d.start == pos
            pos += d.n
    # all but the last bin of each bucket hold exactly `budget` tokens
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bin_id >> 32, []).append(r)
    for bucket_bins in by_bucket.values():
        bucket_bins.sort(key=lambda r: r.bin_id)
        for r in bucket_bins[:-1]:
            assert len(r.tokens) == budget
        assert 0 < len(bucket_bins[-1].tokens) <= budget

    # reconstruction: fragments, ordered by bin, rebuild each doc
    frags = {}
    for r in out:
        pos = 0
        for d in r.docs:
            frags.setdefault(d.doc_id, []).append(
                (r.bin_id, r.tokens[pos : pos + d.n])
            )
            pos += d.n
    want = {
        r.doc_id: r.toks
        for r in df.select(
            "doc_id", bpe_ish_tokens(F.col("text")).alias("toks")
        ).collect()
        if r.toks
    }
    got = {
        d: [t for _, frag in sorted(fs) for t in frag]
        for d, fs in frags.items()
    }
    assert got == want


def test_materialize_bins_two_shuffles(spark):
    """Tokens ride the pack window shuffle — no assignment⋈tokens join
    (which cost two extra corpus-sized exchanges before the shared
    _assign_bins refactor). Exactly: window exchange + bin groupBy."""
    import contextlib, io

    from etl_sber_spark.operators.packing import materialize_bins

    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        materialize_bins(df, budget=128, n_buckets=4).explain("formatted")
    tree = buf.getvalue().split("\n\n")[0]
    assert tree.count("Exchange") == 2, tree
    assert "Join" not in tree
