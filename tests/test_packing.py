"""Semantic pins for sequence chunking and token-budget packing
(operators/packing.py) — the differential harness proves Spark == DuckDB
for q_seq_packing; these pin the MEANING (coverage, overlap, bin
invariants) on hand-checkable inputs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sber_spark.operators.packing import chunk_tokens, pack_documents


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
