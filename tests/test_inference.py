"""Batched model-inference harness (operators/inference.py): stub-encoder
laws, the model-memory batch bound, NULL propagation, pluggable encoder,
and chaining into the similarity consumers."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_sber_spark.operators.inference import (
    DEFAULT_DIMS,
    embed_texts,
    embedding_coverage,
    hash_encoder,
)

from .conftest import SF_SMALL


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def test_stub_embeddings_shape_and_norm(spark):
    out = embed_texts(
        _docs(spark).filter("text is not null").limit(20)
    ).collect()
    assert len(out) == 20
    for r in out:
        assert len(r.embedding) == DEFAULT_DIMS
        norm = math.sqrt(sum(x * x for x in r.embedding))
        assert abs(norm - 1.0) < 1e-5


def test_deterministic_across_partitionings(spark):
    docs = _docs(spark).limit(50)
    a = {r.doc_id: r.embedding for r in embed_texts(docs).collect()}
    b = {
        r.doc_id: r.embedding
        for r in embed_texts(docs.repartition(7)).collect()
    }
    assert a == b
    # and identical text => identical vector (the dedup-facing property)
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other text")],
        "doc_id long, text string",
    )
    e = {r.doc_id: tuple(r.embedding) for r in embed_texts(df).collect()}
    assert e[1] == e[2] and e[1] != e[3]


def test_null_text_yields_null_embedding(spark):
    df = spark.createDataFrame(
        [(1, "real"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.embedding for r in embed_texts(df).collect()}
    assert got[2] is None
    assert got[1] is not None
    # empty string is a PRESENT text: encoded (hash of ""), not NULL
    assert got[3] is not None


def test_encoder_never_sees_more_than_max_batch_rows(spark):
    """The operator re-slices Arrow batches to the model bound — the
    encoder must observe len(texts) <= max_batch_rows regardless of how
    Arrow chunks the partition, and NULLs are filtered before the call."""

    def checking_encoder(texts):
        assert len(texts) <= 7, f"batch of {len(texts)} leaked through"
        assert all(t is not None for t in texts)
        return [[float(len(t)), 1.0] for t in texts]

    n = 100
    df = spark.createDataFrame(
        [(i, None if i % 10 == 0 else "x" * (i % 13)) for i in range(n)],
        "doc_id long, text string",
    ).coalesce(1)
    out = embed_texts(
        df, encoder=checking_encoder, max_batch_rows=7
    ).collect()
    assert len(out) == n
    got = {r.doc_id: r.embedding for r in out}
    for i in range(n):
        if i % 10 == 0:
            assert got[i] is None
        else:
            assert got[i] == [float(i % 13), 1.0]


def test_max_batch_rows_validated(spark):
    with pytest.raises(ValueError, match="max_batch_rows"):
        embed_texts(_docs(spark), max_batch_rows=0)


def test_short_encoder_output_fails_loudly(spark):
    """Review regression: an encoder that DROPS a failed item (instead
    of raising) must error, not leave the tail silently NULL."""

    def lossy(texts):
        return [[1.0, 0.0] for _ in texts[:-1]]

    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(8)], "doc_id long, text string"
    )
    with pytest.raises(Exception) as e:
        embed_texts(df, encoder=lossy).collect()
    assert "one vector per text" in str(e.value)


def test_id_type_preserved(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("b", "y")], "doc_id string, text string"
    )
    out = embed_texts(df)
    assert dict(out.dtypes)["doc_id"] == "string"
    assert sorted(r.doc_id for r in out.collect()) == ["a", "b"]


def test_chains_into_similarity_consumers(spark):
    """Stub embeddings feed the real downstream machinery: exact
    duplicate texts must surface as cosine-1.0 top matches."""
    from etl_sber_spark.operators.similarity import cosine_topk_bruteforce

    docs = _docs(spark).select("doc_id", "text").limit(30)
    planted = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    ).limit(3)
    emb = embed_texts(docs.unionByName(planted))
    emb = emb.withColumnRenamed("doc_id", "vec_id")
    top1 = cosine_topk_bruteforce(
        emb, emb.filter(F.col("vec_id") >= 1_000_000), k=1
    ).collect()
    assert len(top1) == 3
    for r in top1:
        assert r.vec_id == r.query_id - 1_000_000
        assert r.sim == pytest.approx(1.0, abs=1e-6)


def test_embedding_coverage_report(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(6)], "doc_id long, text string"
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 2.0]),
            (0, [9.0, 9.0]),  # duplicate row for one id (double append)
            (1, [0.0, 0.0]),  # zero vector (failed call artifact)
            (2, None),  # NULL vector
            (3, [1.0, 2.0, 3.0]),  # odd dims
            (9, [1.0, 1.0]),  # orphan row: not in the corpus, ignored
        ],
        "vec_id long, embedding array<double>",
    )
    row = embedding_coverage(docs, emb).collect()[0]
    # the dup row must NOT fan n_docs/n_embedded out through the join
    # (review finding) — it surfaces in n_dup_rows instead
    assert row.n_docs == 6
    assert row.n_embedded == 4  # ids 0-3; 4 and 5 have no row
    assert row.n_dup_rows == 1
    assert row.n_null_vec == 1
    assert row.n_zero_vec == 1
    assert row.n_distinct_dims == 2  # {2, 3}


def test_hash_encoder_standalone_contract():
    enc = hash_encoder(5)
    a = enc(["alpha", "beta"])
    assert len(a) == 2 and all(len(v) == 5 for v in a)
    assert a == enc(["alpha", "beta"])  # pure
