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


def test_encoder_injection_contract_for_any_conformer(spark):
    """VERDICT r4 #5: a fake 'real' model — a bag-of-chars encoder with
    entirely different vector laws than the stub — driven through the
    public ``encoder=`` parameter. The operator's laws must hold for any
    conformer: exact vectors out, NULL text never shown to the model,
    batch bound enforced from the model's side, dims = whatever the
    model returns, determinism across partitionings, and the output
    chains into the similarity consumers unchanged."""
    DIMS, CAP = 8, 16

    def fake_model(texts):
        # self-contained conformer; raises exactly like a bound-checked
        # GPU worker would, so green == the operator honored its laws
        if len(texts) > CAP:
            raise AssertionError(f"batch of {len(texts)} exceeds {CAP}")
        out = []
        for t in texts:
            if t is None:
                raise AssertionError("model shown a NULL text")
            v = [0.0] * DIMS
            for ch in t:
                v[ord(ch) % DIMS] += 1.0
            n = sum(x * x for x in v) ** 0.5
            out.append([x / n for x in v] if n else v)
        return out

    rows = [(i, f"text number {i} {'x' * (i % 7)}") for i in range(50)]
    rows += [(100, None), (101, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    out = {
        r.doc_id: r.embedding
        for r in embed_texts(
            df, encoder=fake_model, max_batch_rows=CAP
        ).collect()
    }
    assert len(out) == 52
    assert out[100] is None  # NULL law
    # exact vector law: operator output == the model's own answer
    for i in (0, 7, 49):
        want = fake_model([f"text number {i} {'x' * (i % 7)}"])[0]
        assert out[i] == pytest.approx(want)
        assert len(out[i]) == DIMS  # dims are the model's, not config's
    assert out[101] == [0.0] * DIMS  # empty text is data, not NULL
    # determinism across partitionings
    again = {
        r.doc_id: r.embedding
        for r in embed_texts(
            df.repartition(13), encoder=fake_model, max_batch_rows=CAP
        ).collect()
    }
    assert all(
        (out[k] is None) == (again[k] is None)
        and (out[k] is None or out[k] == pytest.approx(again[k]))
        for k in out
    )
    # chains into the cosine consumer (same shape the stub feeds)
    from etl_sber_spark.operators.similarity import cosine_topk_bruteforce

    emb = embed_texts(
        df.filter("text is not null"), encoder=fake_model, max_batch_rows=CAP
    ).withColumnRenamed("doc_id", "vec_id")
    top = cosine_topk_bruteforce(emb, emb.filter("vec_id = 0"), k=3).collect()
    assert len(top) == 3
