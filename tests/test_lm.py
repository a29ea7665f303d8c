"""Bigram surprisal LM (operators/lm.py): hand-computed fixture, DuckDB
differential on the full corpus, and the quality-signal sanity check."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_sber_spark.operators.lm import DEFAULT_K, bigram_counts, surprisal_scores
from etl_sber_spark.sources.tables import load_table

from .conftest import SF_SMALL
from .diffcheck import compare, duck_connect

_K = DEFAULT_K
_MIN_COUNT = 2

_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"

_ORACLE_TMPL = rf"""
WITH toks AS (
    SELECT doc_id, {_TOKS} AS t
    FROM documents
    WHERE len({_TOKS}) >= 2
),
idx AS (
    SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks
),
bg AS (
    SELECT doc_id, t[i] AS w1, t[i+1] AS w2 FROM idx
),
model AS (
    SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2
    HAVING count(*) >= {_MIN_COUNT}
),
ctx AS (
    SELECT w1, count(*) AS c1 FROM bg GROUP BY 1
),
scored AS (
    SELECT bg.doc_id,
           CAST(ROUND(-log2((COALESCE(m.c, 0) + {_K}) /
                (COALESCE(ctx.c1, 0) + {_K} * {{V}})), 9)
                AS DECIMAL(28,9)) AS bits
    FROM bg
    LEFT JOIN model m ON bg.w1 = m.w1 AND bg.w2 = m.w2
    LEFT JOIN ctx ON bg.w1 = ctx.w1
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       ROUND(CAST(sum(bits) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
           AS surprisal
FROM scored
GROUP BY doc_id
"""


def test_surprisal_matches_duckdb(spark):
    d = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    bigrams, contexts, vocab = bigram_counts(d, min_count=_MIN_COUNT)
    out = surprisal_scores(d, bigrams, contexts, vocab)
    duck = duck_connect(SF_SMALL)
    try:
        v = duck.execute(
            f"SELECT count(DISTINCT w) FROM (SELECT unnest({_TOKS}) AS w "
            "FROM documents WHERE len(" + _TOKS + ") >= 2)"
        ).fetchone()[0]
        assert v == vocab  # same vocabulary both engines
        compare("surprisal", out, duck, _ORACLE_TMPL.format(V=vocab))
    finally:
        duck.close()


def test_hand_computed_two_docs(spark):
    train = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id bigint, text string"
    )
    bigrams, contexts, vocab = bigram_counts(train)
    # doc1 pairs: (a,b),(b,a),(a,b); doc2 pairs: (a,b),(b,c)
    # -> bigrams (a,b)x3, (b,a)x1, (b,c)x1; contexts a->3, b->2
    got = {(r.w1, r.w2): r.c for r in bigrams.collect()}
    assert got == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    ctx = {r.w1: r.c1 for r in contexts.collect()}
    assert ctx == {"a": 3, "b": 2}
    assert vocab == 3

    score = {
        r.doc_id: (r.n_bigrams, r.surprisal)
        for r in surprisal_scores(train, bigrams, contexts, vocab).collect()
    }
    k, V = _K, 3

    def bits(c, c1):
        return round(-math.log2((c + k) / (c1 + k * V)), 9)

    exp1 = round((bits(3, 3) + bits(1, 2) + bits(3, 3)) / 3, 4)
    exp2 = round((bits(3, 3) + bits(1, 2)) / 2, 4)
    assert score[1] == (3, exp1)
    assert score[2] == (2, exp2)


def test_fluent_scores_below_gibberish(spark):
    """The point of the operator: in-distribution text scores lower
    surprisal than token-shuffled gibberish under the same model.

    Trained on a corpus with real sequential structure (the synthetic
    documents table is a near-random token bag, where NO bigram model
    can separate fluent from shuffled — verified when this test was
    written: the gap there was 0.04 bits)."""
    from .test_incremental import BASE, BASE2

    train = spark.createDataFrame(
        [(i, BASE) for i in range(5)]
        + [(10 + i, BASE2) for i in range(5)],
        "doc_id bigint, text string",
    )
    bigrams, contexts, vocab = bigram_counts(train, min_count=2)
    fluent = spark.createDataFrame([(100, BASE)], "doc_id bigint, text string")
    gib = fluent.select(
        F.lit(200).alias("doc_id"),
        F.concat_ws(
            " ", F.reverse(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        ).alias("text"),
    )
    s = {
        r.doc_id: r.surprisal
        for r in surprisal_scores(
            fluent.union(gib), bigrams, contexts, vocab
        ).collect()
    }
    assert s[200] > s[100] + 1.0, s  # gibberish ≥1 bit worse per token


def test_k_zero_rejected(spark):
    import pytest

    train = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    bigrams, contexts, vocab = bigram_counts(train)
    with pytest.raises(ValueError, match="k must be"):
        surprisal_scores(train, bigrams, contexts, vocab, k=0.0)
