"""Vocabulary builder + OOV stats (operators/vocab.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sber_spark.operators.vocab import (
    build_vocab,
    oov_stats,
    oov_summary,
    token_frequencies,
)
from etl_sber_spark.sources.tables import load_table

from .conftest import SF_SMALL


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b b c c c"),
            (2, "c d a"),
            (3, "   "),  # whitespace-only: no tokens
        ],
        "doc_id bigint, text string",
    )


def test_build_vocab_ranks_and_tiebreaks(spark):
    v = {r.token: (r.n, r.rank) for r in build_vocab(_docs(spark), 3).collect()}
    # counts: c=4, a=2, b=2, d=1; tie a/b broken token-ASC
    assert v == {"c": (4, 1), "a": (2, 2), "b": (2, 3)}
    with pytest.raises(ValueError):
        build_vocab(_docs(spark), 0)
    # min_count can shrink below max_size
    small = build_vocab(_docs(spark), 10, min_count=2)
    assert {r.token for r in small.collect()} == {"a", "b", "c"}


def test_oov_rates(spark):
    d = _docs(spark)
    vocab = build_vocab(d, 2)  # {c, a}
    per_doc = {r.doc_id: r for r in oov_stats(d, vocab).collect()}
    assert set(per_doc) == {1, 2}  # whitespace-only doc omitted
    assert (per_doc[1].n_tokens, per_doc[1].n_oov) == (6, 2)  # b b
    assert (per_doc[2].n_tokens, per_doc[2].n_oov) == (3, 1)  # d
    assert per_doc[1].oov_rate == round(2 / 6, 6)

    s = oov_summary(oov_stats(d, vocab)).collect()[0]
    assert (s.n_docs, s.n_tokens, s.n_oov) == (2, 9, 3)
    assert s.oov_rate == round(3 / 9, 6)


def test_vocab_covers_fixture_corpus(spark):
    """Full-vocab OOV is zero; a tiny vocab leaves most tokens out —
    the drift-alarm monotonicity the operator exists for."""
    d = load_table(spark, SF_SMALL, "documents")
    n_distinct = token_frequencies(d).count()
    full = build_vocab(d, n_distinct)
    assert oov_summary(oov_stats(d, full)).collect()[0].oov_rate == 0.0
    tiny = build_vocab(d, 10)
    rate = oov_summary(oov_stats(d, tiny)).collect()[0].oov_rate
    assert rate > 0.5


def test_topk_plan_is_two_phase(spark):
    """The vocab top-K must plan two-phase (per-partition partial
    top-K before the final ranking) — a full global sort of the
    token-frequency table would be the naive shape that dies at
    100 TB. With no PARTITION BY, Catalyst pushes the rank filter all
    the way down to TakeOrderedAndProject (partial take per partition
    + merge); WindowGroupLimit is the partitioned-window equivalent."""
    plan = build_vocab(
        load_table(spark, SF_SMALL, "documents"), 100
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan or "WindowGroupLimit" in plan
    assert "Sort " not in plan  # no global sort of the full table
