"""Semantic pins for BM25 ranking (operators/ranking.py): hand-computed
scores on a tiny corpus, monotonicity laws, and the no-driver-scalar
plan shape. The differential harness (q_bm25_rank) proves Spark ==
DuckDB on the real corpus.
"""

from __future__ import annotations

import math

import pytest

from etl_sber_spark.operators.ranking import bm25_scores, bm25_topk, term_frequencies


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("d1", "spark spark spark query"),
        ("d2", "spark query engine"),
        ("d3", "query engine engine planner"),
        ("d4", "totally unrelated words here"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_term_frequencies(corpus):
    tf = {
        (r.doc_id, r.term): r.tf
        for r in term_frequencies(corpus, terms=["spark", "query"]).collect()
    }
    assert tf == {
        ("d1", "spark"): 3,
        ("d1", "query"): 1,
        ("d2", "spark"): 1,
        ("d2", "query"): 1,
        ("d3", "query"): 1,
    }


def test_bm25_hand_computed(corpus):
    """Exact Okapi BM25 for d2/'spark': N=4, df=2, dl=3, avgdl=15/4."""
    out = {r.doc_id: r for r in bm25_scores(corpus, ["spark"]).collect()}
    assert set(out) == {"d1", "d2"}
    idf = math.log(1 + (4 - 2 + 0.5) / (2 + 0.5))
    tf = 1.0
    norm = tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * 3 / 3.75))
    expected = round(round(idf * norm, 9), 4)
    assert out["d2"].score == pytest.approx(expected, abs=1e-4)
    assert out["d2"].n_terms_matched == 1


def test_bm25_laws(corpus):
    out = {r.doc_id: r.score for r in bm25_scores(corpus, ["spark", "query"]).collect()}
    # d4 matches nothing → omitted
    assert "d4" not in out
    # d1 (tf=3 spark + query) outranks d2 (tf=1 spark + query)
    assert out["d1"] > out["d2"]
    # d2 matches two terms, d3 one rarer term; both positive
    assert all(v > 0 for v in out.values())


def test_bm25_topk_deterministic_tiebreak(corpus):
    ranked = bm25_topk(corpus, ["query"], k=3).collect()
    assert [r.rank for r in ranked] == [1, 2, 3]
    # equal scores (same tf=1, same dl? no — dl differ) — just assert
    # ordering is (score desc, doc_id)
    for a, b in zip(ranked, ranked[1:]):
        assert (a.score, b.doc_id) >= (b.score, a.doc_id) or a.score > b.score


def test_no_driver_scalars(corpus):
    """Corpus stats enter via a 1-row broadcast join, not collect():
    the plan must contain a BroadcastHashJoin and the query function
    must not trigger any job before the action (lazy end-to-end)."""
    df = bm25_scores(corpus, ["spark"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
