"""Property-based differentials for sub-document dedup
(operators/substr_dedup.py): the Spark operators must agree with the
pure-Python reference on ARBITRARY tiny-alphabet corpora — hypothesis
hunts the edges the fixtures miss (adjacent/overlapping repeats at doc
boundaries, whole-doc repeats, single-token docs, repeats straddling
interval merges)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_sber_spark.operators.substr_dedup import (
    remove_duplicate_lines,
    remove_duplicate_spans,
)

from .test_substr_dedup import _py_dedup, _py_line_dedup

# tiny alphabet + short docs => repeats are FREQUENT, not rare
words = st.sampled_from(["a", "b", "c"])
docs = st.lists(
    st.lists(words, min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)


@given(texts=docs, window=st.integers(min_value=2, max_value=4))
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_span_dedup_matches_python_reference(spark, texts, window):
    corpus = {i + 1: t for i, t in enumerate(texts)}
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id int, text string"
    )
    got = {
        r.doc_id: (r.text_dedup, r.n_tokens_removed)
        for r in remove_duplicate_spans(df, window=window).collect()
    }
    assert got == _py_dedup(corpus, window)


lines = st.lists(
    st.lists(words, min_size=0, max_size=4).map(" ".join),
    min_size=1,
    max_size=5,
).map("\n".join)


@given(texts=st.lists(lines, min_size=1, max_size=6))
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_line_dedup_matches_python_reference(spark, texts):
    corpus = {i + 1: t for i, t in enumerate(texts)}
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id int, text string"
    )
    got = {
        r.doc_id: (r.text_dedup, r.n_lines_removed)
        for r in remove_duplicate_lines(df).collect()
    }
    assert got == _py_line_dedup(corpus)
