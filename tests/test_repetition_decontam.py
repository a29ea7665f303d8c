"""Repetition signals (functions/repetition.py) and benchmark
decontamination (operators/decontam.py): hand-computable fixtures plus
an integration pass over the synthetic corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sber_spark.functions.repetition import repetition_stats
from etl_sber_spark.operators.decontam import contaminated_docs, decontaminate

from .conftest import SF_SMALL


def _stats(spark, text, n=2):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    return repetition_stats(df, n=n).collect()[0]


def test_repetition_pure_loop(spark):
    # "a b a b a b": 2-grams = [a b, b a, a b, b a, a b] → 5 total,
    # 2 distinct, top share 3/5, dup fraction 3/5
    r = _stats(spark, "a b a b a b")
    assert r.n_ngrams == 5
    assert r.n_distinct_ngrams == 2
    assert r.top_ngram_share == 0.6
    assert r.dup_ngram_fraction == 0.6


def test_repetition_all_unique(spark):
    r = _stats(spark, "one two three four")
    assert r.n_ngrams == 3
    assert r.n_distinct_ngrams == 3
    assert r.top_ngram_share == round(1 / 3, 6)
    assert r.dup_ngram_fraction == 0.0


def test_repetition_short_doc_zeroes(spark):
    r = _stats(spark, "single")
    assert (r.n_ngrams, r.n_distinct_ngrams) == (0, 0)
    assert (r.top_ngram_share, r.dup_ngram_fraction) == (0.0, 0.0)


def test_repetition_corpus_smoke(spark):
    from etl_sber_spark.sources.tables import load_table

    d = load_table(spark, SF_SMALL, "documents")
    out = repetition_stats(d)
    assert out.count() == d.count()
    row = out.agg(
        F.min("top_ngram_share"), F.max("top_ngram_share"),
        F.min("dup_ngram_fraction"), F.max("dup_ngram_fraction"),
    ).collect()[0]
    assert 0.0 <= row[0] <= row[1] <= 1.0
    assert 0.0 <= row[2] <= row[3] <= 1.0


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "completely unrelated text about spark partitions and shuffles here"),
            (3, "another clean document with no benchmark overlap at all today"),
        ],
        ["doc_id", "text"],
    )


def test_decontam_flags_planted_overlap(spark):
    corpus = _corpus(spark)
    # probe copies an 8+-token span of doc 1
    probes = spark.createDataFrame(
        [(100, "quick brown fox jumps over the lazy dog near")],
        ["probe_id", "text"],
    )
    hits = {r.doc_id: r for r in contaminated_docs(corpus, probes, n=8).collect()}
    assert set(hits) == {1}
    assert hits[1].n_hit_ngrams >= 1
    assert hits[1].n_probe_docs == 1
    clean = decontaminate(corpus, probes, n=8)
    assert {r.doc_id for r in clean.collect()} == {2, 3}


def test_decontam_no_false_hits(spark):
    corpus = _corpus(spark)
    probes = spark.createDataFrame(
        [(1, "entirely different benchmark question about something else whatever")],
        ["probe_id", "text"],
    )
    assert contaminated_docs(corpus, probes, n=8).count() == 0
    assert decontaminate(corpus, probes, n=8).count() == 3


def test_decontam_min_hits_threshold(spark):
    corpus = _corpus(spark)
    probes = spark.createDataFrame(
        [(7, "quick brown fox jumps over the lazy dog near")],
        ["probe_id", "text"],
    )
    # the planted overlap yields exactly 2 distinct 8-grams (a 9-token
    # span); min_hits=3 must clear the flag
    assert contaminated_docs(corpus, probes, n=8, min_hits=3).count() == 0
    assert contaminated_docs(corpus, probes, n=8, min_hits=2).count() == 1
