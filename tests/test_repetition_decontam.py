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


def test_leakage_guarded_split_planted_leak(spark):
    """Plant a shared passage between a train doc and a holdout doc
    (membership discovered first — text never affects the id-hash
    split) and assert exactly that train doc is flagged."""
    from etl_sber_spark.operators.decontam import leakage_guarded_split

    ids = list(range(40))
    probe = spark.createDataFrame(
        [(i, "x") for i in ids], "doc_id int, text string"
    )
    from etl_sber_spark.operators.sampling import hash_split

    assign = {
        r.doc_id: r.split
        for r in hash_split(probe, [0.6, 0.2, 0.2]).collect()
    }
    train_ids = [i for i in ids if assign[i] == 0]
    hold_ids = [i for i in ids if assign[i] != 0]
    assert train_ids and hold_ids
    leaker, source = train_ids[0], hold_ids[0]
    passage = "p q r s t u v w"  # 8 tokens -> one 8-gram
    rows = []
    for i in ids:
        base = " ".join(f"tok{i}w{j}" for j in range(10))  # unique text
        if i == leaker:
            base = f"{base} {passage}"
        if i == source:
            base = f"{passage} {base}"
        rows.append((i, base))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r for r in leakage_guarded_split(df, [0.6, 0.2, 0.2]).collect()}
    assert len(out) == 40
    for i in ids:
        assert out[i].split == assign[i]  # same deterministic split
        want = i == leaker
        assert out[i].leaks_holdout == want, (i, out[i])
    # holdout rows are never flagged, even the leak's source
    assert out[source].leaks_holdout is False


def test_leakage_guard_matches_gram_table(spark):
    """Law check on the real corpus: leaks_holdout == (train doc
    shares ≥1 gram hash with some holdout doc), recomputed from the
    operator's own gram table."""
    from etl_sber_spark.operators.decontam import (
        _gram_hashes,
        leakage_guarded_split,
    )

    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    out = {
        r.doc_id: (r.split, r.leaks_holdout)
        for r in leakage_guarded_split(df, [0.8, 0.2], n=8).collect()
    }
    grams: dict[int, set] = {}
    for r in _gram_hashes(df, "doc_id", "text", 8).collect():
        grams.setdefault(r.doc_id, set()).add(r.gh)
    hold_grams = set().union(
        *(grams.get(d, set()) for d, (s, _) in out.items() if s != 0)
    )
    for d, (s, flag) in out.items():
        if s != 0:
            assert flag is False
        else:
            assert flag == bool(grams.get(d, set()) & hold_grams), d
    # the small-vocab corpus really leaks across splits
    assert any(flag for _, flag in out.values())


def test_semantic_contamination_planted(spark):
    """Planted near-probe embeddings are flagged with the right nearest
    probe and similarity; orthogonal ones are not; zero-norm never
    matches."""
    from etl_sber_spark.operators.decontam import semantic_contamination

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),      # == probe 10
            (2, [0.9, 0.1, 0.0]),      # close to probe 10
            (3, [0.0, 0.0, 1.0]),      # orthogonal to both probes
            (4, [0.0, 0.0, 0.0]),      # zero norm: never matches
            (5, [0.0, 1.0, 0.0]),      # == probe 11 AND probe 12 (tie)
        ],
        "vec_id long, embedding array<float>",
    )
    probes = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0]), (11, [0.0, 1.0, 0.0]), (12, [0.0, 2.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: r
        for r in semantic_contamination(corpus, probes, threshold=0.9).collect()
    }
    assert set(got) == {1, 2, 5}
    assert got[1]["nearest_probe"] == 10 and got[1]["max_sim"] == 1.0
    assert got[2]["nearest_probe"] == 10 and 0.9 <= got[2]["max_sim"] < 1.0
    # doc 5 matches both probes at sim 1.0 -> tie breaks to smaller id
    assert got[5]["n_probe_hits"] == 2 and got[5]["nearest_probe"] == 11


def test_semantic_contamination_clean_corpus_empty(spark):
    from etl_sber_spark.operators.decontam import semantic_contamination

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    probes = spark.createDataFrame(
        [(9, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    assert semantic_contamination(corpus, probes, 0.5).count() == 0


def test_decontam_duplicate_corpus_grams_count_once(spark):
    """Review regression: the corpus side no longer pays a
    dropDuplicates shuffle — correctness now rests on the hit
    aggregate's count_distinct, so a document repeating the same
    contaminated n-gram many times must still count it ONCE."""
    probe = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "probe_id int, text string",
    )
    gram = "the quick brown fox jumps over the lazy dog"
    corpus = spark.createDataFrame(
        [
            # the 9-token probe text pasted twice -> its grams occur
            # twice in this doc, plus filler between the copies
            (1, f"{gram} filler words bridge the copies {gram}"),
            (2, "completely unrelated text with no overlap whatsoever here"),
        ],
        "doc_id int, text string",
    )
    hits = {
        r.doc_id: r
        for r in contaminated_docs(corpus, probe, n=9, min_hits=1).collect()
    }
    assert set(hits) == {1}
    # exactly the distinct 9-gram(s) of the probe, not 2x them
    assert hits[1].n_hit_ngrams == 1
    assert hits[1].n_probe_docs == 1
