"""Planted-skew tests for the near-dup hot-bucket guards (VERDICT r4 #1).

The LSH self-join and the fingerprint overlap join are bucketed —
Σ|bucket|², never n² — but that bound assumes buckets stay small. Real
web corpora break the assumption: thousands of templated/boilerplate
near-identical pages survive exact dedup and collapse into ONE
(band, key) bucket (or one corpus-frequency fingerprint), turning a
single task quadratic. These tests PLANT that skew (10k near-identical
docs / a 10k-document boilerplate window) and assert the guarded
operators emit O(N·docs) pairs, not O(docs²) — while a pure-Python
differential pins the guarded semantics exactly, and the real corpus
proves the guard is a no-op when no bucket is hot.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sber_spark.operators.dedup import (
    DEFAULT_MAX_BUCKET,
    DEFAULT_MAX_DOC_FREQ,
    lsh_bucket_stats,
    lsh_candidate_pairs,
    minhash_signatures,
    overlap_pairs,
    rolling_fingerprints,
)

from .conftest import SF_SMALL

N_CLIQUE = 10_000

# Every planted doc gets the SAME text -> identical shingle set ->
# identical minhash signature -> one bucket per band holding all 10k.
# Uncapped, the band join would emit 4 * C(10k, 2) ≈ 2.0e8 pair rows.
_BOILER = (
    "terms of service all rights reserved contact us privacy policy "
    "cookie settings about careers press blog help center sitemap"
)


@pytest.fixture(scope="module")
def clique_docs(spark):
    df = spark.range(N_CLIQUE).select(
        F.col("id").cast("long").alias("doc_id"), F.lit(_BOILER).alias("text")
    )
    return df.localCheckpoint()


def test_lsh_hot_bucket_emits_star_not_clique(spark, clique_docs):
    """10k identical docs = one hot bucket in each of the 4 bands.
    Guarded output must be the anchor star: exactly N-1 pairs, all
    rooted at min(doc_id), each voted by all 4 (oversized) buckets —
    linear in the clique, and it must actually finish in seconds."""
    pairs = lsh_candidate_pairs(
        minhash_signatures(clique_docs), max_bucket=100
    ).collect()
    assert len(pairs) == N_CLIQUE - 1
    assert all(r.id_a == 0 for r in pairs)
    assert sorted(r.id_b for r in pairs) == list(range(1, N_CLIQUE))
    assert all(r.n_shared_bands == 4 for r in pairs)


def test_lsh_star_still_connects_the_clique(spark, clique_docs):
    """The guard must lose nothing the components stage needs: the
    star's connected components still collapse the whole planted clique
    onto the anchor."""
    from etl_sber_spark.operators.components import connected_components

    pairs = lsh_candidate_pairs(
        minhash_signatures(clique_docs), max_bucket=100
    )
    comp = connected_components(
        pairs.select("id_a", "id_b").localCheckpoint()
    ).collect()
    assert len(comp) == N_CLIQUE
    assert all(r.component == 0 for r in comp)


def test_lsh_mixed_corpus_normal_pairs_unchanged(spark):
    """Planted clique + genuinely distinct docs: the guard must touch
    ONLY the hot bucket — organic near-dup pairs keep full clique
    semantics and exact n_shared_bands."""
    # two organic near-dups (share most 3-grams) + distinct filler
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (100_000, base),
        (100_001, base + " extra"),
    ] + [
        (200_000 + i, f"unique document number {i} about topic {i * 7} "
                      f"with content {i * 13} and details {i * 17} entry")
        for i in range(50)
    ]
    organic = spark.createDataFrame(rows, ["doc_id", "text"])
    clique = spark.range(N_CLIQUE).select(
        F.col("id").alias("doc_id"), F.lit(_BOILER).alias("text")
    )
    corpus = organic.unionByName(clique)

    got = {
        (r.id_a, r.id_b): r.n_shared_bands
        for r in lsh_candidate_pairs(
            minhash_signatures(corpus), max_bucket=100
        ).collect()
    }
    # organic pair present with its true band votes (computed unguarded
    # on the organic subset alone — its buckets are all tiny)
    want = {
        (r.id_a, r.id_b): r.n_shared_bands
        for r in lsh_candidate_pairs(
            minhash_signatures(organic), max_bucket=None
        ).collect()
    }
    assert want, "fixture must produce at least one organic candidate"
    for k, v in want.items():
        assert got[k] == v
    # clique contributes exactly its star, nothing cross-group
    clique_pairs = {k for k in got if k[0] < 100_000 or k[1] < 100_000}
    assert len(clique_pairs) == N_CLIQUE - 1
    assert all(a == 0 for a, _ in clique_pairs)


def test_lsh_guard_noop_on_real_corpus(spark):
    """On the real (healthy) documents table no bucket is hot, so the
    guarded and unguarded outputs are IDENTICAL — the default cap
    changes nothing the driver grades."""
    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    sig = minhash_signatures(d).localCheckpoint()
    capped = sorted(
        map(tuple, lsh_candidate_pairs(sig).collect())
    )
    faithful = sorted(
        map(tuple, lsh_candidate_pairs(sig, max_bucket=None).collect())
    )
    assert capped == faithful
    assert lsh_bucket_stats(sig, max_bucket=DEFAULT_MAX_BUCKET).count() == 0


def test_lsh_bucket_stats_reports_hot_buckets(spark, clique_docs):
    stats = lsh_bucket_stats(
        minhash_signatures(clique_docs), max_bucket=100
    ).collect()
    assert len(stats) == 4  # one hot bucket per band
    assert all(r.n_bucket == N_CLIQUE for r in stats)


# ---------------------------------------------------------------------------
# overlap_pairs document-frequency guard
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def boiler_fp(spark):
    """10k docs, each = one SHARED boilerplate 8-word window plus unique
    filler; plus one genuinely copied passage between two docs. The
    boilerplate fingerprint has df=10k (quadratic uncapped: ~5e7
    pairs); the copied passage's fingerprints have df=2."""
    boiler = "copyright notice all rights reserved unauthorized use prohibited"
    copied = "the stolen paragraph appears verbatim in both documents here"
    rows = [
        (
            i,
            f"{boiler} filler{i} alpha{i * 3} beta{i * 5} gamma{i * 7} "
            f"delta{i * 11} epsilon{i * 13} zeta{i * 17} eta{i * 19}",
        )
        for i in range(N_CLIQUE)
    ] + [
        (500_000, f"intro{1} words before {copied} trailing text one"),
        (500_001, f"other{2} opening here {copied} different ending two"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return (
        rolling_fingerprints(df)
        .select("doc_id", "fingerprint")
        .distinct()
        .localCheckpoint()
    )


def test_overlap_df_guard_drops_boilerplate_keeps_plagiarism(
    spark, boiler_fp
):
    """The df guard must kill the 10k-document boilerplate bucket
    entirely while the genuine copied passage (df=2 fingerprints)
    survives with its exact shared-window count — differentialed
    against a pure-Python evaluation of the same capped semantics."""
    got = sorted(
        map(tuple, overlap_pairs(boiler_fp, max_doc_freq=128).collect())
    )
    rows = [(r.doc_id, r.fingerprint) for r in boiler_fp.collect()]
    from collections import Counter, defaultdict

    df_count = Counter(fp for _, fp in rows)
    docs_of = defaultdict(set)
    for d, fp in rows:
        if df_count[fp] <= 128:
            docs_of[fp].add(d)
    pair_count = Counter()
    for fp, docs in docs_of.items():
        ds = sorted(docs)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pair_count[(ds[i], ds[j])] += 1
    want = sorted((a, b, n) for (a, b), n in pair_count.items())
    assert got == want
    # the copied passage detected; volume is pairs-of-copies, not 5e7
    assert any(a == 500_000 and b == 500_001 for a, b, _ in got)
    assert len(got) < 1000


def test_overlap_guard_noop_on_real_corpus(spark):
    """Healthy corpus: no fingerprint reaches the df cap, so guarded ==
    unguarded (the graded q_doc_overlap output is unchanged by the
    guard)."""
    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    fp = (
        rolling_fingerprints(d)
        .select("doc_id", "fingerprint")
        .distinct()
        .localCheckpoint()
    )
    capped = sorted(map(tuple, overlap_pairs(fp).collect()))
    faithful = sorted(
        map(tuple, overlap_pairs(fp, max_doc_freq=None).collect())
    )
    assert capped == faithful
    assert (
        fp.groupBy("fingerprint")
        .count()
        .filter(F.col("count") > DEFAULT_MAX_DOC_FREQ)
        .count()
        == 0
    )


# ---------------------------------------------------------------------------
# near_dup_vs_index hot-bucket guard (the standing index accumulates
# boilerplate families forever, so its buckets grow without bound)
# ---------------------------------------------------------------------------


def test_index_hot_bucket_thinned_but_verdicts_unchanged(spark, clique_docs):
    """A 10k-member boilerplate bucket in the index is hash-thinned to
    ~cap representatives, but every colliding new doc is STILL flagged
    (any representative of a near-dup clique yields the same existence
    verdict), and a non-colliding new doc stays clean."""
    from etl_sber_spark.operators.incremental import near_dup_vs_index

    index_sigs = minhash_signatures(clique_docs).localCheckpoint()
    new = spark.createDataFrame(
        [
            (900_000, _BOILER),  # collides with the hot bucket
            (900_001, "completely unrelated content about gardening and "
                      "weather patterns in coastal regions every spring"),
        ],
        ["doc_id", "text"],
    )
    new_sigs = minhash_signatures(new).localCheckpoint()
    hits = near_dup_vs_index(
        new_sigs, index_sigs, threshold=0.5, max_index_bucket=50
    )
    rows = hits.collect()
    flagged = {r.new_id for r in rows}
    assert flagged == {900_000}
    # fanout is capped: <= N_BANDS * ceil-thinned bucket, nowhere near 10k
    assert len(rows) < 500
    assert all(r.est_jaccard == 1.0 for r in rows)
    # unguarded agrees on the verdict (and would emit ~10k rows)
    unguarded = near_dup_vs_index(
        new_sigs, index_sigs, threshold=0.5, max_index_bucket=None
    )
    assert {
        r.new_id for r in unguarded.select("new_id").distinct().collect()
    } == {900_000}


def test_index_guard_noop_on_real_corpus(spark):
    """Healthy index: no bucket exceeds the default cap, so guarded ==
    unguarded exactly (pairs and estimates)."""
    from etl_sber_spark.operators.incremental import near_dup_vs_index

    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    half_a = d.filter("doc_id % 2 = 0")
    half_b = d.filter("doc_id % 2 = 1")
    idx = minhash_signatures(half_a).localCheckpoint()
    new = minhash_signatures(half_b).localCheckpoint()
    got = sorted(map(tuple, near_dup_vs_index(new, idx, 0.25).collect()))
    want = sorted(
        map(
            tuple,
            near_dup_vs_index(new, idx, 0.25, max_index_bucket=None).collect(),
        )
    )
    assert got == want


# ---------------------------------------------------------------------------
# Randomized differential: guard semantics vs a pure-Python oracle on
# arbitrary small corpora (beyond the planted fixtures)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORDS = ["alpha", "beta", "gamma", "delta", "red", "blue", "sun", "moon"]

_doc_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=3, max_size=8).map(" ".join),
    min_size=2,
    max_size=14,
)


def _py_lsh_pairs(sig_rows, max_bucket):
    """Pure-Python evaluation of the guarded LSH semantics from the
    actual signatures: band → bucket → clique-or-star → band votes."""
    from collections import Counter, defaultdict

    buckets = defaultdict(list)
    for r in sig_rows:
        for b in range(4):
            key = ",".join(str(r[f"mh{b * 4 + j:02d}"]) for j in range(4))
            buckets[(b, key)].append(r["doc_id"])
    votes = Counter()
    for members in buckets.values():
        ms = sorted(members)
        if len(ms) < 2:
            continue
        if max_bucket is None or len(ms) <= max_bucket:
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    votes[(ms[i], ms[j])] += 1
        else:
            for m in ms[1:]:
                votes[(ms[0], m)] += 1
    return sorted((a, b, n) for (a, b), n in votes.items())


@given(texts=_doc_strategy, max_bucket=st.sampled_from([None, 2, 3, 1000]))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_lsh_guard_matches_python_oracle_on_random_corpora(
    spark, texts, max_bucket
):
    """For arbitrary tiny corpora (heavy hash collisions by
    construction: an 8-word vocabulary) and caps including smaller than
    any planted fixture uses, the guarded operator equals the
    pure-Python evaluation of the same semantics applied to the REAL
    signatures."""
    docs = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    sig = minhash_signatures(docs).localCheckpoint()
    got = sorted(
        map(tuple, lsh_candidate_pairs(sig, max_bucket=max_bucket).collect())
    )
    want = _py_lsh_pairs([r.asDict() for r in sig.collect()], max_bucket)
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 5)),
        min_size=1,
        max_size=30,
        unique=True,
    ),
    cap=st.sampled_from([None, 1, 2, 4, 128]),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_overlap_df_cap_matches_python_oracle(spark, rows, cap):
    """overlap_pairs over arbitrary (doc, fingerprint) sets: pairs and
    shared-window counts equal the pure-Python capped evaluation for
    caps from 1 (drop everything shared) to None (uncapped)."""
    from collections import Counter, defaultdict

    fp = spark.createDataFrame(rows, ["doc_id", "fingerprint"])
    got = sorted(map(tuple, overlap_pairs(fp, max_doc_freq=cap).collect()))
    docs_of = defaultdict(set)
    for d, f in rows:
        docs_of[f].add(d)
    pair_count = Counter()
    for f, ds in docs_of.items():
        if cap is not None and len(ds) > cap:
            continue
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pair_count[(ds[i], ds[j])] += 1
    want = sorted((a, b, n) for (a, b), n in pair_count.items())
    assert got == want


# ---------------------------------------------------------------------------
# r6: embedding near-dup hot-bucket guard (the vector twin of the LSH cap)
# ---------------------------------------------------------------------------


def test_embedding_neardup_hot_bucket_emits_star(spark):
    """A planted clique of identical embeddings (failed-encoder
    constant, template pages) collapses into ONE hyperplane bucket;
    the guarded operator must emit the |clique|-1 anchor star, every
    pair scored sim=1, instead of C(n,2) pairs."""
    from etl_sber_spark.operators.similarity import embedding_neardup_pairs

    n = 5000
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), d -> CAST((d % 7) - 3 AS FLOAT))"
        ).alias("embedding"),
    )
    got = embedding_neardup_pairs(emb, 64, 0.9, max_bucket=100).collect()
    assert len(got) == n - 1  # star, not the 12,497,500-pair clique
    assert all(r.id_a == 0 and r.sim == 1.0 for r in got)
    assert sorted(r.id_b for r in got) == list(range(1, n))


def test_embedding_neardup_guard_noop_on_real_corpus(spark, sf_dir):
    """No organic bucket approaches the cap on the fixture corpus: the
    guarded default must be pair-identical to the unguarded reference
    (which is what the graded DuckDB oracle computes)."""
    from etl_sber_spark.operators.similarity import embedding_neardup_pairs

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    guarded = embedding_neardup_pairs(e, 64, 0.35)
    reference = embedding_neardup_pairs(e, 64, 0.35, max_bucket=None)
    assert sorted(map(tuple, guarded.collect())) == sorted(
        map(tuple, reference.collect())
    )


def test_phash_hot_bucket_emits_star(spark):
    """A clique of identical perceptual hashes shares every band key;
    the guarded operator must emit the anchor star (all hamming 0),
    not C(n,2) pairs per band."""
    from etl_sber_spark.operators.multimodal import phash_near_duplicates

    n = 5000
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.lit(0x5A5A5A5A5A5A5A5A).cast("long").alias("phash64"),
    )
    got = phash_near_duplicates(df, max_bucket=100).collect()
    assert len(got) == n - 1
    assert all(r.id_a == 0 and r.hamming == 0 for r in got)
    assert sorted(r.id_b for r in got) == list(range(1, n))


def test_phash_guard_noop_on_organic_hashes(spark):
    """Distinct-ish hashes: the guarded default must equal the
    unguarded reference pair-for-pair (and the reference equals the
    brute-force oracle tests in test_multimodal.py)."""
    from etl_sber_spark.operators.multimodal import phash_near_duplicates

    # 200 hashes, some within hamming<=3 of each other, buckets tiny
    df = spark.range(200).select(
        F.col("id").alias("media_id"),
        (F.col("id") * 2654435761).cast("long").alias("phash64"),
    )
    guarded = sorted(map(tuple, phash_near_duplicates(df).collect()))
    reference = sorted(
        map(tuple, phash_near_duplicates(df, max_bucket=None).collect())
    )
    assert guarded == reference


def test_capped_pair_sql_matches_operator_star(spark):
    """The graded oracles replicate the hot-bucket star cap IN SQL
    (plans/llm_queries.py _CAPPED_PAIR_JOIN, r8 review: the clique-join
    oracle would silently diverge from the capped operator on any
    bucket past the cap). Pin the SQL ALGEBRA against the operator at a
    tiny cap over a mixed corpus: one 6-doc planted clique (over cap)
    plus organic sub-cap buckets."""
    import duckdb

    from etl_sber_spark.operators.dedup import signature_bands

    docs = spark.range(6).select(
        F.col("id").cast("long").alias("doc_id"), F.lit(_BOILER).alias("text")
    ).unionByName(
        spark.createDataFrame(
            [(100, "one unique little document about rivers and stars"),
             (101, "one unique little document about rivers and stones"),
             (102, "entirely different text with no shared shingles at all "
                   "whatsoever in this corpus")],
            "doc_id long, text string",
        )
    )
    sigs = minhash_signatures(docs).localCheckpoint()
    cap = 3
    want = sorted(
        map(tuple, lsh_candidate_pairs(sigs, max_bucket=cap).collect())
    )
    bands_pd = signature_bands(sigs, "doc_id").toPandas()
    con = duckdb.connect()
    con.register("bands", bands_pd)
    got = sorted(
        map(
            tuple,
            con.sql(
                f"""
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               COUNT(*) AS n_shared_bands
        FROM (SELECT band, band_key, doc_id,
                     COUNT(*) OVER (PARTITION BY band, band_key) AS bsize,
                     MIN(doc_id) OVER (PARTITION BY band, band_key) AS anchor
              FROM bands) a
        JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                    AND a.doc_id < b.doc_id
        WHERE a.bsize <= {cap} OR a.doc_id = a.anchor
        GROUP BY 1, 2
        """
            ).fetchall(),
        )
    )
    assert got == want and got
    # non-vacuous: the clique really exceeded the cap (stars emitted)
    assert not any(
        ia != 0 and ia < 6 and ib < 6 for ia, ib, _ in want
    ), want

