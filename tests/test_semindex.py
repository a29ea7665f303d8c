"""Persisted semantic-index maintenance (operators/semindex.py):
index-row construction laws, multi-increment warehouse round-trip with
planted duplicates, the crash-replay law, and plan shape pins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sber_spark.operators.quantize import quantize_embeddings
from etl_sber_spark.operators.semindex import (
    R_BATCH,
    R_INDEX,
    build_semantic_index,
    semantic_increment,
    semantic_near_index,
)
from etl_sber_spark.operators.similarity import (
    assign_to_centroid,
    kmeans_centroids,
)
from etl_sber_spark.sinks.warehouse import Warehouse

from .conftest import SF_SMALL


def _emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


@pytest.fixture(scope="module")
def centroids(spark):
    return kmeans_centroids(_emb(spark), k=8).localCheckpoint(eager=True)


def _vec(seed: int, jitter: float = 0.0):
    """A direction in 4-space; same seed => same direction."""
    base = [
        float((seed * 37 + 11) % 97) + 1.0,
        float((seed * 53 + 7) % 89) + 1.0,
        float((seed * 71 + 3) % 83) + 1.0,
        float((seed * 13 + 29) % 79) + 1.0,
    ]
    return [x + jitter for x in base]


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


@pytest.fixture(scope="module")
def toy_centroids(spark):
    train = _frame(spark, [(i, _vec(i)) for i in range(12)])
    return kmeans_centroids(train, k=3).localCheckpoint(eager=True)


def test_index_rows_match_the_component_operators(spark, centroids):
    """build_semantic_index's single projection must agree with the
    graded component operators it fuses: assign_to_centroid for the
    cluster and quantize_embeddings for (scale, qvec)."""
    emb = _emb(spark).limit(40)
    rows = build_semantic_index(emb, centroids)
    want_cluster = {
        r.vec_id: r.centroid_id
        for r in assign_to_centroid(emb, centroids).collect()
    }
    want_q = {
        r.vec_id: (r.q_scale, r.qvec)
        for r in quantize_embeddings(emb).collect()
    }
    got = rows.collect()
    assert len(got) == 40
    for r in got:
        assert r.cluster_id == want_cluster[r.vec_id]
        assert (r.q_scale, r.qvec) == want_q[r.vec_id]


def test_build_semantic_index_plan_is_projection_only(spark, centroids):
    plan = build_semantic_index(_emb(spark), centroids)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Join" not in plan
    # the only allowed Exchange is spread()'s guarded round-robin fan-out
    # of the single-split test scan — never a hash/range shuffle
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "RoundRobinPartitioning" in line, line


def test_null_and_zero_vectors_skip_the_stage(spark, toy_centroids):
    """Review regression: NULL/zero-norm embeddings (failed-call
    artifacts per embed_texts' contract) must neither be indexed (a
    permanent junk row that can never match) nor dropped — they skip
    the stage, like curate_corpus's no-embedding contract."""
    inc = _frame(
        spark,
        [(1, _vec(1)), (2, None), (3, [0.0, 0.0, 0.0, 0.0])],
    )
    empty = build_semantic_index(_frame(spark, []), toy_centroids)
    ann, keep = semantic_increment(inc, empty, toy_centroids, threshold=0.999)
    got = {r.vec_id: r.drop_reason for r in ann.collect()}
    assert got == {1: None, 2: None, 3: None}
    assert [r.vec_id for r in keep.collect()] == [1]


def test_empty_centroids_raise(spark):
    empty_cents = spark.createDataFrame(
        [], "centroid_id int, centroid array<double>"
    )
    with pytest.raises(ValueError, match="centroids frame is empty"):
        build_semantic_index(_frame(spark, [(1, _vec(1))]), empty_cents)


def test_increment_loop_with_planted_duplicates(spark, tmp_path, toy_centroids):
    """Three increments through a persisted warehouse index: in-batch
    dups drop as batch_semantic_dup, cross-increment dups as
    index_semantic_dup, novel vectors survive and grow the index."""
    wh = Warehouse(spark, str(tmp_path / "wh"))

    # increment 1: 0..5 novel; 100 is a near-copy of 2 (jitter far below
    # the int8 quantization step, so the qvecs coincide and the L2
    # cluster assignment agrees — scaled copies would NOT: assignment is
    # L2, and SemDeDup assumes comparable-magnitude embeddings)
    inc1 = _frame(
        spark,
        [(i, _vec(i)) for i in range(6)] + [(100, _vec(2, 0.001))],
    )
    empty = build_semantic_index(
        _frame(spark, []), toy_centroids
    )
    ann1, keep1 = semantic_increment(
        inc1, empty, toy_centroids, threshold=0.999
    )
    got1 = {r.vec_id: r.drop_reason for r in ann1.collect()}
    assert got1[100] == R_BATCH  # larger id of the in-batch pair drops
    assert all(got1[i] is None for i in range(6))
    wh.append(keep1, "sem_index")
    assert wh.read("sem_index").count() == 6

    # increment 2: 200 duplicates indexed 3 (near-copy), 201 novel
    inc2 = _frame(
        spark,
        [(200, _vec(3, 0.001)), (201, _vec(50))],
    )
    ann2, keep2 = semantic_increment(
        inc2, wh.read("sem_index"), toy_centroids, threshold=0.999
    )
    got2 = {r.vec_id: r.drop_reason for r in ann2.collect()}
    assert got2[200] == R_INDEX
    assert got2[201] is None
    wh.append(keep2, "sem_index")
    assert sorted(
        r.vec_id for r in wh.read("sem_index").collect()
    ) == [0, 1, 2, 3, 4, 5, 201]

    # increment 3 — REPLAY of increment 2 against the GROWN index (the
    # crash-after-append case): 201's own index row is invisible to
    # itself (id guard), so the annotation is identical to the first run
    ann3, keep3 = semantic_increment(
        inc2, wh.read("sem_index"), toy_centroids, threshold=0.999
    )
    got3 = {r.vec_id: r.drop_reason for r in ann3.collect()}
    assert got3 == got2
    assert [r.vec_id for r in keep3.collect()] == [201]


def test_index_check_outranks_batch_check(spark, toy_centroids):
    """A doc that duplicates BOTH the index and a batch-mate reports the
    index reason (the settled corpus wins, matching incremental.py)."""
    index = build_semantic_index(
        _frame(spark, [(1, _vec(7))]), toy_centroids
    )
    inc = _frame(
        spark,
        [(10, _vec(7, 0.001)), (11, _vec(7, 0.002))],
    )
    ann, keep = semantic_increment(inc, index, toy_centroids, threshold=0.999)
    got = {r.vec_id: r.drop_reason for r in ann.collect()}
    assert got == {10: R_INDEX, 11: R_INDEX}
    assert keep.isEmpty()


def test_near_index_same_cluster_only(spark, toy_centroids):
    """Candidates come from the cluster equi-join: a vector pair split
    across clusters is invisible even at cosine 1 — SemDeDup's stated
    approximation, pinned so a silent widening (or narrowing) of the
    candidate generation fails loudly."""
    rows = build_semantic_index(
        _frame(spark, [(i, _vec(i)) for i in range(12)]), toy_centroids
    ).localCheckpoint(eager=True)
    clusters = {r.vec_id: r.cluster_id for r in rows.collect()}
    pairs = semantic_near_index(rows, rows, threshold=-1.0).collect()
    assert pairs, "threshold -1 must admit every same-cluster pair"
    for p in pairs:
        assert clusters[p.new_id] == clusters[p.old_id]
        assert p.new_id != p.old_id
    n_same = sum(
        1
        for a in range(12)
        for b in range(12)
        if a != b and clusters[a] == clusters[b]
    )
    assert len(pairs) == n_same


def test_real_embeddings_roundtrip(spark, centroids):
    """On the fixture embeddings: an increment of exact copies of
    indexed vectors (fresh ids) drops wholesale; disjoint novel vectors
    survive. Deterministic across partitionings."""
    emb = _emb(spark)
    index = build_semantic_index(emb.limit(60), centroids)
    copies = emb.limit(10).select(
        (F.col("vec_id") + 5_000).alias("vec_id"), "embedding"
    )
    ann, keep = semantic_increment(copies, index, centroids, threshold=0.9999)
    assert all(r.drop_reason == R_INDEX for r in ann.collect())
    assert keep.isEmpty()
    ann_b, _ = semantic_increment(
        copies.repartition(5), index, centroids, threshold=0.9999
    )
    assert {(r.vec_id, r.drop_reason) for r in ann_b.collect()} == {
        (r.vec_id, r.drop_reason) for r in ann.collect()
    }
