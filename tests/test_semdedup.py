"""Semantic dedup (SemDeDup): planted-group fixture, a pure-Python
differential on the real embeddings, survivor laws, determinism."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from etl_sber_spark.operators.semdedup import (
    semantic_assignments,
    semantic_pairs,
    semdedup,
)
from etl_sber_spark.operators.similarity import QUANT, kmeans_centroids

from .conftest import SF_SMALL


def _emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


def _fixture(spark):
    """Two well-separated direction clusters; ids 0/1 seed one each.
    {2,3} and {5,6} are exact scaled copies (cosine 1); {7,8} are
    nearly-parallel but distinct directions; 0/1/4 are singletons at
    threshold 0.999."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [4.0, 1.0, 0.0, 0.0]),
        (3, [8.0, 2.0, 0.0, 0.0]),
        (4, [0.0, 3.0, 4.0, 0.0]),
        (5, [0.0, 5.0, 1.0, 0.0]),
        (6, [0.0, 10.0, 2.0, 0.0]),
        (7, [1.0, 0.100, 0.0, 0.0]),
        (8, [1.0, 0.102, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>")


def test_planted_groups(spark):
    out = semdedup(
        _fixture(spark), n_clusters=2, n_iter=2, threshold=0.999
    ).collect()
    by_id = {r.vec_id: r for r in out}
    assert len(by_id) == 9
    # components at 0.999: exactly {2,3}, {5,6}, {7,8} — every other
    # direction pair sits below 0.999 (closest: cos((1,0),(1,.1)) ≈
    # 0.99504; cos((4,1),(1,.1)) ≈ 0.9895).
    assert by_id[2].sem_cluster == by_id[3].sem_cluster
    assert by_id[5].sem_cluster == by_id[6].sem_cluster
    assert by_id[7].sem_cluster == by_id[8].sem_cluster
    assert by_id[2].sem_cluster != by_id[7].sem_cluster
    for sid in (0, 1, 4):
        assert by_id[sid].sem_cluster == sid and by_id[sid].is_kept
    # exactly one keeper per group; keeper has the group-min
    # centroid_sim (ties on id): {2,3} are parallel -> equal sims ->
    # min id 2 survives
    for g in ({2, 3}, {5, 6}, {7, 8}):
        kept = [i for i in g if by_id[i].is_kept]
        assert len(kept) == 1
        best = min(g, key=lambda i: (by_id[i].centroid_sim, i))
        assert kept == [best]
    assert by_id[2].is_kept and not by_id[3].is_kept
    assert by_id[5].is_kept and not by_id[6].is_kept


def test_keep_min_id_matches_component_id(spark):
    """The component id IS the component's minimum node id, so the
    min_id keeper must be the row whose id equals its sem_cluster."""
    out = semdedup(
        _fixture(spark), n_clusters=2, n_iter=2, threshold=0.999, keep="min_id"
    ).collect()
    for r in out:
        assert r.is_kept == (r.vec_id == r.sem_cluster)


def test_invalid_keep_rejected(spark):
    with pytest.raises(ValueError, match="keep"):
        semdedup(_fixture(spark), keep="random")


def _round6(x: float) -> float:
    """Spark F.round on double: shortest-repr decimal, HALF_UP."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _quant(x: float) -> int:
    v = x * float(QUANT)
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def test_pairs_match_python_oracle(spark):
    """semantic_pairs against a pure-Python replay of the same algebra
    (identical fold order, quantization, and rounding) on the real
    sf0.001 embeddings — assignment argmin + within-cluster cosine."""
    e = _emb(spark)
    cents = kmeans_centroids(e, k=8, n_iter=2)
    assigned = semantic_assignments(e, cents)
    got = {
        (r.id_a, r.id_b): r.sim
        for r in semantic_pairs(assigned, threshold=0.35).collect()
    }

    cent = {int(r.centroid_id): [float(x) for x in r.centroid] for r in cents.collect()}
    vecs = {int(r.vec_id): [float(x) for x in r.embedding] for r in e.collect()}
    clusters: dict[int, list[int]] = {}
    for vid, v in vecs.items():
        vq = [float(_quant(x)) for x in v]
        best = None
        for cid in sorted(cent):
            d = 0.0
            for a, b in zip(vq, cent[cid]):
                d += (a - b) * (a - b)
            d = _round6(d)
            if best is None or (d, cid) < best:
                best = (d, cid)
        clusters.setdefault(best[1], []).append(vid)

    want = {}
    for members in clusters.values():
        members.sort()
        for i, ia in enumerate(members):
            for ib in members[i + 1 :]:
                va, vb = vecs[ia], vecs[ib]
                dot = na = nb = 0.0
                for a, b in zip(va, vb):
                    dot += a * b
                for a in va:
                    na += a * a
                for b in vb:
                    nb += b * b
                sim = _round6(dot / (math.sqrt(na) * math.sqrt(nb)))
                if sim >= 0.35:
                    want[(ia, ib)] = sim
    assert got == want
    assert len(got) > 0  # the threshold actually fires on this corpus


def test_deterministic_under_repartition(spark):
    e = _emb(spark)
    key = lambda df: sorted(
        (r.vec_id, r.centroid_id, r.centroid_sim, r.sem_cluster, r.is_kept)
        for r in df.collect()
    )
    a = key(semdedup(e, n_clusters=8, n_iter=2, threshold=0.35))
    b = key(semdedup(e.repartition(7), n_clusters=8, n_iter=2, threshold=0.35))
    assert a == b


def test_survivor_laws_real_corpus(spark):
    out = semdedup(_emb(spark), n_clusters=8, n_iter=2, threshold=0.35)
    per_group = out.groupBy("sem_cluster").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_kept").cast("int")).alias("kept"),
    )
    bad = per_group.filter(F.col("kept") != 1)
    assert bad.isEmpty()
    # some real dedup happened: at least one multi-member group
    assert per_group.filter(F.col("n") > 1).count() > 0
    # total rows preserved (annotation, not destruction)
    assert out.count() == _emb(spark).count()


def test_plan_equi_join_no_pair_product(spark):
    """The candidate self-join must be an equi-join on centroid_id —
    never a nested-loop/cartesian pair product — and keeper election
    must not put a Window over the corpus frame (it runs on the
    dup-only join result)."""
    import contextlib, io

    df = semdedup(_emb(spark), n_clusters=8, n_iter=2, threshold=0.35)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_zero_vector_is_a_kept_singleton(spark):
    """A zero-norm embedding (failed embedding call) must not crash
    the job under ANSI mode — it forms no pairs and survives as its
    own singleton with NULL centroid_sim."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [2.0, 0.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    out = {
        r.vec_id: r
        for r in semdedup(df, n_clusters=2, n_iter=1, threshold=0.999).collect()
    }
    assert len(out) == 4
    assert out[3].is_kept and out[3].sem_cluster == 3
    assert out[3].centroid_sim is None
    # the real duplicates {0,2} still collapse
    assert out[0].sem_cluster == out[2].sem_cluster
    assert out[0].is_kept != out[2].is_kept


def test_auto_cluster_sizing(spark):
    """n_clusters=None sizes the quantizer with the corpus (the r5
    scale smoke's fixed-k quadratic anti-pattern can no longer be
    configured by omission): small corpora floor at 16, and the result
    equals the explicitly-sized run."""
    from etl_sber_spark.operators.semdedup import semdedup

    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    auto = sorted(map(tuple, semdedup(e, n_clusters=None).collect()))
    explicit = sorted(map(tuple, semdedup(e, n_clusters=16).collect()))
    assert auto == explicit  # 200-vector fixture floors at 16


def _serving_frame(spark, emb, cents):
    """The ANN serving layout for a frame: stored centroid_id + SQ8
    triple, the way `ann_cli build --sq8` lays it out."""
    from etl_sber_spark.operators.annindex import materialize_ivf_assignments
    from etl_sber_spark.operators.quantize import quantize_embeddings

    return quantize_embeddings(
        materialize_ivf_assignments(emb, cents),
        keep_original=True,
        norm_col="q_norm",
    )


def test_sq8_pairs_stored_vs_inline_parity(spark):
    """semantic_pairs(qvec_col=…) scored from STORED int8 columns must
    be bit-equal to the same quantized cosine computed from the floats
    inline — storage is a refactoring of WHEN quantization happens,
    never of what is computed (the ANN stored-SQ8 law, applied to the
    SemDeDup pair stage)."""
    from etl_sber_spark.operators.quantize import cosine_q_expr, quantize_cols
    from etl_sber_spark.operators.similarity import SIM_SCALE

    emb = _emb(spark).filter("vec_id < 300")
    cents = kmeans_centroids(emb, 4, 2)
    serving = _serving_frame(spark, emb, cents)

    stored = semantic_pairs(
        serving.withColumnRenamed("centroid_id", "centroid_id"),
        0.2,
        pin_input=False,
        qvec_col="qvec",
        qnorm_col="q_norm",
    )
    # independent inline construction: quantize in the test, join, score
    scale, q = quantize_cols("embedding")
    cand = serving.select("vec_id", "centroid_id", q.alias("_q"), scale.alias("_s"))
    a, b = cand.alias("a"), cand.alias("b")
    inline = (
        a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(
                cosine_q_expr("a._q", "a._s", "b._q", "b._s"), SIM_SCALE
            ).alias("sim"),
        )
        .filter(F.col("sim") >= 0.2)
    )
    got = sorted(map(tuple, stored.collect()))
    want = sorted(map(tuple, inline.collect()))
    assert got == want and got  # non-vacuous


def test_sq8_pairs_norm_col_optional_and_validated(spark):
    emb = _fixture(spark)
    cents = kmeans_centroids(emb, 2, 2)
    serving = _serving_frame(spark, emb, cents)
    with_norm = sorted(
        map(
            tuple,
            semantic_pairs(
                serving, 0.999, pin_input=False,
                qvec_col="qvec", qnorm_col="q_norm",
            ).collect(),
        )
    )
    folded = sorted(
        map(
            tuple,
            semantic_pairs(
                serving, 0.999, pin_input=False, qvec_col="qvec"
            ).collect(),
        )
    )
    assert with_norm == folded and with_norm
    with pytest.raises(ValueError, match="qnorm_col"):
        semantic_pairs(serving, 0.9, qnorm_col="q_norm")


def test_semdedup_serving_never_reads_floats(spark):
    """semdedup_serving on the serving columns ALONE (float vector
    dropped) must equal the run with the float column present — the
    operator's scan is float-free — and keep exactly one survivor per
    group with the planted structure intact."""
    from etl_sber_spark.operators.semdedup import semdedup_serving

    emb = _fixture(spark)
    cents = kmeans_centroids(emb, 2, 2)
    serving = _serving_frame(spark, emb, cents)

    full = semdedup_serving(serving, cents, threshold=0.999)
    floatless = semdedup_serving(
        serving.drop("embedding"), cents, threshold=0.999
    )
    rows_full = sorted(map(tuple, full.collect()))
    rows_fl = sorted(map(tuple, floatless.collect()))
    assert rows_full == rows_fl

    by_id = {r.vec_id: r for r in full.collect()}
    # exact scaled copies quantize to the same direction -> same groups
    # the float path finds on this fixture
    assert by_id[2].sem_cluster == by_id[3].sem_cluster
    assert by_id[5].sem_cluster == by_id[6].sem_cluster
    groups = {}
    for r in by_id.values():
        groups.setdefault(r.sem_cluster, []).append(r)
    for g in groups.values():
        assert sum(r.is_kept for r in g) == 1
    # missing stored columns refuse loudly
    with pytest.raises(ValueError, match="stored columns"):
        semdedup_serving(serving.drop("q_norm"), cents)
    ok = semdedup_serving(
        serving.drop("q_norm"), cents, threshold=0.999, qnorm_col=None
    )
    assert sorted(map(tuple, ok.collect())) == rows_full


def test_semdedup_serving_keeper_tracks_float_election(spark):
    """On the real corpus, the quantized-space keeper election must
    agree with the float path's on the overwhelming majority of
    groups (SQ8 error can flip near-ties, nothing more)."""
    from etl_sber_spark.operators.semdedup import semdedup_serving

    emb = _emb(spark).filter("vec_id < 400")
    cents = kmeans_centroids(emb, 4, 2)
    serving = _serving_frame(spark, emb, cents)
    q8 = {r.vec_id: r for r in semdedup_serving(serving, cents, 0.9).collect()}
    fl = {
        r.vec_id: r
        for r in semdedup(emb, n_clusters=4, n_iter=2, threshold=0.9).collect()
    }
    assert set(q8) == set(fl)
    agree = sum(q8[i].is_kept == fl[i].is_kept for i in q8)
    assert agree / len(q8) >= 0.95, (agree, len(q8))
