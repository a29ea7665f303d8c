"""Int8 embedding quantization (operators/quantize.py): portable
arithmetic vs DuckDB, reconstruction error bound, and recall cost."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sber_spark.operators.quantize import (
    QMAX,
    cosine_topk_quantized,
    dequantize_expr,
    quantize_embeddings,
)
from etl_sber_spark.operators.similarity import cosine_topk_bruteforce
from etl_sber_spark.sources.tables import load_table

from .conftest import SF_SMALL
from .diffcheck import compare, duck_connect

_ORACLE = f"""
WITH scaled AS (
    SELECT vec_id,
           list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
               / {QMAX} AS q_scale,
           embedding
    FROM embeddings
)
SELECT vec_id,
       q_scale,
       array_to_string(
           list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)
               / q_scale + 0.5) AS BIGINT)), ',') AS qvec_str
FROM scaled
WHERE q_scale > 0
"""


def test_quantization_matches_duckdb(spark):
    e = load_table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
    q = quantize_embeddings(e).filter(F.col("q_scale") > 0).select(
        "vec_id",
        "q_scale",
        F.concat_ws(",", F.col("qvec").cast("array<string>")).alias("qvec_str"),
    )
    duck = duck_connect(SF_SMALL)
    try:
        compare("quantize", q, duck, _ORACLE)
    finally:
        duck.close()


def test_reconstruction_error_bounded(spark):
    e = load_table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
    q = quantize_embeddings(e, keep_original=True)
    err = q.select(
        F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                dequantize_expr("qvec", "q_scale"),
                lambda x, r: F.abs(x - r),
            ),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, x),
        ).alias("max_err"),
        F.col("q_scale"),
    )
    bad = err.filter(F.col("max_err") > F.col("q_scale") / 2 + 1e-12)
    assert bad.count() == 0


def test_quantized_range(spark):
    e = load_table(spark, SF_SMALL, "embeddings")
    q = quantize_embeddings(e)
    out_of_range = q.select(
        F.aggregate(
            "qvec",
            F.lit(0),
            lambda acc, x: acc
            + F.when((x < -QMAX) | (x > QMAX), 1).otherwise(0),
        ).alias("n_bad")
    ).filter(F.col("n_bad") > 0)
    assert out_of_range.count() == 0


def test_ivf_quantized_recall_parity(spark):
    """IVF,SQ8 (quantized candidate scoring) matches the float IVF's
    recall against exact brute force within a small delta — the int8
    storage tier does not change the ladder's recall story."""
    from etl_sber_spark.operators.similarity import cosine_topk_ivf

    e = load_table(spark, SF_SMALL, "embeddings")
    queries = e.orderBy("vec_id").limit(15)
    k = 5
    exact = cosine_topk_bruteforce(e, queries, k=k).select(
        "query_id", F.col("vec_id").alias("nn")
    )
    kw = dict(k=k, n_lists=8, n_probe=4)
    fl = cosine_topk_ivf(e, queries, **kw).select(
        "query_id", F.col("vec_id").alias("nn")
    )
    qz = cosine_topk_ivf(e, queries, quantized=True, **kw).select(
        "query_id", F.col("vec_id").alias("nn")
    )
    n = exact.count()
    r_float = exact.join(fl, ["query_id", "nn"]).count() / n
    r_quant = exact.join(qz, ["query_id", "nn"]).count() / n
    assert r_quant >= r_float - 0.1, (r_float, r_quant)


def test_recall_vs_exact(spark):
    """recall@10 of int8-quantized brute force vs exact >= 0.9 — the
    documented recall cost of 4x storage compression."""
    e = load_table(spark, SF_SMALL, "embeddings")
    queries = e.orderBy("vec_id").limit(20)
    k = 10
    exact = cosine_topk_bruteforce(e, queries, k=k).select(
        "query_id", F.col("vec_id").alias("nn")
    )
    quant = cosine_topk_quantized(e, queries, k=k).select(
        F.col("query_id"), F.col("vec_id").alias("nn")
    )
    n_hits = exact.join(quant, ["query_id", "nn"]).count()
    n_total = exact.count()
    assert n_total == 20 * k
    recall = n_hits / n_total
    assert recall >= 0.9, f"quantized recall@{k} = {recall}"


def test_stored_sq8_search_matches_inline_and_prunes_float(spark, tmp_path):
    """The stored half of the SQ8 promise (r7): search over
    PRE-MATERIALIZED (qvec, q_scale, centroid_id) columns is bit-equal
    to quantized=True (same arithmetic, materialized earlier), and the
    candidate-side parquet scan's ReadSchema must NOT include the float
    embedding column — the 1/4-bytes claim is column pruning, provable
    in the plan."""
    import contextlib
    import io
    import re

    import pytest

    from etl_sber_spark.operators import annindex as ai
    from etl_sber_spark.operators import similarity as sim

    e = load_table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
    cents = ai.train_ivf_index(e, n_lists=8, n_iter=2)
    stored = quantize_embeddings(
        ai.materialize_ivf_assignments(e, cents),
        keep_original=True,
        norm_col="q_norm",
    )
    p = str(tmp_path / "serving_sq8")
    stored.write.parquet(p)
    serving = spark.read.parquet(p)
    queries = e.filter(F.col("vec_id") < 5)

    inline = sorted(
        map(
            tuple,
            sim.cosine_topk_ivf(
                e, queries, k=3, n_probe=2, centroids=cents, quantized=True
            ).collect(),
        )
    )
    stored_q = sim.cosine_topk_ivf(
        serving,
        queries,
        k=3,
        n_probe=2,
        centroids=cents,
        centroid_col="centroid_id",
        qvec_col="qvec",
        scale_col="q_scale",
    )
    assert sorted(map(tuple, stored_q.collect())) == inline
    # with the ingest-stored norm: same results, one fold per row
    stored_qn = sim.cosine_topk_ivf(
        serving,
        queries,
        k=3,
        n_probe=2,
        centroids=cents,
        centroid_col="centroid_id",
        qvec_col="qvec",
        scale_col="q_scale",
        qnorm_col="q_norm",
    )
    assert sorted(map(tuple, stored_qn.collect())) == inline

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        stored_q.explain("formatted")
    plan = buf.getvalue()
    schemas = re.findall(r"ReadSchema: (.*)", plan)
    # two scans: the tiny query side (reads the float — it must) and
    # the CANDIDATE side, identified by the stored qvec column, which
    # must NOT read the float embedding (nor even q_scale: the scales
    # cancel in cosine, so pruning drops that too)
    cand_schemas = [s for s in schemas if "qvec" in s]
    assert cand_schemas, schemas
    assert not any("embedding" in s for s in cand_schemas), cand_schemas
    assert not any("q_scale" in s for s in cand_schemas), cand_schemas

    # guard rails: half a layout / missing assignment column refuse
    with pytest.raises(ValueError, match="both or neither"):
        sim.cosine_topk_ivf(
            serving, queries, centroids=cents, centroid_col="centroid_id",
            qvec_col="qvec",
        )
    with pytest.raises(ValueError, match="centroid_id"):
        sim.cosine_topk_ivf(
            serving, queries, centroids=cents,
            qvec_col="qvec", scale_col="q_scale",
        )


def test_stored_sq8_lsh_matches_python_reference(spark, tmp_path):
    """Stored-SQ8 LSH search (r7) against a pure-Python replay of the
    whole path — buckets via plane_sign, symmetric int8 quantization
    (floor(x/scale + 0.5)), all-integer cosine, round-6, top-k with the
    id tie-break — on a planted corpus with duplicates and a zero
    vector. A real differential, not self-parity."""
    import math

    from etl_sber_spark.operators import annindex as ai
    from etl_sber_spark.operators import similarity as sim

    n_dims = 8
    vecs = {}
    for i in range(20):
        vecs[i] = [math.sin(0.7 * i + 0.3 * d) for d in range(n_dims)]
    vecs[20] = list(vecs[3])  # exact duplicate of 3
    vecs[21] = [0.0] * n_dims  # zero vector: NULL sims, never top-k
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id bigint, embedding array<float>",
    )
    stored = quantize_embeddings(
        ai.materialize_lsh_buckets(df, n_dims),
        keep_original=True,
        norm_col="q_norm",
    )
    p = str(tmp_path / "lsh_sq8")
    stored.write.parquet(p)
    serving = spark.read.parquet(p)
    queries = df.filter(F.col("vec_id") < 4)

    got = sorted(
        map(
            tuple,
            sim.cosine_topk_lsh(
                serving,
                queries,
                n_dims,
                k=3,
                n_probe=2,
                bucket_col="bucket",
                qvec_col="qvec",
                scale_col="q_scale",
                qnorm_col="q_norm",
            ).collect(),
        )
    )

    # ---- pure-Python replay -------------------------------------------
    def bucket(v):
        b = 0
        for pl in range(sim.N_PLANES):
            dot = sum(
                v[d - 1] * sim.plane_sign(d, pl) for d in range(1, n_dims + 1)
            )
            if round(dot, 6) >= 0:
                b |= 1 << pl
        return b

    def probes(v, n_probe):
        # own bucket + flips of the closest planes (abs rounded dot,
        # tie on bit value) — mirrors probe_buckets_expr
        b = bucket(v)
        dots = []
        for pl in range(sim.N_PLANES):
            dot = sum(
                v[d - 1] * sim.plane_sign(d, pl) for d in range(1, n_dims + 1)
            )
            dots.append((abs(round(dot, 6)), 1 << pl))
        out = [b]
        for _, bit in sorted(dots)[: n_probe - 1]:
            out.append(b ^ bit)
        return out

    def quant(v):
        scale = max(abs(x) for x in v) / QMAX
        if scale == 0:
            return 0.0, [0] * len(v)
        return scale, [math.floor(x / scale + 0.5) for x in v]

    # float32 round-trip: Spark stores array<float>, Python holds doubles
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    qd = {i: quant([f32(x) for x in v]) for i, v in vecs.items()}
    bd = {i: bucket([f32(x) for x in v]) for i, v in vecs.items()}

    want = []
    for qid in range(4):
        pr = set(probes([f32(x) for x in vecs[qid]], 2))
        cands = []
        for cid, b in bd.items():
            if cid == qid or b not in pr:
                continue
            _, qa = qd[cid]
            _, qb = qd[qid]
            num = sum(a * b2 for a, b2 in zip(qa, qb))
            na = math.sqrt(sum(a * a for a in qa))
            nb = math.sqrt(sum(b2 * b2 for b2 in qb))
            if na > 0 and nb > 0:
                s = round(num / (na * nb), 6)
                cands.append((cid, s))
        cands.sort(key=lambda cs: (-cs[1], cs[0]))
        for rank, (cid, s) in enumerate(cands[:3], start=1):
            want.append((qid, cid, s, rank))
    assert got == sorted(want)
