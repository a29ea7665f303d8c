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
